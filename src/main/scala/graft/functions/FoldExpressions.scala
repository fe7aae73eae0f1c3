package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Mongo's bare-single-argument scalar folds — `{$max: <expr>}` /
  * `$min` / `$sum` / `$avg` outside a `$group` (reference pass-through:
  * the server evaluates these; /root/reference/db/wrapper.go:88-94).
  *
  * Mongo's rule depends on the ARGUMENT TYPE: an array argument folds over
  * its elements (nulls skipped), while any non-array argument is treated
  * as the one-element case — the value itself for `$max`/`$min`, the
  * numeric value (else 0) for `$sum`, the numeric value (else null) for
  * `$avg`. A Column-level implementation must pick `array_max` vs identity
  * BEFORE the schema is known, so this expression defers the dispatch to
  * analysis time (`child.dataType`), exactly like [[TypeAliasMatches]].
  * Interpreted eval only (CodegenFallback) — the array fold it replaces
  * (`aggregate`, a higher-order function) was already interpreted.
  */
case class FoldDispatch(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {

  require(Set("max", "min", "sum", "avg")(kind), s"FoldDispatch kind: $kind")

  private lazy val elemType: Option[DataType] = child.dataType match {
    case ArrayType(et, _) => Some(et)
    case _ => None
  }

  override def dataType: DataType = kind match {
    case "max" | "min" => elemType.getOrElse(child.dataType)
    case _ => DoubleType
  }

  override def nullable: Boolean = kind != "sum"

  /** Numeric value (internal representation) → Double; None for
    * non-numeric types, which Mongo's folds skip. */
  private def asDouble(dt: DataType, v: Any): Option[Double] = v match {
    case n: Number if dt.isInstanceOf[NumericType] => Some(n.doubleValue())
    case d: Decimal => Some(d.toDouble)
    case _ => None
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return if (kind == "sum") 0.0 else null
    elemType match {
      case None => kind match {
        case "max" | "min" => v
        case "sum" => asDouble(child.dataType, v).getOrElse(0.0)
        case "avg" => asDouble(child.dataType, v).orNull
      }
      case Some(et) =>
        val arr = v.asInstanceOf[ArrayData]
        kind match {
          case "max" | "min" =>
            val ord = TypeUtils.getInterpretedOrdering(et)
            var best: Any = null
            var i = 0
            while (i < arr.numElements()) {
              if (!arr.isNullAt(i)) {
                val x = arr.get(i, et)
                if (best == null ||
                    (kind == "max" && ord.compare(x, best) > 0) ||
                    (kind == "min" && ord.compare(x, best) < 0)) best = x
              }
              i += 1
            }
            best
          case _ =>
            var total = 0.0
            var n = 0L
            var i = 0
            while (i < arr.numElements()) {
              if (!arr.isNullAt(i)) {
                asDouble(et, arr.get(i, et)).foreach { d =>
                  total += d; n += 1
                }
              }
              i += 1
            }
            if (kind == "sum") total
            else if (n == 0) null else total / n
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : FoldDispatch = copy(child = newChild)
}
