package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types._

/** `$type` / `$isNumber` static type test (reference pass-through surface:
  * /root/reference/db/wrapper.go:452-481 ships query docs to the server).
  *
  * A Spark column's type is known statically once the plan is analyzed, so
  * the Mongo `$type` predicate over a concrete column is a *constant*, not a
  * per-row check. Earlier rounds compiled it to `typeof(c) === "date"`;
  * Spark's `TypeOf` codegen emits the catalog string unquoted for date /
  * timestamp operands, producing uncompilable Java (`Unknown variable or
  * type "date"`) and a silent per-query interpreted fallback. This
  * expression instead defers to analysis time (`child.dataType`), declares
  * itself foldable, and evaluates without touching the input row — the
  * optimizer's ConstantFolding collapses it to `Literal(true/false)` so the
  * surrounding predicate simplifies away entirely and whole-stage codegen
  * never sees it. Even unfolded, `doGenCode` emits a bare boolean literal.
  *
  * Null handling is the caller's job (Mongo: `$type: "null"` matches nulls,
  * other aliases require `isNotNull` — see QueryCompiler).
  */
case class TypeAliasMatches(child: Expression, alias: String)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = false

  /** Depends only on the child's *static* type — safe to fold without
    * evaluating the child. */
  override def foldable: Boolean = true

  private lazy val matches: Boolean =
    TypeAliasMatches.aliasMatches(child.dataType, alias)

  override def eval(input: InternalRow): Any = matches

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.literal(matches.toString, BooleanType))

  override protected def withNewChildInternal(newChild: Expression): TypeAliasMatches =
    copy(child = newChild)
}

/** Static type name of the child (catalog string, e.g. "bigint"), resolved
  * at analysis time and foldable — the codegen-safe replacement for Spark's
  * `typeof` in the expression-level `$type` fallthrough (types with no
  * Mongo alias). */
case class StaticTypeName(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  override def eval(input: InternalRow): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      child.dataType.catalogString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTypeName",
      org.apache.spark.unsafe.types.UTF8String.fromString(
        child.dataType.catalogString))
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.global(ref, StringType))
  }

  override protected def withNewChildInternal(newChild: Expression): StaticTypeName =
    copy(child = newChild)
}

object TypeAliasMatches {

  /** Mongo type alias → static Spark `DataType` match. Parameterized types
    * (decimal/array/struct/map) match the constructor, never a name prefix. */
  def aliasMatches(dt: DataType, alias: String): Boolean = alias match {
    case "string"  => dt == StringType
    case "int"     => dt == IntegerType || dt == ShortType || dt == ByteType
    case "long"    => dt == LongType
    case "double"  => dt == DoubleType || dt == FloatType
    case "bool"    => dt == BooleanType
    case "decimal" => dt.isInstanceOf[DecimalType]
    case "date"    => dt == DateType || dt == TimestampType || dt == TimestampNTZType
    case "array"   => dt.isInstanceOf[ArrayType]
    case "object"  => dt.isInstanceOf[StructType] || dt.isInstanceOf[MapType]
    case "binData" => dt == BinaryType
    case other =>
      throw new IllegalArgumentException(s"unsupported $$type alias: $other")
  }

  /** Eager alias validation so a bad alias fails at query-compile time
    * (before any Spark job), matching the previous behavior. */
  def validate(alias: String): Unit = {
    aliasMatches(NullType, alias): Unit
  }
}
