package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add, AggregateWindowFunction, AttributeReference, Expression, If, Literal,
  Multiply}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Mongo `$expMovingAvg` as a native running-frame window function.
  *
  * EMA_0 = x_0; EMA_i = alpha*x_i + (1-alpha)*EMA_{i-1}. Sequential by
  * definition, but a running frame doesn't need the O(n^2) prefix fold
  * (collect_list + aggregate) it used to compile to: an
  * [[AggregateWindowFunction]] carries the previous EMA in its aggregation
  * buffer and Spark's window executor updates it once per row - O(n) time
  * and O(1) state per partition, no per-row array materialization. The
  * per-row arithmetic (`x*alpha + prev*(1-alpha)`, null-propagating, in
  * sort order) is the exact op sequence of the old fold, so results are
  * bit-identical.
  *
  * The inherited frame is ROWS UNBOUNDED PRECEDING..CURRENT ROW - the only
  * frame Mongo allows for `$expMovingAvg` (it rejects an explicit
  * `window`).
  */
case class ExpMovingAvg(input: Expression, alpha: Double)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(input)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "exp_moving_avg"

  private lazy val ema = AttributeReference("ema", DoubleType)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(ema, seen)

  override val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(false))

  // first row seeds with x_0 (null included - a null poisons the series,
  // matching the fold semantics); later rows do the recursive step with
  // standard null-propagating arithmetic
  override val updateExpressions: Seq[Expression] = Seq(
    If(seen,
      Add(Multiply(input, Literal(alpha)),
        Multiply(ema, Literal(1.0 - alpha))),
      input),
    Literal(true))

  override val evaluateExpression: Expression = ema

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren.head)
}
