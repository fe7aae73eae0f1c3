package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column <-> catalyst Expression bridge `private[sql]`
  * (`classic.ExpressionUtils`). This object lives under the sql package
  * purely to re-export the two conversions the engine's native expressions
  * need; no Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True only when `c` is a LITERAL `true` (e.g. `lit(true)` from an
    * empty query document). Decided on the column's node — `expression`
    * returns a lazy `ColumnNodeExpression` wrapper in Spark 4, so the
    * catalyst-side Literal is not directly pattern-matchable there. */
  def isLiteralTrue(c: Column): Boolean = c.node match {
    case l: org.apache.spark.sql.internal.Literal => l.value == true
    case _ => false
  }
}
