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
}
