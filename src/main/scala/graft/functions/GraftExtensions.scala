package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works — both through
  * `SparkSessionExtensions` (builder-time, `withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.functions.
  * GraftExtensions`) and at runtime on an existing session
  * ([[GraftFunctions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def two(name: String)(mk: (Expression, Expression) => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[FloatVecDot].getName, name),
      { args =>
        require(args.length == 2, s"$name expects 2 arguments")
        mk(args(0), args(1))
      })

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(two("vec_dot")(FloatVecDot(_, _)))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
