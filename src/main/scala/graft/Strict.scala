package graft

import org.apache.spark.sql.SparkSession

/** `spark.graft.strictMongo`: surfaces documented semantic divergences
  * from MongoDB as errors instead of silent near-equivalents — the same
  * seam as `spark.graft.strictScale` for the scale guards. Default off:
  * the engine's columnar analogs (null-out instead of field removal,
  * pass-through on positional no-match) are usually what a Spark user
  * wants; strict mode is for porting validation runs where any behavioral
  * drift from the server must fail loudly.
  */
object Strict {
  def strictMongo(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.strictMongo")
      .exists(_.equalsIgnoreCase("true"))
}
