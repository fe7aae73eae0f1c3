package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for 100 TB-scale joins.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting is
  * the static fallback when a hot key would still overwhelm one task (the
  * migration-engine case: a giant collection where one `_id` prefix or one
  * dependency edge dominates).
  *
  * [[saltedJoin]] replicates the (small-ish) right side `salt` times and
  * scatters the left side across the replicas, so one hot key spreads over
  * `salt` tasks instead of one. Correct for inner/left joins on an
  * equi-key.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // left rows scatter randomly across salt buckets; deterministic seed
    // keeps plans reproducible
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-stage (partial → final) aggregation with an explicit salt on the
    * group key — for when the per-key cardinality is so skewed that even
    * map-side combine leaves one reducer hot. `aggs` must be decomposable
    * (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salt: Int)
      : DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("__salt",
        pmod(hash(col(valueCol), monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum"), sum(col("__c")).as("count"))
  }
}
