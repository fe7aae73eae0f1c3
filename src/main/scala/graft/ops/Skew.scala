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

  /** Deterministic per-row salt in [0, n): a hash of the row's HASHABLE
    * columns, so shuffle-map task retries re-salt identically (the
    * monotonically_increasing_id alternative re-salts differently per
    * attempt and double-counts/drops rows). Spark's `hash` rejects
    * MapType anywhere in a column's type, so map-carrying columns are
    * excluded; if every column carries a map, the row's JSON rendering
    * is hashed instead (slower, correct, and vanishingly rare). */
  def deterministicSalt(df: DataFrame, n: Int): Column = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => df(f.name)).toSeq
    if (cols.nonEmpty) pmod(hash(cols: _*), lit(n))
    else pmod(hash(to_json(struct(df.columns.map(df(_)).toSeq: _*))),
      lit(n))
  }

  /** Estimate the salt for a grouping/join key from a bounded
    * key-frequency sketch (`spark.graft.skewSalt=auto`): sample up to
    * `sampleRows` key values — a column-pruned scan under a
    * CollectLimit, so only enough partitions to fill the sample are
    * read — and take the hottest key's observed share p̂. At P shuffle
    * partitions that key's reducer runs ~p̂·P times the average, so the
    * spread needed is s ≈ ⌈p̂·P⌉. Mild imbalance (s ≤ 2) returns 0: the
    * plain plan with map-side partial aggregation + AQE already absorbs
    * it, and salting would pay a second shuffle stage for nothing.
    *
    * The sketch picks only the PLAN — the salted and plain shapes
    * produce identical results — so its sampling bias (first partitions
    * only) can cost a suboptimal salt, never a wrong answer. This is
    * the pre-flight counterpart of AQE's post-hoc skew handling: AQE
    * can split a skewed sort-merge join at runtime, but a skewed
    * AGGREGATE key or a replicated lookup join needs its shape chosen
    * before the shuffle exists, and a failed first attempt at 100 TB
    * costs more than a 100k-row sketch. */
  def autoSalt(df: DataFrame, key: Column,
      sampleRows: Int = 100000): Int = {
    val p = scala.util.Try(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    val head = df.select(key.as("__k")).limit(sampleRows)
      .groupBy("__k").agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")), sum(col("__c"))).head
    if (head.isNullAt(1) || head.getLong(1) == 0L) 0
    else {
      val s = math.ceil(
        head.getLong(0).toDouble / head.getLong(1) * p).toInt
      if (s <= 2) 0 else math.min(s, p)
    }
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
