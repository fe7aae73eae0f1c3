package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-layout half of the 100 TB
  * shuffle story. A fact table that is joined on the same key by many
  * jobs should pay its shuffle ONCE, at write time: `bucketBy(key)`
  * hash-partitions rows into a fixed bucket count inside each write, and
  * every later equi-join (or aggregate) on that key reads co-located
  * buckets — the join plan has NO Exchange on either bucketed side
  * (asserted in BucketingSpec). At 1000-executor scale that converts the
  * nightly fact⋈fact join from two full-network shuffles into a local
  * zip of bucket files.
  *
  * Spark's bucketing rides the session catalog (bucket metadata lives in
  * the table definition, not the parquet footers), so tables are written
  * with `saveAsTable` against an explicit external location. Bucket
  * counts must match on both sides for the co-located plan; the helper
  * enforces it rather than letting Spark silently fall back to a
  * shuffle.
  */
object Bucketing {

  private val id = new java.util.concurrent.atomic.AtomicLong(0)

  // JVM-unique suffix for generated table names: the session catalog is
  // shared across JVMs (and survives restarts when hive-backed), so a
  // bare counter would let two concurrent apps both claim
  // graft_bucketed_0 and mode(overwrite) would clobber one mid-query
  private val jvmSalt =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Write `df` as an external bucketed table (bucketed + sorted by
    * `key`, `numBuckets` buckets) and return its catalog name. One
    * shuffle-equivalent cost paid at write time; every later join or
    * aggregate on `key` is exchange-free. */
  def writeBucketed(df: DataFrame, key: String, numBuckets: Int,
      baseDir: String, name: String = ""): String = {
    require(numBuckets > 0, s"writeBucketed: numBuckets $numBuckets")
    val tbl = (if (name.nonEmpty) name
      else s"graft_bucketed_${jvmSalt}_${id.getAndIncrement()}")
    // co-partition on the bucket key first: without this every write
    // task emits a file per bucket (tasks×buckets small files — the
    // classic bucketed-write file explosion); with it each task holds
    // whole buckets and writes one file each
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .option("path", s"$baseDir/$tbl")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(tbl)
    tbl
  }

  /** Equi-join two bucketed tables on their bucket key: both sides must
    * be bucketed on `key` with the same bucket count, which makes the
    * sort-merge join exchange-free (bucket i joins bucket i locally). */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame = {
    def buckets(t: String): Int = {
      val row = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
        .where(col("col_name") === "Num Buckets")
      require(!row.isEmpty, s"bucketedEquiJoin: $t is not bucketed")
      row.select("data_type").head().getString(0).trim.toInt
    }
    val (lb, rb) = (buckets(leftTable), buckets(rightTable))
    require(lb == rb,
      s"bucketedEquiJoin: bucket counts differ ($leftTable=$lb, " +
        s"$rightTable=$rb) — Spark would fall back to a full shuffle")
    spark.table(leftTable).join(spark.table(rightTable), key)
  }
}
