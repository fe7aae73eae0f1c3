package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc isolated benchmark: `runMain graft.BenchProbe q18_dedup_jaccard 4`
  * runs one query N times in a fresh JVM and prints per-run seconds —
  * the best-of-N methodology SCALE.md's numbers use. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) Seq(args(0))
      else Seq("q18_dedup_jaccard", "q50_dedup_clusters")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()
    for (q <- qs; _ <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      graft.ops.Dedup.releaseCaches()
      println(f"[probe] $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
