package graft
import org.apache.spark.sql.SparkSession
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()
    for (q <- Seq("q18_dedup_jaccard", "q18_dedup_jaccard", "q50_dedup_clusters", "q50_dedup_clusters")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      graft.ops.Dedup.releaseCaches()
      println(f"[probe] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
