package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Prints a cumulative MEDIAN-of-rounds JSON line
  * after EVERY completed query (the driver parses the last line), so a run
  * killed at any point still leaves a valid artifact. Medians rather than
  * min: same-code round-over-round artifacts have shown ±18% host swings,
  * and the median both resists steal-spike outliers and (unlike min) does
  * not systematically understate — so real per-query regressions stay
  * visible. A wall-clock deadline (SPARK_GRAFT_BENCH_DEADLINE_S, default
  * 1200 s) stops new query runs so the process exits cleanly before any
  * external timeout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "1200").toLong
    val startNanos = System.nanoTime()
    def elapsedS: Long = (System.nanoTime() - startNanos) / 1000000000L
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // extra session confs, ';'-separated k=v pairs — e.g. benching with a
    // graft tuning valve set (SPARK_GRAFT_EXTRA_CONF=
    // "spark.graft.jaccard.maxCandidatePairs=1000000000")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + parquet footer caches, so the first measured
    // query isn't charged for session startup
    spark.range(5000000L).selectExpr("sum(id)").collect()
    // tableFilter scale corpora (documents/embeddings-only dirs) lack
    // lineitem — a missing warmup table must not kill the run
    SparkEntry.queries.get("q12_agg_sum").foreach { q =>
      try q(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // The host VM has CPU-steal spikes that can inflate a single run
    // 10-50x, so: median over `rounds` repetitions, with the repetitions
    // INTERLEAVED (round-robin over all queries) rather than back-to-back —
    // a multi-second steal burst then hits each query at most once, and the
    // median discards it.
    // optional comma-separated name filter for bisecting bench behavior
    val only = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val samples =
      scala.collection.mutable.Map.empty[String, Vector[Double]]
    val errors = scala.collection.mutable.Map.empty[String, String]
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // The driver keeps only a ~2000-char tail of stdout and json-parses a
    // line from it, so the emitted line must stay well under that budget:
    // short keys ("q93" not "q93_cluster_split") and millisecond precision.
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    def fmt(v: Double): String = f"$v%.3f"
    def render(): String = {
      // queries that never succeeded are excluded from timings and the
      // total, and surfaced explicitly in "failures"
      val med = samples.view.mapValues(median).toMap
      val failed = errors.keySet -- med.keySet
      val qs = med.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${shortKey(k)}":${fmt(v)}""" }
        .mkString("{", ",", "}")
      val fails = failed.toSeq.sorted
        .map(k => s""""${shortKey(k)}":"${errors(k).replace("\"", "'").take(60)}"""")
        .mkString("{", ",", "}")
      val total = if (med.nonEmpty) med.values.sum else 0.0
      // declared-workload revisions ride the artifact (after "queries",
      // so they survive the driver's tail clipping) — benchgate keys its
      // REDECLARED exemption on rev identity, not runtime inference
      val revs = SparkEntry.queryRevisions.toSeq
        .map { case (k, v) => s""""${shortKey(k)}":$v""" }
        .sorted.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"median","runs":$rounds,"queries":$qs,"failures":$fails,"rev":$revs,"sf":"$sfDir","elapsed_s":$elapsedS}"""
    }
    def emit(): Unit = {
      val line = render()
      println(line)
      Console.out.flush()
      // redundant copy at a known path in case the stdout tail is clipped
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
          (line + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }

    var overDeadline = false
    for (round <- 1 to rounds if !overDeadline) {
      for ((name, fn) <- names if !overDeadline) {
        if (elapsedS >= deadlineS) {
          // never start a query past the deadline; round 1 guarantees every
          // query at least one attempt unless the deadline already passed
          overDeadline = true
        } else {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            samples(name) = samples.getOrElse(name, Vector.empty) :+ dt
          } catch {
            // a failed run is recorded as a FAILURE, never as a timing
            case e: Throwable =>
              errors(name) = e.toString.takeWhile(_ != '\n').take(200)
          }
          // drop per-query persisted frames so queries are measured standalone
          graft.ops.Dedup.releaseCaches()
          spark.catalog.clearCache()
          emit()
        }
      }
    }
    emit()
    spark.stop()
  }
}
