package graft

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the heavy dedup family over [[ScaleGen]] data:
  * times each op at a given data dir so runs one decade apart yield
  * measured scaling exponents (SCALE.md "Measured").
  *
  * Usage: runMain graft.ScaleProbe <dir> <op> <reps> [cap] [thr]
  *  ops: jaccard (cap = maxShingleFreq) | clusters | split | sdedup |
  *  ema (dir unused) | bucketauto (stage breakdown) |
  *  embed (cap = blockPlanes, 0 = adaptive default; thr = cosine
  *  threshold, default 0.3 — use ≥0.85 on bounded-mode ScaleUp corpora,
  *  where only engineered sibling pairs sit above it: the base synthetic
  *  vectors put ~0.8% of RANDOM pairs above 0.3 at dim 64, so pair
  *  volume at low thresholds is quadratic in any corpus) |
  *  semdedupk (cap = k, 0 = adaptive default; thr = eps) |
  *  binaryann (cap = |queries|; thr 1 = force brute broadcast path,
  *  2 = force pigeonhole byte-block path, else the auto rule) |
  *  pairs (near-dup pair-volume control) |
  *  mergeop (fixture built ONCE, reps time only the merge; cap =
  *  split id) | bitextstore (cap = planes, thr = minMargin) |
  *  mediastore (image chunk store vs per-batch re-decode) |
  *  curateincr (incremental curation batch vs one-shot union; cap =
  *  planes, thr = dupThreshold — >= 0.85 on ScaleUp corpora) |
  *  edstore (PassJoin segment store vs per-batch ref re-segment) |
  *  domgate (histogram-sidecar quality gate vs one-shot union gate) |
  *  bm25store (postings index vs per-query corpus re-tokenize) |
  *  ivfstore (saved cell index vs per-query corpus re-assignment) |
  *  pqstore (saved code table vs per-query corpus re-encode) |
  *  reportstore (sidecar-derived data card vs one-shot re-read)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cap = if (args.length > 3) args(3).toLong else -1L
    val thr = if (args.length > 4) args(4).toDouble else 0.3
    // op-specific extra knob: bitextrecall jitter amplitude — the
    // per-component factor is uniform in (1-amp, 1+amp), so planted
    // pair cosine ≈ 1/sqrt(1 + amp²/3): 0.05 plants ~0.999 copies,
    // 0.7 the ~0.93 "paraphrase" regime, 1.2 the ~0.82 boundary where
    // LSH bucket-collision loss becomes visible
    val amp = if (args.length > 5) args(5).toDouble else 0.05
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()
    import graft.ops.{Dedup, Sampling}
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    // ONE-TIME fixtures shared across reps (r14 ask 8: the 100x gate
    // pays the OP per rep, not the fixture) — lazy, built on the
    // first rep that uses them; rep 1's [scale] line therefore
    // includes the build, use later reps for the op cost.
    lazy val mergeFixture: (String, String, Long) = {
      import org.apache.spark.sql.functions._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-mergefix").toString
      val tB = System.nanoTime()
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 12, 4)
        .write.mode("overwrite").parquet(s"$tmp/pairs")
      val split =
        if (cap > 0) cap
        else docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
      val saved = spark.read.parquet(s"$tmp/pairs")
      Dedup.duplicateClusters(saved
          .where(col("id_a") < split && col("id_b") < split))
        .write.mode("overwrite").parquet(s"$tmp/prior")
      Dedup.releaseCaches()
      println(f"[mergeop] fixture_once=" +
        f"${(System.nanoTime() - tB) / 1e9}%.1f s split=$split")
      (s"$tmp/pairs", s"$tmp/prior", split)
    }
    lazy val curateFixture: (String, String, String, Long) = {
      import org.apache.spark.sql.functions._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-curatefix").toString
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("quality", (col("vec_id") * 37 % 101).cast("long"))
      val planes = if (cap > 0) cap.toInt else 12
      val split = e.agg(max("vec_id")).head().getLong(0) - 199
      val ref = e.where(col("vec_id") < split)
      val tB = System.nanoTime()
      Dedup.vectorBucketSignatures(ref, "vec_id", "embedding",
          blockTables = 4, blockPlanes = planes, dim = 64)
        .write.mode("overwrite").partitionBy("t")
        .parquet(s"$tmp/buckets")
      val boot = graft.ops.Curation.embedCurateBootstrap(ref,
        "vec_id", "embedding", "quality", dupThreshold = thr,
        blockTables = 4, blockPlanes = planes, dim = 64)
      boot.labels.write.mode("overwrite").parquet(s"$tmp/labels")
      boot.resolved.write.mode("overwrite").parquet(s"$tmp/resolved")
      Dedup.releaseCaches()
      val tBoot = (System.nanoTime() - tB) / 1e9
      // the one-shot preset on the UNION, once — the per-batch cost a
      // non-incremental pipeline would re-pay
      val t1 = System.nanoTime()
      val nOne = graft.ops.Curation.embedCurate(e, "vec_id",
        "embedding", "quality", dupThreshold = thr, blockTables = 4,
        blockPlanes = planes, dim = 64).count()
      Dedup.releaseCaches()
      println(f"[curateincr] bootstrap_once=$tBoot%.1f s " +
        f"oneshot=${(System.nanoTime() - t1) / 1e9}%.1f s " +
        s"oneshot_rows=$nOne split=$split planes=$planes")
      (s"$tmp/buckets", s"$tmp/labels", s"$tmp/resolved", split)
    }
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = op match {
        case "jaccard" =>
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, cap).count()
        case "clusters" =>
          Dedup.duplicateClusters(Dedup.minhashLshPairs(
            docs, "doc_id", "text", 3, 12, 4)).count()
        case "split" =>
          val d = docs
          val pairs = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 12, 4)
          val (tr, te) = Sampling.clusterAwareSplit(d, "doc_id", pairs, 0.3)
          tr.count() + te.count()
        case "sdedup" =>
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-sdedup").toString
          val ev = spark.read.parquet(s"$dir/events.parquet")
            .select("event_id", "event_type", "ts")
          ev.write.parquet(s"$tmp/src")
          ev.write.mode("append").parquet(s"$tmp/src")
          val q = graft.streaming.StreamingMigrations.streamingDedup(
            graft.streaming.StreamingMigrations.readStream(
              spark, s"$tmp/src", ev.schema), "ts", Seq("event_id"),
            watermark = "3650 days")
            .writeStream.format("parquet")
            .option("path", s"$tmp/out")
            .option("checkpointLocation", s"$tmp/cp")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          spark.read.parquet(s"$tmp/out").count()
        case "ema" =>
          // long per-key series: 500k rows/key x 4 keys, through the
          // full $setWindowFields compile path. The pre-r5 prefix fold
          // was O(|partition|^2) — ~2.5e11 ops per key, unrunnable at
          // this size; the native window function is one linear pass.
          val df = spark.range(2000000L).selectExpr("id % 4 AS k",
            "id AS t", "CAST(id % 1000 AS DOUBLE) AS v")
          graft.pipeline.PipelineCompiler.compile(Seq(
            Map("$setWindowFields" -> Map(
              "partitionBy" -> "$k", "sortBy" -> Map("t" -> 1),
              "output" -> Map("ema" -> Map("$expMovingAvg" ->
                Map("input" -> "$v", "N" -> 20)))))))(df)
            .selectExpr("sum(ema)").collect()
          2000000L
        case "bucketauto" =>
          // stage breakdown for the $bucketAuto granularity path
          import org.apache.spark.sql.functions._
          val o = spark.read.parquet(s"$dir/orders.parquet")
          def t(lbl: String)(f: => Long): Unit = {
            val t0i = System.nanoTime()
            val n2 = f
            println(f"[bucketauto] $lbl ${(System.nanoTime() - t0i) / 1e9}%.2f s rows=$n2")
          }
          t("scan")(o.count())
          val withBv = graft.functions.Granularity.quantizeInto(
            o, col("o_totalprice"), "R10", "__bv")
          t("quantize")(withBv.select(sum(col("__bv"))).collect().length)
          t("freq")(withBv.select("__bv").groupBy("__bv")
            .agg(count(lit(1))).count())
          val full = graft.pipeline.PipelineCompiler.compile(Seq(
            Map("$bucketAuto" -> Map("groupBy" -> "$o_totalprice",
              "buckets" -> 6, "granularity" -> "R10"))))(o)
          println(full.queryExecution.executedPlan.toString.take(6000))
          t("full")(full.count())
          0L
        case "embed" =>
          // embedding near-dup with a sized bucket space: the optional
          // 4th arg is blockPlanes; 0/absent = the library's ADAPTIVE
          // default (autoBlockPlanes — the round-9 rule that replaced
          // the fixed 8-plane space the 100x rehearsal saturated,
          // +1 skew-headroom plane since round 10)
          val planes = if (cap > 0) cap.toInt else 0
          Dedup.embeddingNearDup(
            spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id",
            "embedding", threshold = thr, blockPlanes = planes, dim = 64)
            .count()
        case "binaryann" =>
          // binary-ANN query-set crossover: cap = |queries| (default
          // 1024); thr selects the candidate path — 1 forces brute
          // (broadcast limit above any query set), 2 forces the
          // pigeonhole byte-block join (limit 0), anything else leaves
          // the library's auto rule (broadcastQueryLimit 1024). Times
          // the full top-k including the rescore.
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val nq = if (cap > 0) cap.toInt else 1024
          if (thr == 1.0) spark.conf.set(
            "spark.graft.binaryann.broadcastQueryLimit", "1000000000000")
          else if (thr == 2.0) spark.conf.set(
            "spark.graft.binaryann.broadcastQueryLimit", "0")
          else spark.conf.unset("spark.graft.binaryann.broadcastQueryLimit")
          graft.ops.Similarity.binaryAnnTopK(e, e.limit(nq), "vec_id",
            "embedding", k = 10, shortlist = 40, dim = 64).count()
        case "semdedupk" =>
          // SemDeDup with SCALED blocking: k-means cells sized by the
          // adaptive default (autoCellCount, k ~ corpus/targetCell; cap
          // overrides k, 0/absent = auto). The fixed-`label` blocking
          // (q130's parameterization) grows blocks linearly and pair
          // work quadratically — this is the named in-engine remedy,
          // measured here so SCALE.md carries its exponent.
          Dedup.semDeDupKMeans(
            spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id",
            "embedding", eps = thr, k = if (cap > 0) cap.toInt else 0,
            iters = 3).count()
        case "saltgroup" =>
          // skew parity harness for the salted $group (dir unused):
          // 16M rows, 90% on ONE key, $sum. cap: -1 = unsalted, 0 =
          // auto, n>1 = hand-tuned n. thr = 0 disables AQE for the run.
          if (thr == 0) spark.conf.set("spark.sql.adaptive.enabled", "false")
          if (cap == 0L) spark.conf.set("spark.graft.skewSalt", "auto")
          else if (cap > 1L)
            spark.conf.set("spark.graft.skewSalt", cap.toString)
          else spark.conf.unset("spark.graft.skewSalt")
          val rows = spark.range(16000000L).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 'hot' " +
              "ELSE concat('k', id % 100000) END AS k",
            "id AS v")
          val ng = graft.pipeline.PipelineCompiler.compile(Seq(
            Map("$group" -> (Map("_id" -> "$k",
              "s" -> Map("$sum" -> "$v")): Map[String, Any]))))(rows)
            .count()
          spark.conf.unset("spark.graft.skewSalt")
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          ng
        case "saltlookup" =>
          // skew parity harness for spark.graft.skewSalt (dir unused):
          // 40M outer rows, 90% on ONE key, against a right side too wide
          // to broadcast — the hot key lands every matching outer row on
          // one join task unless salted. cap: -1 = unsalted, 0 = auto
          // (sketch-sized), n>1 = hand-tuned n.
          if (thr == 0) spark.conf.set("spark.sql.adaptive.enabled", "false")
          if (cap == 0L) spark.conf.set("spark.graft.skewSalt", "auto")
          else if (cap > 1L)
            spark.conf.set("spark.graft.skewSalt", cap.toString)
          else spark.conf.unset("spark.graft.skewSalt")
          import org.apache.spark.sql.functions._
          val outer = spark.range(40000000L).selectExpr("id AS _id",
            "CASE WHEN id % 10 < 9 THEN 'hot' " +
              "ELSE concat('k', id % 100000) END AS k")
          val items = spark.range(100000L)
            .selectExpr(
              "CASE WHEN id = 0 THEN 'hot' ELSE concat('k', id) END AS k",
              "repeat(concat('p', CAST(id AS STRING), '-'), 40) AS pay")
          val n2 = graft.pipeline.PipelineCompiler.compile(Seq(
            Map("$lookup" -> (Map("from" -> "items",
              "localField" -> "k", "foreignField" -> "k",
              "as" -> "xs"): Map[String, Any]))), _ => items)(outer)
            .selectExpr("sum(size(xs))").head.getLong(0)
          spark.conf.unset("spark.graft.skewSalt")
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          n2
        case "pairs" =>
          // candidate/true-pair VOLUME evidence for the scaling analysis:
          // the LSH pair count is the output's intrinsic size — when the
          // corpus is built by replicating documents with light mutation
          // (ScaleUp), sibling groups make the true near-dup pair count
          // grow quadratically with the factor, so any correct pair
          // enumerator looks super-linear on that data
          Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 12, 4).count()
        case "editdist" =>
          // PassJoin fuzzy dedup UNFIXTURED: q229's code construction
          // with the doc_id filter LIFTED, so codes (and the
          // (l, k, segment) bucket space) grow with the corpus. Shared
          // "-alpha"-style tails concentrate buckets inside each length
          // class — this measures that exponent and exercises the
          // default-on candidate valve on real growth. cap >= 0
          // overrides spark.graft.editdist.maxCandidatePairs.
          import org.apache.spark.sql.functions._
          if (cap >= 0) spark.conf.set(
            "spark.graft.editdist.maxCandidatePairs", cap.toString)
          val sufs = Seq("-alpha", "-alphA", "-alpha7", "-alph",
            "-beta", "-gamma")
          val coded = docs.withColumn("code", concat(lit("prod"),
            (col("doc_id") / 6).cast("long").cast("string"),
            element_at(typedlit(sufs),
              (col("doc_id") % 6 + 1).cast("int"))))
          try Dedup.editDistancePairs(coded, "doc_id", "code", 1).count()
          finally spark.conf.unset(
            "spark.graft.editdist.maxCandidatePairs")
        case "urldedup" =>
          // URL canonicalization dedup UNFIXTURED: q227's 8-variant
          // construction over the WHOLE corpus — the normalize chain is
          // scan-fused, dedup is one hash shuffle, so the exponent
          // should track the scan.
          import org.apache.spark.sql.functions._
          import graft.ops.TextFunctions
          val pres = Seq(
            "https://Example.com/p", "https://example.com/p",
            "https://example.com:443/p", "https://www.example.com/p",
            "https://example.com/p", "https://example.com/p",
            "https://example.com/p", "https://other.org/p")
          val sufs = Seq(
            "/b?utm_source=x&id=7&z=2", "/b?z=2&id=7",
            "/b?id=7&z=2#frag", "/b/?id=7&z=2",
            "/b?jsessionid=A9F3&id=7&z=2", "/b?id=8&z=2",
            "/b?ref=main&id=7&z=2", "/c")
          val urls = docs.withColumn("url", concat(
            element_at(typedlit(pres), (col("doc_id") % 8 + 1).cast("int")),
            (col("doc_id") / 8).cast("long").cast("string"),
            element_at(typedlit(sufs), (col("doc_id") % 8 + 1).cast("int"))))
            .withColumn("url_canonical",
              TextFunctions.normalizeUrl(col("url")))
          Dedup.exact(urls, Seq("url_canonical"), "doc_id").count()
        case "bitext" =>
          // brute vs LSH margin mining, corpus split into halves:
          // times both paths and reports pair agreement. Above the
          // broadcast valve the brute path fails fast (by design) and
          // only the LSH path runs.
          import org.apache.spark.sql.functions._
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          // midpoint split: ScaleUp's strided copies land on BOTH
          // sides, so replica siblings (the "true translations" here)
          // cross the halves — an even/odd id split never does, the
          // stride being a power of 10
          val mid = e.agg(max("vec_id")).head().getLong(0) / 2
          val h1 = e.where(col("vec_id") <= mid)
          val h2 = e.where(col("vec_id") > mid)
          // agreement is reported overall AND on the cos >= 0.8 subset
          // (the TRUE-pair regime a bitext corpus cares about): on a
          // replica corpus only sibling pairs are real translations —
          // mutual-NN among the random mass is arbitrary either way
          def mined(f: => org.apache.spark.sql.DataFrame)
              : Option[(Set[(Long, Long)], Set[(Long, Long)])] =
            try {
              val rows = f.select("a_id", "b_id", "cos").collect()
              Some((rows.map(r => (r.getLong(0), r.getLong(1))).toSet,
                rows.filter(_.getDouble(2) >= 0.8)
                  .map(r => (r.getLong(0), r.getLong(1))).toSet))
            } catch {
              case ex: IllegalArgumentException =>
                println(s"[bitext] brute path valved: " +
                  ex.getMessage.take(90))
                None
            }
          val t1 = System.nanoTime()
          val brutePairs = mined(graft.ops.Similarity.bitextMine(
            h1, h2, "vec_id", "embedding", k = 4, minMargin = 1.0))
          val tBrute = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val Some((lshAll, lshHi)) = mined(
            graft.ops.Similarity.bitextMineLsh(
              h1, h2, "vec_id", "embedding", k = 4, minMargin = 1.0,
              nPlanes = 12, tables = 8, dim = 64))
          val tLsh = (System.nanoTime() - t2) / 1e9
          brutePairs match {
            case Some((bAll, bHi)) =>
              println(f"[bitext] brute=$tBrute%.1f s (${bAll.size} " +
                f"pairs, ${bHi.size} hi-cos) lsh=$tLsh%.1f s " +
                f"(${lshAll.size}, ${lshHi.size} hi-cos) " +
                f"agree=${bAll.intersect(lshAll).size} " +
                f"hi-cos agree=${bHi.intersect(lshHi).size}")
            case None =>
              println(f"[bitext] lsh=$tLsh%.1f s (${lshAll.size} " +
                f"pairs, ${lshHi.size} hi-cos)")
          }
          lshAll.size.toLong
        case "incrstore" =>
          // Incremental-ingest evidence for the signature store: a
          // FIXED 200-doc delta against the WHOLE corpus as reference
          // (production orientation — q228/q230 invert it). (a) the
          // recompute path hashes the ref corpus per batch; (b) the
          // store amortizes that into one build, and the per-batch
          // probe cost stops depending on corpus size.
          import org.apache.spark.sql.functions._
          val delta = docs.where(col("doc_id") < 200)
          val t1 = System.nanoTime()
          val nRecompute = Dedup.minhashLshPairsBetween(
            delta, docs, "doc_id", "text", 3, 12, 4).count()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-bandstore-probe").toString
          val t2 = System.nanoTime()
          Dedup.minhashBandSignatures(docs, "doc_id", "text", 3, 12, 4)
            .write.mode("overwrite").partitionBy("band").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val nStore = Dedup.minhashLshPairsBetweenPrecomputed(
            delta, spark.read.parquet(store), "doc_id", "text",
            3, 12, 4).count()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[incrstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"pairs=$nRecompute/$nStore")
          require(nRecompute == nStore,
            "store path diverged from recompute path")
          nStore
        case "edstore" =>
          // Incremental-ingest evidence for the PassJoin SEGMENT
          // store: a FIXED 200-code delta against the WHOLE corpus as
          // reference (the editdist probe's code construction). (a)
          // the recompute path re-segments + re-persists the ref
          // corpus per batch; (b) the store amortizes that into one
          // build — the per-batch probe pays only the delta's probes
          // against the saved (l, k, sub) frame, with the ref strings
          // riding the store into the verify.
          import org.apache.spark.sql.functions._
          val sufs = Seq("-alpha", "-alphA", "-alpha7", "-alph",
            "-beta", "-gamma")
          val coded = docs.withColumn("code", concat(lit("prod"),
            (col("doc_id") / 6).cast("long").cast("string"),
            element_at(typedlit(sufs),
              (col("doc_id") % 6 + 1).cast("int"))))
          val delta = coded.where(col("doc_id") < 200)
          val t1 = System.nanoTime()
          val nRecompute = Dedup.editDistancePairsBetween(
            delta, coded, "doc_id", "code", 1).count()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-edstore-probe").toString
          val t2 = System.nanoTime()
          Dedup.editDistanceSegmentStore(coded, "doc_id", "code", 1)
            .write.mode("overwrite").partitionBy("k").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val nStore = Dedup.editDistancePairsBetweenPrecomputed(
            delta, spark.read.parquet(store), "doc_id", "code", 1)
            .count()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[edstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"pairs=$nRecompute/$nStore")
          require(nRecompute == nStore,
            "store path diverged from recompute path")
          nStore
        case "domgate" =>
          // Incremental quality-gate evidence: FIXED 200-doc delta,
          // prior = the rest of the corpus. (a) the one-shot exact
          // gate on the union re-aggregates every prior batch's
          // scores per ingest; (b) the incremental face merges the
          // SAVED histogram sidecar with the delta's counts and gates
          // the delta only — per-batch cost is delta-sized plus
          // histogram-sized, never corpus-sized.
          import org.apache.spark.sql.functions._
          val delta = docs.where(col("doc_id") < 200)
          val prior = docs.where(col("doc_id") >= 200)
          val t1 = System.nanoTime()
          val nOne = graft.ops.Curation.domainPercentileFilter(
              prior.unionByName(delta), "source", "n_chars", 0.5,
              exact = true)
            .where(col("doc_id") < 200).count()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-histstore-probe").toString
          val t2 = System.nanoTime()
          graft.ops.Curation.domainScoreHistogram(prior, "source",
              "n_chars")
            .write.mode("overwrite").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val nIncr = graft.ops.Curation
            .domainPercentileFilterIncremental(delta,
              spark.read.parquet(store), "source", "n_chars", 0.5)
            .kept.count()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[domgate] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"kept=$nOne/$nIncr")
          require(nOne == nIncr,
            "incremental gate diverged from the one-shot union gate")
          nIncr
        case "bm25store" =>
          // Index-once/query-many evidence for the lexical index: one
          // 3-term query. (a) the one-shot path re-tokenizes the
          // WHOLE corpus per query; (b) the saved postings store
          // reads only the terms' bucket partitions + the stats row.
          // Ranked doc ids must agree exactly (scores can differ in
          // the last ulp across aggregation orders, so parity checks
          // ids + matched counts).
          import org.apache.spark.sql.functions._
          import graft.ops.TextSearch
          val terms = Seq("data", "query", "spark")
          val t1 = System.nanoTime()
          val oneShot = TextSearch.bm25(docs, "doc_id", "text",
            terms, k = 20).select("doc_id", "matched").collect()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-bm25-probe").toString
          val t2 = System.nanoTime()
          val idx = TextSearch.bm25Index(docs, "doc_id", "text")
          idx.postings.write.mode("overwrite").partitionBy("bkt")
            .parquet(s"$store/postings")
          idx.stats.write.mode("overwrite").parquet(s"$store/stats")
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val saved = TextSearch.Bm25Index(
            spark.read.parquet(s"$store/postings"),
            spark.read.parquet(s"$store/stats"))
          val viaStore = TextSearch.bm25Precomputed(saved, "doc_id",
            terms, k = 20).select("doc_id", "matched").collect()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[bm25store] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"top20=${oneShot.length}/${viaStore.length}")
          require(oneShot.map(_.getLong(0)).toSeq ==
            viaStore.map(_.getLong(0)).toSeq,
            "store ranking diverged from the one-shot ranking")
          viaStore.length.toLong
        case "ivfstore" =>
          // Index-once evidence for IVF ANN: 8 fixed queries, 16
          // fixed centroids. (a) ivfTopK re-assigns the WHOLE corpus
          // to cells per query batch; (b) the saved cell index is
          // assigned once and queries read only their probed cells.
          import org.apache.spark.sql.functions._
          import graft.ops.Similarity
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val cents = e.where(col("vec_id") < 16)
          val queries = e.where(col("vec_id") < 8)
          val t1 = System.nanoTime()
          val viaFull = Similarity.ivfTopK(e, queries, "vec_id",
            "embedding", cents, k = 10, nprobe = 4).collect()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-ivf-probe").toString
          val t2 = System.nanoTime()
          Similarity.ivfCellSignatures(e, "vec_id", "embedding", cents)
            .write.mode("overwrite").partitionBy("cell").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val viaStore = Similarity.ivfTopKPrecomputed(queries,
            spark.read.parquet(store), "vec_id", "embedding", cents,
            k = 10, nprobe = 4).collect()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[ivfstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"rows=${viaFull.length}/${viaStore.length}")
          require(viaFull.map(r => (r.getLong(0), r.getLong(1),
              r.getInt(2))).toSet ==
            viaStore.map(r => (r.getLong(0), r.getLong(1),
              r.getInt(2))).toSet,
            "store path diverged from recompute path")
          viaStore.length.toLong
        case "reportstore" =>
          // Data-card refresh economics: FIXED 200-doc delta, prior =
          // the rest. (a) the one-shot card re-reads every batch's
          // TEXT per refresh (langId + md5 + lengths over the whole
          // corpus); (b) the incremental card merges three bounded-
          // width sidecars with the delta's and derives from counts.
          import org.apache.spark.sql.functions._
          val delta = docs.where(col("doc_id") < 200)
          val prior = docs.where(col("doc_id") >= 200)
          val t1 = System.nanoTime()
          val full = graft.ops.Curation.corpusReport(
            prior.unionByName(delta), "doc_id", "text", "source")
            .collect()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-report-probe").toString
          val t2 = System.nanoTime()
          val sc0 = graft.ops.Curation.corpusReportSidecars(prior,
            "doc_id", "text", "source")
          sc0.lenHist.write.mode("overwrite").parquet(s"$store/len")
          sc0.langCounts.write.mode("overwrite").parquet(s"$store/lang")
          sc0.hashes.write.mode("overwrite").parquet(s"$store/hash")
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val incr = graft.ops.Curation.corpusReportIncremental(delta,
            graft.ops.Curation.CorpusReportState(
              spark.read.parquet(s"$store/len"),
              spark.read.parquet(s"$store/lang"),
              spark.read.parquet(s"$store/hash")),
            "doc_id", "text", "source")._1.collect()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[reportstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"rows=${full.length}/${incr.length}")
          def key(r: org.apache.spark.sql.Row) = r.toSeq.map {
            case d: Double => f"$d%.9f"; case x => String.valueOf(x)
          }.mkString("|")
          require(full.map(key).toSet == incr.map(key).toSet,
            "incremental card diverged from the one-shot card")
          incr.length.toLong
        case "pqstore" =>
          // Encode-once evidence for the PQ code table: 8 fixed
          // queries. (a) pqTopK re-encodes the WHOLE corpus (m·k
          // sub-cosines per vector) per query batch; (b) the saved
          // code table is scanned as a few bytes per vector.
          import org.apache.spark.sql.functions._
          import graft.ops.Quantize
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val cb = Quantize.pqCodebooks(e, "vec_id", "embedding",
            dim = 64, m = 4, k = 16, iters = 2)
          val queries = e.where(col("vec_id") < 8)
          val t1 = System.nanoTime()
          val viaFull = Quantize.pqTopK(e, queries, "vec_id",
            "embedding", cb, dim = 64, m = 4, k = 10)
            .select("query_id", "neighbor_id", "rank").collect()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-pq-probe").toString
          val t2 = System.nanoTime()
          Quantize.pqCodeSignatures(e, "vec_id", "embedding", cb,
              dim = 64, m = 4)
            .write.mode("overwrite").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val viaStore = Quantize.pqTopKPrecomputed(queries,
            spark.read.parquet(store), "vec_id", "embedding", cb,
            dim = 64, m = 4, k = 10)
            .select("query_id", "neighbor_id", "rank").collect()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[pqstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"rows=${viaFull.length}/${viaStore.length}")
          require(viaFull.map(r => (r.getLong(0), r.getLong(1),
              r.getInt(2))).toSet ==
            viaStore.map(r => (r.getLong(0), r.getLong(1),
              r.getInt(2))).toSet,
            "store path diverged from recompute path")
          viaStore.length.toLong
        case "embedstore" =>
          // Incremental-ingest evidence for the VECTOR bucket store
          // (the incrstore probe applied to embeddings): a FIXED
          // 200-vec delta against the whole corpus as reference.
          // (a) the recompute path re-hashes every ref vector into
          // tables×planes sign buckets per batch; (b) the store
          // amortizes that into one build — the per-batch probe cost
          // stops depending on corpus hashing. cap = blockPlanes
          // (pinned, store discipline; default 12), thr = cosine
          // threshold (use >= 0.85 on ScaleUp corpora — see `embed`).
          import org.apache.spark.sql.functions._
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val planes = if (cap > 0) cap.toInt else 12
          val delta = e.where(col("vec_id") < 200)
          val t1 = System.nanoTime()
          val nRecompute = Dedup.embeddingNearDupBetween(
            delta, e, "vec_id", "embedding", thr,
            blockTables = 4, blockPlanes = planes, dim = 64).count()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-vecstore-probe").toString
          val t2 = System.nanoTime()
          Dedup.vectorBucketSignatures(e, "vec_id", "embedding",
              blockTables = 4, blockPlanes = planes, dim = 64)
            .write.mode("overwrite").partitionBy("t").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val nStore = Dedup.embeddingNearDupBetweenPrecomputed(
            delta, spark.read.parquet(store), e, "vec_id", "embedding",
            thr, blockTables = 4, blockPlanes = planes, dim = 64)
            .count()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[embedstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"pairs=$nRecompute/$nStore planes=$planes")
          require(nRecompute == nStore,
            "store path diverged from recompute path")
          nStore
        case "mergeclusters" =>
          // Incremental cluster-maintenance evidence: prior = the
          // labeling of pairs among the first 80% of ids, delta = the
          // remaining pairs. Full recompute re-propagates EVERY pair;
          // the merge contracts the delta against prior labels and
          // propagates the contracted graph only. Labels must match
          // exactly. cap = split id (default 80% of max).
          import org.apache.spark.sql.functions._
          val pairs = Dedup.minhashLshPairs(
            docs, "doc_id", "text", 3, 12, 4).persist()
          val split =
            if (cap > 0) cap
            else docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
          val priorPairs = pairs
            .where(col("id_a") < split && col("id_b") < split)
          val deltaPairs = pairs
            .where(col("id_a") >= split || col("id_b") >= split)
          val nDelta = deltaPairs.count()
          val t1 = System.nanoTime()
          val full = Dedup.duplicateClusters(pairs)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          val tFull = (System.nanoTime() - t1) / 1e9
          val prior = Dedup.duplicateClusters(priorPairs).persist()
          prior.count() // materialize: the batch starts from labels
          val t2 = System.nanoTime()
          val merged = Dedup.mergeClusters(prior, deltaPairs)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          val tMerge = (System.nanoTime() - t2) / 1e9
          pairs.unpersist(); prior.unpersist()
          println(f"[mergeclusters] full=$tFull%.1f s " +
            f"merge=$tMerge%.1f s delta_pairs=$nDelta " +
            s"nodes=${full.size}/${merged.size}")
          require(merged == full,
            "merged labels diverged from full recompute")
          full.size.toLong
        case "bitextrecall" =>
          // Bitext-mining RECALL/PRECISION curve on a planted-pair
          // fixture (the deconrecall precedent applied to
          // bitextMineLsh): side A = the first `cap` corpus vectors
          // (default 200), side B = their hash-jittered copies (the
          // planted "translations") plus cap/4 HUB distractors —
          // near-copies of the corpus mean direction, similar to many
          // A rows at once, the failure mode the ratio margin exists
          // to kill. Ground truth = the brute path at the same
          // (k, minMargin); thr = minMargin (default 1.0). Recall
          // measures LSH candidate loss only — both paths share the
          // margin math.
          import org.apache.spark.sql.functions._
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val nb = if (cap > 0) cap.toInt else 200
          val margin = if (thr > 0.3) thr else 1.0
          val aSide = e.orderBy("vec_id").limit(nb)
            .select(col("vec_id"), col("embedding"))
          val bPar = aSide.select(col("vec_id"),
            expr("transform(embedding, (x, i) -> x * (1.0 + " +
              s"((hash(vec_id * 131 + i) % 101) / 101.0 * $amp)))")
              .as("embedding"))
          // corpus mean direction, folded to a literal (64 doubles of
          // bounded driver state), hash-jittered per hub id
          val mean = aSide
            .select(posexplode(col("embedding")).as(Seq("i", "x")))
            .groupBy("i").agg(avg("x").as("m")).orderBy("i")
            .collect().map(_.getDouble(1))
          val hubs = spark.range(math.max(1L, nb / 4))
            .select((col("id") + 1000000L).as("vec_id"),
              expr(s"transform(${mean.mkString("array(", ",", ")")}, " +
                "(x, i) -> x * (1.0 + ((hash(id * 97 + i) % 101) / " +
                "2020.0)))").as("embedding"))
          val bSide = bPar.unionByName(hubs)
          def mine(f: => org.apache.spark.sql.DataFrame)
              : Set[(Long, Long)] =
            f.select("a_id", "b_id").collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet
          val brute = mine(graft.ops.Similarity.bitextMine(
            aSide, bSide, "vec_id", "embedding", k = 4,
            minMargin = margin))
          for (tb <- Seq(4, 8, 16); np <- Seq(4, 8, 12)) {
            val t1 = System.nanoTime()
            val lsh = mine(graft.ops.Similarity.bitextMineLsh(
              aSide, bSide, "vec_id", "embedding", k = 4,
              minMargin = margin, nPlanes = np, tables = tb, dim = 64))
            val inter = lsh.intersect(brute).size
            val recall =
              if (brute.isEmpty) 1.0 else inter.toDouble / brute.size
            val precision =
              if (lsh.isEmpty) 1.0 else inter.toDouble / lsh.size
            println(f"[bitextrecall] tables=$tb planes=$np " +
              f"margin=$margin brute=${brute.size} lsh=${lsh.size} " +
              f"recall=$recall%.4f precision=$precision%.4f " +
              f"${(System.nanoTime() - t1) / 1e9}%.1f s")
          }
          brute.size.toLong
        case "deconrecall" =>
          // Semantic-decontamination RECALL curve: plant deterministic
          // near-copies of `cap` corpus vectors (default 512) as the
          // benchmark side, compute exact ground truth on the broadcast
          // path, then force the LSH path and measure recall per
          // (tables, nPlanes). thr = cosine threshold (use >= 0.8:
          // jittered copies sit ~0.99, random pairs far below).
          import org.apache.spark.sql.functions._
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val nb = if (cap > 0) cap.toInt else 512
          // hash-conditioned ±5% jitter — the "paraphrase" analog, no
          // rand() so runs are reproducible
          val bench = e.orderBy("vec_id").limit(nb)
            .select(col("vec_id").as("b_id"),
              expr("transform(embedding, (x, i) -> x * (1.0 + " +
                "((hash(vec_id * 131 + i) % 101) / 2020.0)))")
                .as("b_vec"))
          val t = if (thr > 0 && thr < 1) thr else 0.85
          def flagged(limit: String): Set[Long] = {
            spark.conf.set("spark.graft.semdecon.broadcastLimit", limit)
            try graft.ops.Decontaminate.semantic(
                e, "vec_id", "embedding", bench, "b_id", "b_vec",
                threshold = t, dim = 64)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            finally spark.conf.unset("spark.graft.semdecon.broadcastLimit")
          }
          val exact = flagged(Long.MaxValue.toString)
          for (tb <- Seq(4, 8, 16); np <- Seq(4, 8, 12, 16)) {
            spark.conf.set("spark.graft.semdecon.broadcastLimit", "0")
            val t1 = System.nanoTime()
            val lsh =
              try graft.ops.Decontaminate.semantic(
                  e, "vec_id", "embedding", bench, "b_id", "b_vec",
                  threshold = t, nPlanes = np, tables = tb, dim = 64)
                .select("vec_id").collect().map(_.getLong(0)).toSet
              finally spark.conf.unset(
                "spark.graft.semdecon.broadcastLimit")
            val recall =
              if (exact.isEmpty) 1.0
              else lsh.intersect(exact).size.toDouble / exact.size
            println(f"[deconrecall] tables=$tb planes=$np thr=$t " +
              f"exact=${exact.size} lsh=${lsh.size} recall=$recall%.4f " +
              f"${(System.nanoTime() - t1) / 1e9}%.1f s")
          }
          exact.size.toLong
        case "mergeop" =>
          // the ask-8 variant of "mergeclusters": fixture (corpus
          // pairs + prior labels) built ONCE (lazy, parquet-persisted),
          // each rep times ONLY the merge — the per-batch number a
          // production ingest actually pays
          import org.apache.spark.sql.functions._
          val (pairsPath, priorPath, split) = mergeFixture
          val deltaPairs = spark.read.parquet(pairsPath)
            .where(col("id_a") >= split || col("id_b") >= split)
          val t1 = System.nanoTime()
          val nOut = Dedup.mergeClusters(
            spark.read.parquet(priorPath), deltaPairs).count()
          println(f"[mergeop] merge=" +
            f"${(System.nanoTime() - t1) / 1e9}%.1f s nodes=$nOut")
          nOut
        case "bitextstore" =>
          // per-batch bitext cost: recompute (BOTH sides hashed per
          // batch) vs the saved indexed-side bucket store. delta =
          // first 200 vectors, indexed side = whole corpus; cap =
          // planes (default 12), thr = minMargin (> 0.3, else 1.0).
          import org.apache.spark.sql.functions._
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val planes = if (cap > 0) cap.toInt else 12
          val margin = if (thr > 0.3) thr else 1.0
          val delta = e.where(col("vec_id") < 200)
          val t1 = System.nanoTime()
          val nRec = graft.ops.Similarity.bitextMineLsh(delta, e,
            "vec_id", "embedding", k = 4, minMargin = margin,
            nPlanes = planes, tables = 8, dim = 64).count()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-bitextstore-probe").toString
          val t2 = System.nanoTime()
          Dedup.vectorBucketSignatures(e, "vec_id", "embedding",
              blockTables = 8, blockPlanes = planes, dim = 64)
            .write.mode("overwrite").partitionBy("t").parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val nStore = graft.ops.Similarity.bitextMineLshPrecomputed(
            delta, spark.read.parquet(store), e, "vec_id", "embedding",
            k = 4, minMargin = margin, nPlanes = planes, tables = 8,
            dim = 64).count()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[bitextstore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"pairs=$nRec/$nStore planes=$planes")
          require(nRec == nStore,
            "store path diverged from recompute path")
          nStore
        case "mediastore" =>
          // image-ingest decode amortization: media = deterministic
          // BMPs over doc ids (every row really decodes). Recompute
          // re-decodes + re-chunks the ref corpus per batch; the chunk
          // store pays that once.
          import org.apache.spark.sql.functions._
          import spark.implicits._
          val media = docs.select("doc_id").as[Long]
            .map(id => (id, graft.ops.Multimodal.fixtureBmp(id)))
            .toDF("media_id", "content")
          val delta = media.where(col("media_id") < 200)
          val ref = media.where(col("media_id") >= 200)
          val t1 = System.nanoTime()
          val nRec = graft.ops.Multimodal.mediaNearDupBetween(delta,
            graft.ops.Multimodal.mediaChunkSignatures(ref)).count()
          val tRec = (System.nanoTime() - t1) / 1e9
          val store = java.nio.file.Files
            .createTempDirectory("graft-mediastore-probe").toString
          val t2 = System.nanoTime()
          graft.ops.Multimodal.mediaChunkSignatures(ref)
            .write.mode("overwrite").partitionBy("chunk")
            .parquet(store)
          val tBuild = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val nStore = graft.ops.Multimodal.mediaNearDupBetween(
            delta, spark.read.parquet(store)).count()
          val tProbe = (System.nanoTime() - t3) / 1e9
          println(f"[mediastore] recompute=$tRec%.1f s " +
            f"build_once=$tBuild%.1f s probe=$tProbe%.1f s " +
            s"pairs=$nRec/$nStore")
          require(nRec == nStore,
            "store path diverged from recompute path")
          nStore
        case "curateincr" =>
          // the ask-1 flat-per-batch row: one 200-vector batch through
          // the INCREMENTAL curation preset against the lazily-built
          // prior state, vs the one-shot preset on the union (printed
          // once by the fixture). cap = planes (pinned), thr =
          // dupThreshold (use >= 0.85 on ScaleUp corpora).
          import org.apache.spark.sql.functions._
          val (storeP, labelsP, resolvedP, split) = curateFixture
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
            .withColumn("quality",
              (col("vec_id") * 37 % 101).cast("long"))
          val planes = if (cap > 0) cap.toInt else 12
          val t1 = System.nanoTime()
          val st = graft.ops.Curation.embedCurateIncremental(
            e.where(col("vec_id") >= split),
            e.where(col("vec_id") < split),
            spark.read.parquet(storeP), spark.read.parquet(labelsP),
            spark.read.parquet(resolvedP), "vec_id", "embedding",
            "quality", dupThreshold = thr, blockTables = 4,
            blockPlanes = planes, dim = 64)
          val nIncr = st.curated.count()
          Dedup.releaseCaches()
          println(f"[curateincr] incremental_batch=" +
            f"${(System.nanoTime() - t1) / 1e9}%.1f s rows=$nIncr")
          nIncr
        case other => throw new IllegalArgumentException(other)
      }
      println(f"[scale] $op $dir ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
