package graft.ops

import org.apache.spark.sql.functions._

class CurationSpec extends graft.SparkSpec {
  import spark.implicits._

  test("curate: language gate, quality floor, dedup survivor, sampling") {
    // 'the/and' are en markers; 'der/und' de — quality needs stopwords,
    // alpha ratio, and length
    val good = "the quick brown fox and the lazy dog walked over the hill"
    val docs = Seq(
      (1L, good),                       // kept
      (2L, good),                       // exact dup of 1 → dropped
      (3L, "der hund und die katze und der vogel im haus und garten"),
      (4L, "the 1 2 3 4 5 6 7 8 9 0 ...")  // en-ish but low quality
    ).toDF("doc_id", "text")
    val out = Curation.curate(docs, "doc_id", "text",
      targetLang = "en", minQuality = 0.3, sampleFraction = 1.0)
    val kept = out.select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L))
    val row = out.head()
    assert(row.getString(row.fieldIndex("predicted_lang")) == "en")
    assert(row.getDouble(row.fieldIndex("quality")) >= 0.3)
    // deterministic: same inputs, same survivors
    val again = Curation.curate(docs, "doc_id", "text",
      targetLang = "en", minQuality = 0.3, sampleFraction = 1.0)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(again == kept)
    // sampleFraction = 0 keeps nothing
    assert(Curation.curate(docs, "doc_id", "text", "en", 0.3, 0.0)
      .count() == 0)
  }

  test("webCurate: extract, url-dedup, gate, content-dedup in one call") {
    val body = "the quick brown fox and the lazy dog walked over the " +
      "hill to see the other side of the fence and came back home"
    val pages = Seq(
      // same resource fetched twice (tracking param + www variant):
      // min-id fetch survives the URL dedup
      (1L, "https://example.com/a?utm_source=x",
        s"<html><body><p>$body</p></body></html>"),
      (2L, "https://www.example.com/a",
        s"<html><body><p>$body</p></body></html>"),
      // distinct URL but IDENTICAL extracted content: content dedup
      (3L, "https://example.com/b",
        s"<html><body><div>$body</div></body></html>"),
      // distinct URL, German content: language gate
      (4L, "https://example.com/de",
        "<html><body>der hund und die katze und der vogel im haus " +
          "und garten und der baum</body></html>"),
      // distinct URL, junk content: quality gate
      (5L, "https://example.com/junk",
        "<html><body>the 1 2 3 4 5 6 7 8 9 0 @@@</body></html>")
    ).toDF("page_id", "url", "html")
    val out = Curation.webCurate(pages, "page_id", "url", "html",
      targetLang = "en", minQuality = 0.3)
    val kept = out.select("page_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L))
    val row = out.head()
    assert(row.getString(row.fieldIndex("url_canonical")) ==
      "https://example.com/a")
    assert(row.getString(row.fieldIndex("clean_text")) == body)
    assert(row.getString(row.fieldIndex("predicted_lang")) == "en")
  }

  test("webCurateStructured: hooks run in the one correct order — " +
      "url dedup, line dedup, boilerplate lines, paragraphs, gates") {
    val body1 = "the quick brown fox and the lazy dog walked over " +
      "the hill to see the other side and came back home"
    val body2 = "the small grey cat and the old red hen sat near " +
      "the warm fire and watched the quiet rain fall down"
    val menu = "home products about contact"
    val footer = "all rights reserved"
    def page(b: String) = s"$menu\n$b\n$menu\n\n$footer"
    val pages = Seq(
      (1L, "https://example.com/a?utm_source=x", page(body1)),
      // same resource refetched: URL dedup drops it BEFORE text work
      (2L, "https://www.example.com/a", page(body1)),
      (3L, "https://example.com/b", page(body2)),
      // pure boilerplate: its only paragraph loses to doc 1's footer
      // -> the doc drops entirely (paragraphDedup semantics)
      (4L, "https://example.com/c", footer)
    ).toDF("page_id", "url", "text")
    val out = Curation.webCurateStructured(pages, "page_id", "url",
      "text", targetLang = "en", minQuality = 0.2,
      dedupLinesWithinDoc = true, dedupParagraphs = true)
      .select("page_id", "clean_text")
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 3L))
    // within-doc repeated menu line deduped; the shared footer
    // paragraph survives once corpus-wide (doc 1, first occurrence);
    // doc 3 keeps only its unique paragraph
    assert(out(1L) == s"$menu\n$body1\n\n$footer")
    assert(out(3L) == s"$menu\n$body2")
    // hooks OFF: the preset reduces to url-dedup + gates + content
    // dedup — doc 4's boilerplate-only page now survives or fails on
    // the gates alone (here: passes lang, fails nothing) and repeats
    // stay in the text
    val plain = Curation.webCurateStructured(pages, "page_id", "url",
      "text", targetLang = "en", minQuality = 0.0)
      .select("page_id", "clean_text")
      .as[(Long, String)].collect().toMap
    assert(plain(1L) == page(body1))
    // cross-corpus boilerplate hook AFTER url dedup: menu survives in
    // 2 of the 3 remaining docs, footer in 3 — maxLineDocFreq = 1
    // removes both everywhere; bodies survive, the boilerplate-only
    // doc 4 empties out and drops at the paragraph stage
    val noMenu = Curation.webCurateStructured(pages, "page_id", "url",
      "text", targetLang = "en", minQuality = 0.2,
      maxLineDocFreq = 1, dedupParagraphs = true)
      .select("page_id", "clean_text")
      .as[(Long, String)].collect().toMap
    assert(noMenu.keySet == Set(1L, 3L))
    assert(!noMenu.values.exists(_.contains(menu)))
    assert(noMenu(1L).contains(body1) && noMenu(3L).contains(body2))
  }

  test("embedCurate: cluster dedup keeps best quality, bench decon " +
      "drops contaminated survivors, sample is deterministic") {
    // 1 and 2 are one direction (cluster: keep best quality = 2);
    // 3 is orthogonal and CLOSE to the bench vector (decon drops it);
    // 4 is an untouched singleton
    val corpus = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 5L),
      (2L, Array(2.0, 0.0, 0.0, 0.0), 9L),
      (3L, Array(0.0, 1.0, 0.0, 0.0), 7L),
      (4L, Array(0.0, 0.0, 1.0, 0.0), 1L)
    ).toDF("vec_id", "embedding", "quality")
    val bench = Seq((100L, Array(0.0, 3.0, 0.0, 0.0)))
      .toDF("b_id", "b_vec")
    val out = Curation.embedCurate(corpus, "vec_id", "embedding",
      "quality", dupThreshold = 0.9,
      bench = Some((bench, "b_id", "b_vec")), deconThreshold = 0.9,
      blockTables = 2, blockPlanes = 4, dim = 4)
      .select("vec_id", "component", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    graft.ops.Dedup.releaseCaches()
    // 2 survives its cluster (quality 9 > 5) labeled by min id 1;
    // 3 is decontaminated away; 4 is a singleton
    assert(out == Set((2L, 1L, 2L), (4L, 4L, 1L)))
    // bench = None skips decon; sampleFraction = 0 empties the output
    val noDecon = Curation.embedCurate(corpus, "vec_id", "embedding",
      "quality", dupThreshold = 0.9, blockTables = 2, blockPlanes = 4,
      dim = 4)
      .select("vec_id").as[Long].collect().toSet
    graft.ops.Dedup.releaseCaches()
    assert(noDecon == Set(2L, 3L, 4L))
    assert(Curation.embedCurate(corpus, "vec_id", "embedding",
      "quality", dupThreshold = 0.9, blockTables = 2, blockPlanes = 4,
      dim = 4, sampleFraction = 0.0).count() == 0)
    graft.ops.Dedup.releaseCaches()
  }

  test("embedCurateIncremental chains three batches and equals the " +
      "one-shot preset on the union at every step") {
    // 4-dim scale-invariant sign buckets; dup families share a
    // direction. Bench vector flags id 5 (and nothing else).
    def df(rows: Seq[(Long, Array[Double], Long)]) =
      rows.toDF("vec_id", "embedding", "quality")
    val b0 = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 50L),
      (2L, Array(2.0, 0.0, 0.0, 0.0), 70L),
      (5L, Array(0.0, 1.0, 0.0, 0.0), 40L))
    val b1 = Seq(
      (11L, Array(3.0, 0.0, 0.0, 0.0), 90L), // joins {1,2}
      (12L, Array(0.0, 0.0, 1.0, 0.0), 30L), // new cluster with 13
      (13L, Array(0.0, 0.0, 2.0, 0.0), 20L))
    val b2 = Seq(
      (21L, Array(0.0, 0.0, 4.0, 0.0), 95L), // joins {12,13}
      (22L, Array(0.0, 0.0, 0.0, 1.0), 60L)) // true singleton
    val bench = Some((df(Seq((100L, Array(0.0, 2.0, 0.0, 0.0), 0L))),
      "vec_id", "embedding"))
    def oneShot(rows: Seq[(Long, Array[Double], Long)]) =
      Curation.embedCurate(df(rows), "vec_id", "embedding", "quality",
        dupThreshold = 0.9, bench = bench, deconThreshold = 0.9,
        blockTables = 2, blockPlanes = 4, dim = 4)
        .select("vec_id", "component", "cluster_size")
        .as[(Long, Long, Long)].collect().toSet
    def curated(st: Curation.EmbedCurateState) =
      st.curated.select("vec_id", "component", "cluster_size")
        .as[(Long, Long, Long)].collect().toSet
    val boot = Curation.embedCurateBootstrap(df(b0), "vec_id",
      "embedding", "quality", dupThreshold = 0.9, bench = bench,
      deconThreshold = 0.9, blockTables = 2, blockPlanes = 4, dim = 4)
    assert(curated(boot) == oneShot(b0))
    def step(prior: Curation.EmbedCurateState,
        refRows: Seq[(Long, Array[Double], Long)],
        delta: Seq[(Long, Array[Double], Long)]) =
      Curation.embedCurateIncremental(df(delta), df(refRows),
        graft.ops.Dedup.vectorBucketSignatures(df(refRows), "vec_id",
          "embedding", blockTables = 2, blockPlanes = 4, dim = 4),
        prior.labels, prior.resolved, "vec_id", "embedding",
        "quality", dupThreshold = 0.9, bench = bench,
        deconThreshold = 0.9, blockTables = 2, blockPlanes = 4,
        dim = 4)
    val s1 = step(boot, b0, b1)
    assert(curated(s1) == oneShot(b0 ++ b1))
    val s2 = step(s1, b0 ++ b1, b2)
    val want = oneShot(b0 ++ b1 ++ b2)
    assert(curated(s2) == want)
    // the expected end state, spelled out: 11 wins the {1,2,11}
    // family, 21 wins the {12,13,21} family, 22 is a singleton,
    // 5 deconed
    assert(want == Set((11L, 1L, 3L), (21L, 12L, 3L), (22L, 22L, 1L)))
    graft.ops.Dedup.releaseCaches()
  }

  test("webCurateIncremental chains batches and equals the one-shot " +
      "crawl preset on the union — url re-fetches and content dupes " +
      "drop across batches") {
    val en = "the quick brown fox and the lazy dog walked over the " +
      "hill while the cat sat on the mat and the dog barked at the moon"
    // batch 1: two url-variants of one page (within-batch url dedup),
    // a unique page, and a german page (gate drop — its URL must
    // still poison later re-fetches)
    val b0 = Seq(
      (1L, "https://Example.com/a?utm_source=x", s"<p>$en one</p>"),
      (2L, "https://example.com/a", s"<p>$en one changed</p>"),
      (3L, "https://example.com/b", s"<p>$en two</p>"),
      (4L, "https://example.com/de",
        "<p>der hund und die katze und der mond und die sonne der " +
          "und die der und die der und die der und die</p>"))
    // batch 2: a canonical re-fetch of /a (cross-batch url drop — 11
    // canonicalizes to batch 1's key via utm stripping), a content
    // dupe of /b under a new url (cross-batch content drop), and
    // genuinely new pages
    val b1 = Seq(
      (11L, "https://example.com/a?utm_medium=z", s"<p>$en eleven</p>"),
      (12L, "https://example.com/de?x=1",
        s"<p>$en de refetch new content</p>"),
      (13L, "https://example.com/c", s"<p>$en two</p>"),
      (14L, "https://example.com/d", s"<p>$en fourteen</p>"))
    // note 12's URL canon (/de?x=1) differs from 4's (/de) — only 11
    // is a true canonical re-fetch (utm_medium strips away); 12
    // survives on its own key
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "url", "html")
    def oneShot(rows: Seq[(Long, String, String)]) =
      Curation.webCurate(df(rows), "doc_id", "url", "html",
        targetLang = "en", minQuality = 0.2)
        .select("doc_id").as[Long].collect().toSet
    val boot = Curation.webCurateBootstrap(df(b0), "doc_id", "url",
      "html", targetLang = "en", minQuality = 0.2)
    assert(boot.curated.select("doc_id").as[Long].collect().toSet ==
      oneShot(b0))
    val incr = Curation.webCurateIncremental(df(b1), boot.newUrlKeys,
      boot.newContentKeys, "doc_id", "url", "html",
      targetLang = "en", minQuality = 0.2)
    val union = boot.curated.unionByName(incr.curated)
      .select("doc_id").as[Long].collect().toSet
    assert(union == oneShot(b0 ++ b1))
    // spelled out: 1 survives (min id of /a), 3 survives, 4 gated
    // out; 11 drops (re-fetch of /a), 13 drops (content dupe of 3),
    // 12 and 14 survive
    assert(union == Set(1L, 3L, 12L, 14L))
    // key deltas: batch 2 adds only its fresh keys
    assert(incr.newUrlKeys.as[String].collect().toSet ==
      Set("https://example.com/de?x=1", "https://example.com/c",
        "https://example.com/d"))
    assert(!union.contains(11L) && !union.contains(13L))
  }

  test("embedCurateBootstrap refuses an adaptive bucket space") {
    intercept[IllegalArgumentException] {
      Curation.embedCurateBootstrap(
        Seq((1L, Array(1.0), 1L)).toDF("vec_id", "embedding",
          "quality"),
        "vec_id", "embedding", "quality", dupThreshold = 0.9,
        blockPlanes = 0, dim = 1)
    }
  }

  test("corpusReport: per-source data card — counts, exact quantiles, " +
      "dup rate, dominant language with share; nulls and empties " +
      "counted but not measured") {
    import graft.ops.Curation
    val en1 = "the quick brown fox and the lazy dog now" // 40 chars
    val en2 = "a cat sat on the mat with the hat ok"     // 36 chars
    val de1 = "der hund und die katze sind nicht da"     // 36 chars
    assert(en1.length == 40 && en2.length == 36 && de1.length == 36)
    val rows = Seq[(Long, String, Option[String])](
      (1L, "a", Some(en1)), (2L, "a", Some(en1)), // dup pair
      (3L, "a", Some(en2)), (4L, "a", Some(de1)),
      (5L, "a", None), // null text
      (6L, "b", Some(de1)), (7L, "b", Some("")) // empty text
    ).toDF("doc_id", "source", "text")
    // columns: source, n_docs, n_empty, total_chars, p25, p50, p75,
    //          distinct_texts, top_lang, dup_rate, top_lang_share
    val r = Curation.corpusReport(rows, "doc_id", "text", "source")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) == 5 && a.getLong(2) == 1) // n_docs, n_empty
    assert(a.getLong(3) == 40L + 40 + 36 + 36)     // total_chars
    // lengths [36,36,40,40]: p50 interpolates to 38.0
    assert(a.getDouble(5) == 38.0)
    assert(a.getDouble(4) == 36.0 && a.getDouble(6) == 40.0)
    assert(a.getLong(7) == 3)                      // distinct_texts
    assert(a.getString(8) == "en")                 // 2 en docs > 1 de
    assert(math.abs(a.getDouble(9) - (1.0 - 3.0 / 5)) < 1e-12)
    assert(math.abs(a.getDouble(10) - 3.0 / 5) < 1e-12) // en1,en1,en2
    val b = r("b")
    assert(b.getLong(1) == 2 && b.getLong(2) == 1)
    // empty string hashes (md5("") is a value): de1 + "" = 2 distinct
    assert(b.getLong(7) == 2)
    // de:1 vs und:1 ("" classifies und) — tie breaks lang-asc to de
    assert(b.getString(8) == "de")
  }

  test("corpusReportIncremental: the card derived from merged " +
      "sidecars equals the one-shot report on the union, chained " +
      "across three batches") {
    import graft.ops.Curation
    val en1 = "the quick brown fox and the lazy dog now"
    val en2 = "a cat sat on the mat with the hat ok"
    val de1 = "der hund und die katze sind nicht da"
    val rows = Seq[(Long, String, Option[String])](
      (1L, "a", Some(en1)), (2L, "a", Some(en1)),
      (3L, "a", Some(en2)), (4L, "a", Some(de1)), (5L, "a", None),
      (6L, "b", Some(de1)), (7L, "b", Some("")),
      (11L, "a", Some(en2)), (12L, "c", Some(en1)),
      (13L, "b", Some(de1)), (14L, "b", Some("x")),
      (21L, "a", Some("yo")), (22L, "c", Some(de1)), (23L, "c", None))
      .toDF("doc_id", "source", "text")
    val b1 = rows.where($"doc_id" < 10)
    val b2 = rows.where($"doc_id" >= 10 && $"doc_id" < 20)
    val b3 = rows.where($"doc_id" >= 20)
    val s1 = Curation.corpusReportSidecars(b1, "doc_id", "text",
      "source")
    val (r2, s2) = Curation.corpusReportIncremental(b2, s1, "doc_id",
      "text", "source")
    val (r3, _) = Curation.corpusReportIncremental(b3, s2, "doc_id",
      "text", "source")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_docs", "n_empty", "total_chars",
        "chars_p25", "chars_p50", "chars_p75", "distinct_texts",
        "top_lang", "dup_rate", "top_lang_share")
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val want2 = norm(Curation.corpusReport(
      rows.where($"doc_id" < 20), "doc_id", "text", "source"))
    val got2 = norm(r2)
    assert(got2 == want2, s"batch2: $got2 vs $want2")
    val want3 = norm(Curation.corpusReport(rows, "doc_id", "text",
      "source"))
    val got3 = norm(r3)
    assert(got3 == want3, s"batch3: $got3 vs $want3")
  }

  test("domainPercentileFilterIncremental: histogram thresholds equal " +
      "the exact one-shot gate on the union (delta rows), at " +
      "interpolating quantiles, across chained batches, with null " +
      "domains and null scores") {
    import spark.implicits._
    import graft.ops.Curation
    // three domains (one null), varied sizes so q*(n-1) interpolates;
    // a null score rides in domain a (must drop, not poison)
    val rows = Seq[(Long, Option[String], Option[Int])](
      (1L, Some("a"), Some(10)), (2L, Some("a"), Some(20)),
      (3L, Some("a"), Some(30)), (4L, Some("a"), Some(40)),
      (5L, Some("a"), None),
      (6L, Some("b"), Some(5)), (7L, Some("b"), Some(7)),
      (8L, Some("b"), Some(11)), (9L, Some("b"), Some(13)),
      (10L, Some("b"), Some(17)), (11L, Some("b"), Some(19)),
      (12L, None, Some(100)), (13L, None, Some(200)),
      (14L, None, Some(300)),
      // the second batch grows every domain and adds a NEW domain
      (21L, Some("a"), Some(25)), (22L, Some("a"), Some(35)),
      (23L, Some("b"), Some(6)), (24L, Some("b"), Some(23)),
      (25L, None, Some(150)), (26L, Some("c"), Some(1)),
      (27L, Some("c"), Some(2)), (28L, Some("c"), Some(3)),
      // third batch
      (31L, Some("a"), Some(15)), (32L, Some("c"), Some(4)),
      (33L, None, Some(50)))
      .toDF("doc_id", "source", "score")
    for (q <- Seq(0.25, 0.5, 0.6, 0.9)) {
      val b1 = rows.where($"doc_id" < 20)
      val b2 = rows.where($"doc_id" >= 20 && $"doc_id" < 30)
      val b3 = rows.where($"doc_id" >= 30)
      val h1 = Curation.domainScoreHistogram(b1, "source", "score")
      val s2 = Curation.domainPercentileFilterIncremental(
        b2, h1, "source", "score", q)
      val s3 = Curation.domainPercentileFilterIncremental(
        b3, s2.hist, "source", "score", q)
      // each batch's kept set == the one-shot EXACT gate over
      // everything seen so far, restricted to that batch's ids
      val union2 = rows.where($"doc_id" < 30)
      val want2 = Curation.domainPercentileFilter(union2, "source",
        "score", q, exact = true)
        .where($"doc_id" >= 20).select("doc_id")
        .as[Long].collect().toSet
      assert(s2.kept.select("doc_id").as[Long].collect().toSet ==
        want2, s"q=$q batch2")
      val want3 = Curation.domainPercentileFilter(rows, "source",
        "score", q, exact = true)
        .where($"doc_id" >= 30).select("doc_id")
        .as[Long].collect().toSet
      assert(s3.kept.select("doc_id").as[Long].collect().toSet ==
        want3, s"q=$q batch3")
      // the carried histogram stays exact: count preserved per domain
      val histN = s3.hist.agg(sum("cnt")).head().getLong(0)
      assert(histN == rows.where($"score".isNotNull).count())
    }
  }
}
