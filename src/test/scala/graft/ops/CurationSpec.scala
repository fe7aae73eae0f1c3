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
}
