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
}
