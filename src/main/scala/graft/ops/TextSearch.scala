package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text relevance scoring — the classic retrieval ranking for a
  * keyword query over a document corpus (the retrieval-side counterpart to
  * [[TfIdf]] and the usual lexical leg of hybrid lexical+vector search).
  *
  * Plan shape at 100 TB: the token explode is filtered to the query's terms
  * IMMEDIATELY (the filter sits inside the same projection as the explode,
  * so non-query tokens never reach the aggregate), document length comes
  * from the same scan, corpus stats (N, avgdl) are a broadcast one-row
  * aggregate over a column-pruned stat scan, and per-term document
  * frequency is a window over `term` on the (small) hit set — no self-join,
  * no second pass over the hits. Two corpus scans total (hits + stats),
  * two small shuffles (hit aggregate, per-doc score aggregate).
  */
object TextSearch {

  /** Score every document containing at least one of `terms` with
    * BM25(k1, b); returns (idCol, score, matched) ranked by score desc with
    * id-asc tie-break, top `k` (0 = all matches).
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard non-negative
    * variant); score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, k: Int = 0): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val toks = TextFunctions.tokens(col(textCol))
    // one scan: doc length + the query-term hits only
    val hits = df.select(col(idCol), size(toks).as("dl"),
        explode(filter(toks, t => terms.map(q => t === lit(q))
          .reduce(_ || _))).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // corpus stats: one broadcast row (computed in-plan, no driver action)
    val stats = df.agg(count(lit(1)).as("n_docs"),
      avg(size(toks).cast("double")).as("avgdl"))
    // per-term document frequency: hits is unique per (doc, term), so a
    // window count over `term` IS df — no self-join, no hits recompute
    val scored = hits
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") /
          col("avgdl"))))
      .groupBy(idCol)
      // decimal-cast before SUM: per-term weights are deterministic doubles,
      // and exact decimal addition makes the score independent of partial-
      // aggregation order (engine- and partitioning-reproducible)
      .agg(sum(col("w").cast("decimal(28,12)")).cast("double").as("score"),
        count(lit(1)).as("matched"))
    val ranked = scored.orderBy(col("score").desc, col(idCol).asc)
    if (k > 0) ranked.limit(k) else ranked
  }
}
