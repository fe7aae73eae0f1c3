package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — keyword extraction /
  * quality features for training-data curation.
  *
  * Plan shape (the 100 TB concern): ONE explode feeding ONE (doc, term)
  * hash aggregate (partial map-side combine applies), then document
  * frequency via a window over `term` — a second shuffle keyed by term, no
  * self-join and no second scan of the corpus. The corpus size N is computed
  * in the same plan via a broadcast one-row aggregate, not a driver action.
  */
object TfIdf {

  /** Per-(doc, term) scores: tf (term count in doc), df (docs containing
    * term), and smooth tfidf = tf * (ln((N+1)/(df+1)) + 1). */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is unique per (doc, term), so rows-per-term IS document frequency
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy("term")))
    val total = df.agg(count(lit(1)).as("n_docs"))
    withDf.join(broadcast(total))
      .withColumn("tfidf", col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0))
      .drop("n_docs")
  }

  /** Top `n` terms per document by tfidf (deterministic: score desc, term
    * asc tie-break). Output: (idCol, term, tf, df, tfidf, rank). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame = {
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidf(df, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
  }

  /** TF-IDF for a DELTA batch of NEW documents under the UNION
    * corpus's statistics, from a saved postings index
    * ([[TextSearch.bm25Index]] — one store format serves retrieval
    * and term weighting): per-term document frequency is the saved
    * postings' per-term row count (a narrow columnar aggregate over
    * the term column — corpus TEXT is never re-read) plus the
    * delta's own contribution, and N is the stats sidecar's count
    * plus the delta's. Equal to [[tfidf]] on the union restricted to
    * the delta's documents, under the append-only contract (delta ids
    * disjoint from indexed ids — an id in both would double-count
    * df). Per-batch cost: delta-sized tokenize + a vocab-bounded
    * aggregate, independent of corpus text size. */
  def tfidfPrecomputed(newDf: DataFrame, index: TextSearch.Bm25Index,
      idCol: String, textCol: String): DataFrame = {
    val deltaTf = newDf
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val deltaDf = deltaTf.groupBy("term")
      .agg(count(lit(1)).as("__df_new"))
    val refDf = index.postings.groupBy("term")
      .agg(count(lit(1)).as("__df_ref"))
    val dfAll = deltaDf.join(refDf, Seq("term"), "left")
      .select(col("term"),
        (col("__df_new") + coalesce(col("__df_ref"), lit(0L)))
          .as("df"))
    val totals = index.stats.select(col("n_docs").as("__n_ref"))
      .join(newDf.agg(count(lit(1)).as("__n_new")))
    deltaTf.join(dfAll, "term")
      .join(broadcast(totals))
      .withColumn("tfidf", col("tf") *
        (log((col("__n_ref") + col("__n_new") + 1).cast("double") /
          (col("df") + 1)) + 1.0))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** [[topTerms]] for a delta batch from the saved index — top `n`
    * terms per NEW document under union statistics, same
    * deterministic tie-break. */
  def topTermsPrecomputed(newDf: DataFrame,
      index: TextSearch.Bm25Index, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidfPrecomputed(newDf, index, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
  }
}
