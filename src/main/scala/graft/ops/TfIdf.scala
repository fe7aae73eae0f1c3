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
}
