package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the classic quality-filter
  * signal for training-data curation (CCNet/Gopher-style: drop or
  * down-weight documents whose LM perplexity is an outlier). A real
  * deployment scores against a reference-corpus model; `train` fits the
  * model FROM a (possibly different) corpus, so both self-scoring and
  * reference-scoring are one call each.
  *
  * Plan shape (the 100 TB concern): the model is two DISTRIBUTED count
  * tables — bigram counts and unigram (context) counts — built by one
  * explode + hash aggregate each (map-side partial combine applies);
  * nothing is ever collected to the driver. Scoring explodes the scored
  * corpus once and equi-joins its bigrams against the model tables —
  * bucketed hash joins keyed by the n-gram, no quadratic work anywhere;
  * AQE broadcasts the model side when the vocabulary is small. The
  * vocabulary size (for smoothing) rides along as one broadcast 1-row
  * aggregate inside the same plan.
  */
object LanguageModel {

  /** Word-bigram counts with a sentence-start marker: returns the pair of
    * frames (bigramCounts(w1, w2, c12), contextCounts(w1, c1)). */
  def train(corpus: DataFrame, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = TextFunctions.tokens(col(textCol))
    // prepend the start marker so the first real token is conditioned too
    val padded = concat(array(lit("<s>")), toks)
    val bigrams = corpus
      .select(explode(zip_with(
        slice(padded, lit(1), greatest(size(padded) - 1, lit(0))),
        slice(padded, lit(2), greatest(size(padded) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val bigramCounts = bigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    val contextCounts = bigrams.groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    (bigramCounts, contextCounts)
  }

  /** Score every document in `df` against the model trained on
    * `reference` (pass `df` itself for self-scoring): add-k smoothed
    * per-token mean negative log2 probability (`bits_per_token`) and
    * `perplexity` = 2^bits. Unseen bigrams/contexts fall back to the
    * smoothing floor k/(k·V) rather than -inf, so out-of-domain text
    * scores high instead of breaking. Documents with no tokens have no
    * bigrams and are absent from the output (nothing to score). */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"perplexity: smoothing k must be positive, got $k")
    val (bigramCounts, contextCounts) = train(reference, refTextCol)
    // vocabulary size for the smoothing denominator: one broadcast row
    val vocab = bigramCounts.agg(
      count_distinct(col("w2")).as("__lm_v"))
    val toks = TextFunctions.tokens(col(textCol))
    val padded = concat(array(lit("<s>")), toks)
    val docBigrams = df
      .select(col(idCol), explode(zip_with(
        slice(padded, lit(1), greatest(size(padded) - 1, lit(0))),
        slice(padded, lit(2), greatest(size(padded) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))
    val joined = docBigrams
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(contextCounts, Seq("w1"), "left")
      .join(broadcast(vocab))
    val logp = log2((coalesce(col("c12"), lit(0L)) + k) /
      (coalesce(col("c1"), lit(0L)) + lit(k) * col("__lm_v")))
    joined.groupBy(idCol)
      // decimal-cast before SUM: exact addition makes the score
      // independent of partial-aggregation order (engine-reproducible)
      .agg(
        (sum((-logp).cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("bits_per_token"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("perplexity", pow(lit(2.0), col("bits_per_token")))
  }
}
