package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-level Naive-Bayes text classifier — the workhorse quality filter
  * of large-corpus curation (the fastText-classifier role in CCNet/LLaMA
  * style pipelines: label a small trusted slice positive, everything else
  * negative, keep documents the model scores positive). Training and
  * inference are both expressed in one declarative plan, so a 100 TB corpus
  * can be labeled, fit, and scored in a single job.
  *
  * Plan shape (the 100 TB concern): the model is ONE distributed token
  * log-odds table built by explode + hash aggregate (map-side partial
  * combine applies) — never collected to the driver. Scoring explodes the
  * scored corpus once and equi-joins tokens against the model table —
  * bucketed hash join keyed by token, no quadratic work; AQE broadcasts
  * the model side when the vocabulary is small. The class prior rides
  * along as one broadcast 1-row aggregate inside the same plan.
  */
object Classifier {

  /** Per-token add-k smoothed log-odds table from a labeled corpus:
    * (token, c_pos, c_neg, log_odds) with
    * log_odds = ln((c_pos + k) / (c_neg + k)). `minCount` drops tokens
    * whose total count is below the floor (vocabulary pruning — rare
    * tokens carry noise, and the table shrinks before the scoring join).
    */
  def trainLogOdds(labeled: DataFrame, textCol: String, posLabel: Column,
      k: Double = 1.0, minCount: Long = 1L): DataFrame = {
    require(k > 0, s"trainLogOdds: smoothing k must be positive, got $k")
    labeled
      .select(posLabel.as("__pos"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("c_neg"))
      .where(col("c_pos") + col("c_neg") >= minCount)
      .withColumn("log_odds",
        log((col("c_pos") + k) / (col("c_neg") + k)))
  }

  /** Score `df` against a model trained on `labeled` (pass `df` itself
    * with a heuristic label column for self-training): per document,
    * score = class prior + Σ token log-odds, `predicted` = score > 0.
    * Unseen tokens contribute ln(k/k) = 0 via the smoothing floor (left
    * join + coalesce), so out-of-vocabulary text degrades gracefully.
    * Documents with no tokens have nothing to score and are absent from
    * the output (same contract as LanguageModel.perplexity). */
  def naiveBayesScore(df: DataFrame, idCol: String, textCol: String,
      labeled: DataFrame, labeledTextCol: String, posLabel: Column,
      k: Double = 1.0, minCount: Long = 1L): DataFrame =
    scoreAgainst(df, idCol, textCol,
      trainLogOdds(labeled, labeledTextCol, posLabel, k, minCount),
      priorFrame(labeled, posLabel))

  /** Document-level class prior as a 1-row frame (broadcast into the
    * scoring plan): ln((n_pos + 1) / (n_neg + 1)). An empty labeled
    * frame would make sum(...) null and silently null every downstream
    * score — coalesce to 0 so the prior degrades to ln(1/1) = 0. */
  def priorFrame(labeled: DataFrame, posLabel: Column): DataFrame =
    labeled.agg(
      log((coalesce(sum(when(posLabel, 1L).otherwise(0L)), lit(0L)) + 1.0) /
        (coalesce(sum(when(posLabel, 0L).otherwise(1L)), lit(0L)) + 1.0))
        .as("__nb_prior"))

  /** Score against an ALREADY-trained model table and prior frame — the
    * reusable half of `naiveBayesScore`, and the per-micro-batch work of
    * streaming quality filtering (train once on a batch corpus, join
    * each arriving batch against the static model). */
  def scoreAgainst(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, prior: DataFrame): DataFrame =
    df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .join(model.select(col("w"), col("log_odds")), Seq("w"), "left")
      .join(broadcast(prior))
      .groupBy(idCol)
      // decimal-cast before SUM: exact addition makes the score
      // independent of partial-aggregation order (engine-reproducible)
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(coalesce(col("log_odds"), lit(0.0))
          .cast("decimal(28,12)")).cast("double") +
          first(col("__nb_prior"))).as("score"))
      .withColumn("predicted", col("score") > 0)

  /** Self-trained form: the heuristic `posLabel` column labels `df`, the
    * model fits on it, and every document is scored against that model. */
  def naiveBayes(df: DataFrame, idCol: String, textCol: String,
      posLabel: Column, k: Double = 1.0, minCount: Long = 1L): DataFrame =
    naiveBayesScore(df, idCol, textCol, df, textCol, posLabel, k, minCount)
}
