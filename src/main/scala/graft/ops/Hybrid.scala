package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-search fusion: combine independent retrieval rankings (lexical
  * BM25, exact/quantized/LSH/IVF vector top-k) into one consensus ranking
  * with reciprocal-rank fusion — score(p) = Σ_r 1/(k0 + rank_r(p)).
  *
  * RRF needs only ranks, so any mix of score scales fuses cleanly. Plan
  * shape: union of the (already tiny, top-k-bounded) rankings, one hash
  * aggregate keyed by (query, candidate), one per-query window — cost is
  * O(Σ|rankings|), independent of corpus size.
  */
object Hybrid {

  /** Fuse rankings shaped (query_id, neighbor_id, rank) and return the top
    * `k` per query as (query_id, neighbor_id, score, fused_rank). `k0` is
    * the standard RRF damping constant (60 in the original paper).
    *
    * The score sum is decimal-exact (each 1/(k0+rank) term is a
    * deterministic double; exact decimal addition makes the total
    * independent of aggregation order). Ties break on neighbor id. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val all = rankings.map(_.select("query_id", "neighbor_id", "rank"))
      .reduce(_.unionByName(_))
    val fused = all.groupBy("query_id", "neighbor_id")
      .agg(sum((lit(1.0) / (col("rank") + lit(k0))).cast("decimal(28,12)"))
        .cast("double").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .where(col("fused_rank") <= k)
  }
}
