package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spherical k-means — trains the coarse centroids that
  * [[Similarity.ivfAssign]]/[[Similarity.ivfTopK]] probe. Lloyd iterations:
  * assign every vector to its highest-cosine centroid (broadcast join,
  * deterministic id tie-break), then recompute each centroid as the
  * component-wise mean of its members.
  *
  * Scale shape per iteration: one broadcast join (centroids are k rows) +
  * one (cell, dim) aggregate + one cell aggregate — no driver-side data
  * paths besides the k×dim centroid table itself, which IVF later folds
  * into codegen anyway. Plan growth across iterations is truncated with
  * checkpoints (same pattern as [[Dedup.duplicateClusters]]; pass
  * `checkpointDir` or set `spark.graft.checkpointDir` for RELIABLE
  * checkpoints on a real cluster — see [[Checkpoints.truncate]]).
  *
  * Determinism contract (oracle-checkable): init = the k smallest-id
  * vectors; assignment ties break on centroid id; member sums are exact
  * decimal addition of double-widened components, so means are identical
  * in any engine at any partitioning.
  */
object Clustering {

  /** Train `k` centroids with `iters` Lloyd iterations. Returns
    * (centroid_id, centroid) with `centroid` an array<double>. Cells that
    * lose all members keep their previous centroid. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(k > 0 && iters >= 0, "kmeans: k > 0, iters >= 0")
    // centroid ids are longs (they seed ivfAssign's tie-break); a string id
    // would cast to null and silently merge every cell into one group
    require(df.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType],
      s"kmeans: idCol '$idCol' must be numeric, got " +
        df.schema(idCol).dataType.simpleString)
    val data = df.select(col(idCol).as("__vid"),
      col(vecCol).cast("array<double>").as("__v"))
    // deterministic seed: the k smallest-id vectors
    var cents = Checkpoints.truncate(data.orderBy("__vid").limit(k)
      .select(col("__vid").cast("long").as("centroid_id"),
        col("__v").as("centroid")), checkpointDir)
    for (_ <- 1 to iters) {
      val assigned = Similarity.ivfAssign(
        data.withColumnRenamed("__v", "__vec"), "__vid",
        "__vec", cents.select(col("centroid_id").as("__vid"),
          col("centroid").as("__vec")))
      // component-wise mean via exact decimal sums (partitioning-invariant)
      val byDim = assigned
        .select(col("centroid_id"), posexplode(col("__vec"))
          .as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
      val fresh = byDim
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("m")))), e => e.getField("m")).as("centroid"))
      // empty cells keep their previous centroid
      val prev = cents
      cents = Checkpoints.truncate(cents.select(col("centroid_id"),
          col("centroid").as("__old"))
        .join(fresh, Seq("centroid_id"), "left_outer")
        .select(col("centroid_id"),
          coalesce(col("centroid"), col("__old")).as("centroid")),
        checkpointDir)
      Checkpoints.release(prev) // superseded generation's storage
    }
    cents
  }
}
