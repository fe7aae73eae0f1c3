package graft.ops

import org.apache.spark.sql.DataFrame

/** Partitioning helpers shared by the ANN / dedup entry points.
  *
  * These operators broadcast the small (query) side of every join, so the
  * big-corpus scan is the ONLY stage that can shuffle. Historically they
  * did an unconditional `.repartition(defaultParallelism)` to fix the
  * single-split-parquet case seen at small scale factors — but at 100 TB
  * that is an avoidable full shuffle of the big side: a large parquet
  * dataset already arrives in thousands of splits. The helper here keeps
  * the small-file fix while leaving an already-parallel scan untouched.
  */
object Partitioning {

  /** Repartition `df` to the session's default parallelism ONLY when its
    * physical partition count is below it; otherwise return `df` unchanged
    * (no Exchange in the plan). The partition count is read from the
    * planned RDD without running a job.
    */
  def ensureMinPartitions(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val current = df.rdd.getNumPartitions
    if (current < par) df.repartition(par) else df
  }
}
