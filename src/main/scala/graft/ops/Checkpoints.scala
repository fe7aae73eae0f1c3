package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative ops (label propagation, Lloyd
  * iterations, `$graphLookup` BFS). Every iteration must cut the logical
  * plan or analysis time grows super-linearly; WHERE the cut lands is a
  * deployment choice:
  *
  *   - reliable `checkpoint` into a fault-tolerant dir (HDFS/S3) — the
  *     cluster form: survives executor loss, bounded by stable storage;
  *   - eager `localCheckpoint` — executor-storage replicated, fine for
  *     local mode and tests, NOT safe under executor churn.
  *
  * Resolution order: explicit dir parameter > `spark.graft.checkpointDir`
  * session conf > an already-configured SparkContext checkpoint dir >
  * localCheckpoint fallback.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  /** Eagerly materialize `df` with truncated lineage. */
  def truncate(df: DataFrame, dir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val resolved = dir.orElse(spark.conf.getOption(ConfKey))
    resolved match {
      case Some(d) =>
        if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
        df.checkpoint(eager = true)
      case None if sc.getCheckpointDir.isDefined =>
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
