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

  // SparkContext.setCheckpointDir stores <dir>/<random-UUID> (fully
  // qualified), so getCheckpointDir can never equal the requested dir —
  // comparing against it would re-set (and mkdir a fresh UUID subdir) on
  // EVERY truncate call of an iterative op. Remember what we last set.
  @volatile private var lastSetDir: Option[String] = None

  /** Eagerly materialize `df` with truncated lineage. */
  def truncate(df: DataFrame, dir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val resolved = dir.orElse(spark.conf.getOption(ConfKey))
    resolved match {
      case Some(d) =>
        if (!lastSetDir.contains(d) || sc.getCheckpointDir.isEmpty)
          synchronized {
            if (!lastSetDir.contains(d) || sc.getCheckpointDir.isEmpty) {
              sc.setCheckpointDir(d)
              lastSetDir = Some(d)
            }
          }
        df.checkpoint(eager = true)
      case None if sc.getCheckpointDir.isDefined =>
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
