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
  // EVERY truncate call of an iterative op. Remember what we last set,
  // PER SparkContext (weakly keyed — a stopped context must not pin the
  // entry): the checkpoint dir is context-global state, so tracking it in
  // a process-global would make two sessions on different contexts
  // invalidate each other's record. Two sessions on the SAME context
  // using different dirs still thrash by construction (one context, one
  // dir) — that use is unsupported; configure one dir per context.
  private val lastSetDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  /** Eagerly materialize `df` with truncated lineage. */
  def truncate(df: DataFrame, dir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val resolved = dir.orElse(spark.conf.getOption(ConfKey))
    resolved match {
      case Some(d) =>
        if (lastSetDir.get(sc) != d || sc.getCheckpointDir.isEmpty)
          lastSetDir.synchronized {
            if (lastSetDir.get(sc) != d || sc.getCheckpointDir.isEmpty) {
              sc.setCheckpointDir(d)
              lastSetDir.put(sc, d)
            }
          }
        df.checkpoint(eager = true)
      case None if sc.getCheckpointDir.isDefined =>
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Release the storage behind a frame [[truncate]] returned, once a
    * LATER generation has superseded it. Without this every iteration of
    * an iterative op leaks one localCheckpoint generation into executor
    * storage for the life of the session. Reliable (directory) checkpoints
    * have StorageLevel NONE here — their files are GC'd by the
    * ContextCleaner — so this is a no-op for them. Never call it on the
    * generation you are about to return. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
