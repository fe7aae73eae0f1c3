package graft.apm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Command/operation monitoring — reference /root/reference/apm/:
  * events keyed by (db, collection, command) accumulate success/fail counts,
  * total duration, and per-tag counters per rotation window
  * (apm/event.go:12-106, apm/monitor.go:14-171); filter config whitelists
  * commands/dbs/namespaces (apm/config.go:5-111); loggingMonitor rotates on
  * a ticker (apm/wrappers.go:11-40).
  *
  * Spark-first shape: a `QueryExecutionListener` accumulates per-(tables,
  * operation) metrics; `rotate()` swaps the window. The declarative rollup
  * over an events *table* is `groupBy(keys).agg(...)` — see [[Apm.rollup]].
  */
final case class EventKey(db: String, collection: String, command: String)
final case class EventRecord(succeeded: Long, failed: Long, durationNs: Long,
    tags: Map[String, Long] = Map.empty) {
  def +(other: EventRecord): EventRecord = EventRecord(
    succeeded + other.succeeded, failed + other.failed,
    durationNs + other.durationNs,
    other.tags.foldLeft(tags) { case (m, (t, n)) =>
      m.updated(t, m.getOrElse(t, 0L) + n)
    })
}

/** Filter semantics — reference apm/config.go:57-90 (`shouldTrack`:
  * command allow-list, db allow-list, namespace allow-list last). Tags
  * (apm/config.go:28-33): a counter is kept per tag seen on an operation,
  * but only for tags in `tags` — or every tag when `allTags` is set. */
final case class MonitorConfig(
    commands: Set[String] = Set.empty,
    databases: Set[String] = Set.empty,
    namespaces: Set[(String, String)] = Set.empty,
    tags: Set[String] = Set.empty,
    allTags: Boolean = false) {
  def shouldTrack(k: EventKey): Boolean = {
    if (commands.nonEmpty && !commands.contains(k.command)) return false
    if (databases.nonEmpty && !databases.contains(k.db)) return false
    if (namespaces.nonEmpty && !namespaces.contains((k.db, k.collection)))
      return false
    true
  }
  /** Which of the operation's tags get counted — reference addTags
    * (apm/monitor.go:140-150). */
  def trackedTags(opTags: Seq[String]): Seq[String] =
    if (allTags) opTags else opTags.filter(tags.contains)
}

/** Ambient operation tags — the Spark analog of the reference's
  * context-carried tags (apm/context.go:12-22). Scoped per thread;
  * synchronous record paths (the command tracer, direct `record` calls)
  * observe them. Inheritable so child task-submission threads keep the
  * caller's tags. */
object TagContext {
  private val tl = new InheritableThreadLocal[Seq[String]] {
    override def initialValue(): Seq[String] = Nil
  }
  def current: Seq[String] = tl.get()
  /** SetTags-scoped — reference apm/context.go:12-14. */
  def withTags[T](tags: String*)(body: => T): T = {
    val prev = tl.get()
    tl.set(tags.toSeq)
    try body finally tl.set(prev)
  }
}

final class BasicMonitor(config: MonitorConfig = MonitorConfig()) {
  // One lock around record/rotate, exactly like the reference's currentLock
  // (apm/monitor.go:152-171): a lock-free swap narrows but cannot close the
  // window where an in-flight record lands in neither window.
  private val lock = new Object
  private var current = scala.collection.mutable.Map.empty[EventKey, EventRecord]

  /** Record one operation outcome. Tags explicitly passed are merged with
    * the ambient [[TagContext]] (the reference reads ctx tags on every
    * Succeeded/Failed event, apm/monitor.go:109-137). */
  def record(k: EventKey, ok: Boolean, durationNs: Long,
      tags: Seq[String] = Nil): Unit =
    if (config.shouldTrack(k)) {
      val counted = config.trackedTags((tags ++ TagContext.current).distinct)
      val rec = EventRecord(if (ok) 1 else 0, if (ok) 0 else 1, durationNs,
        counted.map(_ -> 1L).toMap)
      lock.synchronized {
        current.updateWith(k) {
          case Some(prev) => Some(prev + rec)
          case None => Some(rec)
        }
      }
    }

  /** Swap the accumulation window — reference Rotate()
    * apm/monitor.go:152-171. Pre-populates the configured key cross-product
    * with zero records (apm/config.go:92-111 PopulateEvents). */
  def rotate(): Map[EventKey, EventRecord] = {
    val snapshot = lock.synchronized {
      val s = current
      current = scala.collection.mutable.Map.empty
      s
    }
    val prepopulated =
      for { c <- config.commands; (d, coll) <- config.namespaces }
        yield EventKey(d, coll, c) -> EventRecord(0, 0, 0)
    prepopulated.toMap ++ snapshot
  }
}

/** Attaches a BasicMonitor to a SparkSession: every query execution is
  * recorded keyed by (scanned tables, action name) — the DriverAPM analog
  * (apm/interface.go:10-21). Table identity comes from the scan relations
  * (catalog identifier, or the file-index root paths for path-based reads),
  * so two tables roll up under two keys — the reference's per-namespace
  * events (apm/event.go:12-19). */
final class SparkApmListener(monitor: BasicMonitor)
    extends QueryExecutionListener {
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, LocalRelation, Range}
  import org.apache.spark.sql.execution.datasources.{LogicalRelation, HadoopFsRelation}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  private def leafName(p: LogicalPlan): String = p match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.unquotedString).getOrElse(
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
              .distinct.sorted.mkString(",")
          case _ => lr.relation.toString
        })
    case dsv2: DataSourceV2Relation => dsv2.table.name()
    case _: LocalRelation => "local"
    case _: Range => "range"
    case other => other.nodeName
  }

  private def key(qe: QueryExecution, funcName: String): EventKey = {
    val tables = qe.logical.collectLeaves().map(leafName).distinct
      .sorted.mkString(",")
    EventKey("spark", tables, funcName)
  }
  /** Deriving the key touches the plan; on a FAILED execution that can
    * re-raise the original error (e.g. accessing plans of a query whose
    * analysis failed), and a throwing listener makes ExecutionListenerBus
    * log an ERROR for every monitored failure. A monitor must never turn
    * one failure into two: fall back to a plan-free key and always record. */
  private def safeKey(qe: QueryExecution, funcName: String): EventKey =
    try key(qe, funcName)
    catch { case scala.util.control.NonFatal(_) =>
      EventKey("spark", "<unresolved>", funcName)
    }
  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    monitor.record(safeKey(qe, funcName), ok = true, durationNs)
  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    monitor.record(safeKey(qe, funcName), ok = false, 0L)
}

/** Periodic rotate-and-log — reference loggingMonitor
  * (apm/wrappers.go:11-40): a daemon ticker that rotates the window and
  * hands it to `log` every `intervalMs`. */
final class LoggingMonitor(monitor: BasicMonitor, intervalMs: Long)(
    log: Map[EventKey, EventRecord] => Unit) extends AutoCloseable {
  private val exec = java.util.concurrent.Executors
    .newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-apm-logger"); t.setDaemon(true); t
    })
  exec.scheduleAtFixedRate(() => log(monitor.rotate()),
    intervalMs, intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)
  override def close(): Unit = exec.shutdownNow()
}

object Apm {
  def install(spark: SparkSession,
      config: MonitorConfig = MonitorConfig()): BasicMonitor = {
    val m = new BasicMonitor(config)
    spark.listenerManager.register(new SparkApmListener(m))
    m
  }

  /** Declarative event-window rollup — the reference's accumulate+rollup
    * (apm/monitor.go:100-150, apm/event.go:29-106) expressed as one
    * map-side-combining aggregation: partial aggregation happens per
    * partition before the shuffle, so it scales with distinct keys, not
    * rows. */
  def rollup(events: DataFrame, keys: Seq[String], okCol: String,
      durCol: String): DataFrame =
    events.groupBy(keys.map(col): _*).agg(
      sum(when(col(okCol), 1L).otherwise(0L)).as("succeeded"),
      sum(when(col(okCol), 0L).otherwise(1L)).as("failed"),
      sum(col(durCol)).as("duration_ns"))
}
