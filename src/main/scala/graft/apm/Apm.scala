package graft.apm

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Command/operation monitoring — reference /root/reference/apm/:
  * events keyed by (db, collection, command) accumulate success/fail counts
  * and total duration per rotation window (apm/event.go:12-106,
  * apm/monitor.go:14-171); filter config whitelists commands/dbs/namespaces
  * (apm/config.go:5-111); loggingMonitor rotates on a ticker
  * (apm/wrappers.go:11-40).
  *
  * Spark-first shape: a `QueryExecutionListener` accumulates per-(tables,
  * operation) metrics in a concurrent map; `rotate()` swaps the window.
  * The declarative rollup over an events *table* is `groupBy(keys).agg(...)`
  * — see [[Apm.rollup]].
  */
final case class EventKey(db: String, collection: String, command: String)
final case class EventRecord(succeeded: Long, failed: Long, durationNs: Long) {
  def +(other: EventRecord): EventRecord = EventRecord(
    succeeded + other.succeeded, failed + other.failed,
    durationNs + other.durationNs)
}

/** Filter semantics — reference apm/config.go:57-90 (`shouldTrack`:
  * command allow-list, db allow-list, namespace allow-list last). */
final case class MonitorConfig(
    commands: Set[String] = Set.empty,
    databases: Set[String] = Set.empty,
    namespaces: Set[(String, String)] = Set.empty,
    allTags: Boolean = false) {
  def shouldTrack(k: EventKey): Boolean = {
    if (commands.nonEmpty && !commands.contains(k.command)) return false
    if (databases.nonEmpty && !databases.contains(k.db)) return false
    if (namespaces.nonEmpty && !namespaces.contains((k.db, k.collection)))
      return false
    true
  }
}

final class BasicMonitor(config: MonitorConfig = MonitorConfig()) {
  // the live window is swapped atomically on rotate (the reference holds a
  // mutex, monitor.go:152-171); a copy-then-clear would drop events recorded
  // between the copy and the clear
  private val current = new java.util.concurrent.atomic.AtomicReference(
    new ConcurrentHashMap[EventKey, EventRecord]())

  def record(k: EventKey, ok: Boolean, durationNs: Long): Unit =
    if (config.shouldTrack(k)) current.get().merge(k,
      EventRecord(if (ok) 1 else 0, if (ok) 0 else 1, durationNs), _ + _)

  /** Swap the accumulation window — reference Rotate()
    * apm/monitor.go:152-171. Pre-populates the configured key cross-product
    * with zero records (apm/config.go:92-111 PopulateEvents). */
  def rotate(): Map[EventKey, EventRecord] = {
    val snapshot =
      current.getAndSet(new ConcurrentHashMap[EventKey, EventRecord]())
    val prepopulated =
      for { c <- config.commands; (d, coll) <- config.namespaces }
        yield EventKey(d, coll, c) -> EventRecord(0, 0, 0)
    import scala.jdk.CollectionConverters._
    prepopulated.toMap ++ snapshot.asScala.toMap
  }
}

/** Attaches a BasicMonitor to a SparkSession: every query execution is
  * recorded keyed by (scanned tables, action name) — the DriverAPM analog
  * (apm/interface.go:10-21). */
final class SparkApmListener(monitor: BasicMonitor)
    extends QueryExecutionListener {
  private def key(qe: QueryExecution, funcName: String): EventKey = {
    val tables = qe.logical.collectLeaves().map(_.nodeName).distinct
      .sorted.mkString(",")
    EventKey("spark", tables, funcName)
  }
  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    monitor.record(key(qe, funcName), ok = true, durationNs)
  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    monitor.record(key(qe, funcName), ok = false, 0L)
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
