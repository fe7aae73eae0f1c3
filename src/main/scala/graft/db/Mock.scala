package graft.db

import org.apache.spark.sql.DataFrame
import graft.model.Namespace
import graft.query.QueryCompiler
import org.apache.spark.sql.functions.col

/** Injectable-error collection fake — parity with the reference's mock
  * client (mock/client.go:14-163), whose settable error fields are its
  * dominant test idiom. Downstream code that programs against
  * [[CollectionApi]] can substitute this to exercise error paths without
  * any filesystem state.
  *
  *   - `data` is the collection content (a mutable in-memory DataFrame;
  *     `insert` appends to it);
  *   - `failOn(op)` makes that operation throw the given error
  *     ("find", "findId", "count", "estimatedCount", "insert", "pipe");
  *   - `calls` records every operation in order (assertion surface);
  *   - an optional monitor wires the same started/succeeded/failed
  *     command events a real session emits, so APM error paths are
  *     testable against injected failures too.
  */
final class MockCollection(
    initial: DataFrame,
    val ns: Namespace = Namespace("mockdb", "mock"),
    monitor: Option[graft.apm.OtelMonitor] = None) extends CollectionApi {

  private val tracer =
    monitor.map(m => new graft.apm.CommandTracer(m, "mock:0[mock]"))

  @volatile var data: DataFrame = initial
  @volatile var failOn: Map[String, Throwable] = Map.empty
  private val callLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def calls: Seq[String] = {
    val it = callLog.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def traced[T](op: String, cmd: Map[String, Any])(body: => T): T = {
    callLog.add(op)
    def run: T = { failOn.get(op).foreach(e => throw e); body }
    tracer match {
      case Some(t) => t.command(ns.db, op, cmd)(run)(_ => 0L)
      case None => run
    }
  }

  def df: DataFrame = data

  def find(query: Map[String, Any] = Map.empty): GraftQuery =
    traced("find", Map("find" -> ns.collection, "filter" -> query))(
      new GraftQuery(data, QueryCompiler.compile(query)))

  def findId(id: Any, idCol: String = "_id"): GraftQuery =
    traced("findId", Map("find" -> ns.collection, "filter" ->
      Map(idCol -> id)))(
      new GraftQuery(data, col(idCol) === QueryCompiler.toLit(id)))

  def count(): Long =
    traced("count", Map("count" -> ns.collection))(data.count())

  def estimatedCount(): Long =
    traced("estimatedCount", Map("count" -> ns.collection))(data.count())

  def insert(rows: DataFrame): Unit =
    traced("insert", Map("insert" -> ns.collection)) {
      data = data.unionByName(rows, allowMissingColumns = true)
    }

  /** Transform stages only — a trailing `$merge`/`$out` needs a real
    * table sink and `$lookup` a sibling resolver; the mock rejects both
    * with a clear message. */
  def pipe(pipeline: Seq[Map[String, Any]]): DataFrame =
    traced("pipe", Map("aggregate" -> ns.collection)) {
      graft.pipeline.PipelineCompiler.compile(pipeline, tables = other =>
        throw new IllegalArgumentException(
          s"MockCollection has no sibling collection '$other'"))(data)
    }
}
