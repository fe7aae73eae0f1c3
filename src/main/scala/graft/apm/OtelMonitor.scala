package graft.apm

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Command-tracing monitor — reference apm/otel_monitor.go (the OTel
  * mongo-driver CommandMonitor, ~550 LoC): one client span per command
  * keyed (connectionID, requestID), semconv-style attributes, the full and
  * value-stripped `db.statement`, per-command dissectors that cut the
  * statement down to its interesting section, peer info parsed from the
  * connection id, and a caller stack trace with driver frames elided.
  *
  * The OpenTelemetry SDK is not a dependency of this build, so the span
  * surface here is a minimal structural stand-in ([[Span]] /
  * [[InMemoryTracer]]) carrying exactly the data the reference puts on its
  * spans; an adapter to a real `io.opentelemetry` tracer is a 1:1 mapping
  * of `start/setAttribute/setStatus/end`.
  */
final case class SpanKey(connectionId: String, requestId: Long)

/** Mirrors mongo-driver event.CommandStartedEvent (the fields the reference
  * reads: otel_monitor.go:138-176). The command document is the engine's
  * native Map form. */
final case class CommandStartedEvent(
    connectionId: String,
    requestId: Long,
    commandName: String,
    databaseName: String,
    command: Map[String, Any])

final case class CommandSucceededEvent(
    connectionId: String, requestId: Long, commandName: String,
    replyBytes: Long)

final case class CommandFailedEvent(
    connectionId: String, requestId: Long, commandName: String,
    failure: String)

sealed trait SpanStatus
object SpanStatus {
  case object Unset extends SpanStatus
  case object Ok extends SpanStatus
  final case class Error(description: String) extends SpanStatus
}

/** A client span — the subset of the OTel span surface the reference
  * monitor uses (start attributes, late attributes, status, end). */
final class Span private[apm] (val name: String, startAttrs: Seq[(String, Any)]) {
  private val attrs = collection.mutable.LinkedHashMap[String, Any](startAttrs: _*)
  @volatile var status: SpanStatus = SpanStatus.Unset
  @volatile private var ended = false
  val startNanos: Long = System.nanoTime()
  @volatile var endNanos: Long = -1L

  def setAttribute(key: String, value: Any): Unit =
    synchronized { attrs(key) = value }
  def setStatus(s: SpanStatus): Unit = status = s
  def end(): Unit = if (!ended) { ended = true; endNanos = System.nanoTime() }
  def isEnded: Boolean = ended
  def attributes: Map[String, Any] = synchronized { attrs.toMap }
}

/** Collects finished spans — the test-exporter shape. */
final class InMemoryTracer {
  private val spans = new java.util.concurrent.ConcurrentLinkedQueue[Span]()
  def start(name: String, attrs: Seq[(String, Any)]): Span = {
    val s = new Span(name, attrs); spans.add(s); s
  }
  def all: Seq[Span] = { import scala.jdk.CollectionConverters._
    spans.asScala.toSeq }
  def finished: Seq[Span] = all.filter(_.isEnded)
  def clear(): Unit = spans.clear()
}

/** The monitor proper — reference monitor.Started/Succeeded/Failed
  * (otel_monitor.go:138-210).
  *
  * @param commandAttributeDisabled when true (the reference's default,
  *        newConfig otel_monitor.go:66-71) no `db.statement` attributes are
  *        emitted; enable to get both the full and stripped statements.
  * @param commandTransformer pre-filter for the command before statement
  *        extraction; returning None suppresses the statement attributes
  *        (CommandTransformer, otel_monitor.go:114-127).
  */
final class OtelMonitor(
    val tracer: InMemoryTracer = new InMemoryTracer,
    commandAttributeDisabled: Boolean = true,
    commandTransformer: Map[String, Any] => Option[Map[String, Any]] =
      m => Some(m)) {
  import OtelMonitor._

  private val spans = new ConcurrentHashMap[SpanKey, Span]()

  /** reference Started (otel_monitor.go:138-176): span name
    * `[collection.]command`, semconv attributes, optional statements. */
  def started(evt: CommandStartedEvent): Unit = {
    val (hostname, port) = peerInfo(evt.connectionId)
    var attrs = Seq[(String, Any)](
      "db.system" -> "mongodb",
      "db.operation" -> evt.commandName,
      "db.name" -> evt.databaseName,
      "net.peer.name" -> hostname,
      "net.peer.port" -> port,
      "net.transport" -> "ip_tcp",
      "code.stacktrace" -> stackTrace())
    if (!commandAttributeDisabled)
      attrs ++= statementAttributes(evt.commandName, evt.command)
    val collection = extractCollection(evt.commandName, evt.command)
    collection.foreach(c => attrs :+= "db.mongodb.collection" -> c)
    val spanName = collection.map(_ + ".").getOrElse("") + evt.commandName
    spans.put(SpanKey(evt.connectionId, evt.requestId),
      tracer.start(spanName, attrs))
  }

  /** reference Succeeded (otel_monitor.go:179-186): reply size, end. */
  def succeeded(evt: CommandSucceededEvent): Unit =
    takeSpan(evt.connectionId, evt.requestId).foreach { span =>
      span.setAttribute("db.response_bytes", evt.replyBytes)
      span.end()
    }

  /** reference Failed (otel_monitor.go:188-195): error status, end. */
  def failed(evt: CommandFailedEvent): Unit =
    takeSpan(evt.connectionId, evt.requestId).foreach { span =>
      span.setStatus(SpanStatus.Error(evt.failure))
      span.end()
    }

  private def takeSpan(connId: String, reqId: Long): Option[Span] =
    Option(spans.remove(SpanKey(connId, reqId)))

  /** Full + stripped db.statement — reference dbStatementAttributes
    * (otel_monitor.go:212-249). */
  private def statementAttributes(commandName: String,
      command: Map[String, Any]): Seq[(String, Any)] =
    commandTransformer(command).toSeq.flatMap { cmd =>
      val section = operationSection(commandName, cmd)
      val full = formatStatement(section, stripped = false)
      val strippedStmt = formatStatement(section, stripped = true)
      (if (full.nonEmpty) Seq("db.statement" -> full) else Nil) ++
        (if (strippedStmt.nonEmpty)
          Seq("db.statement.stripped" -> strippedStmt) else Nil)
    }
}

object OtelMonitor {

  /** Frames belonging to the "driver" (this library + Spark + the JVM
    * harness) are elided from the captured stack so it starts at user code —
    * reference getStackTrace/driverFunctionPrefix (otel_monitor.go:46-51,
    * 530-551). */
  private val driverFramePrefixes = Seq(
    "graft.", "org.apache.spark.", "java.", "jdk.", "scala.", "sbt.")

  def stackTrace(limit: Int = 50): String =
    Thread.currentThread().getStackTrace.iterator
      .drop(1) // getStackTrace itself
      .filterNot(f => driverFramePrefixes.exists(f.getClassName.startsWith))
      .take(limit)
      .map(f => s"${f.getClassName}.${f.getMethodName}\n\t" +
        s"${f.getFileName}:${f.getLineNumber}")
      .mkString("\n")

  /** reference peerInfo (otel_monitor.go:290-303): connection ids look like
    * `host:port[-n]`; default port 27017. */
  def peerInfo(connectionId: String): (String, Int) = {
    var hostname = connectionId
    var port = 27017
    val bracket = hostname.indexOf('[')
    if (bracket >= 0) hostname = hostname.substring(0, bracket)
    val colon = hostname.indexOf(':')
    if (colon >= 0) {
      port = scala.util.Try(hostname.substring(colon + 1).toInt).getOrElse(0)
      hostname = hostname.substring(0, colon)
    }
    (hostname, port)
  }

  /** reference extractCollection (otel_monitor.go:255-270): the command's
    * first key equals the command name and maps to the collection string.
    * The Map form keeps no element order, so "first key" relaxes to "the
    * key named like the command". */
  def extractCollection(commandName: String,
      command: Map[String, Any]): Option[String] =
    command.get(commandName).collect { case s: String => s }

  /** Per-command statement dissection — reference operationSection
    * (otel_monitor.go:318-337) + the extract* family (339-455). Unknown
    * commands pass through whole. */
  def operationSection(commandName: String,
      command: Map[String, Any]): Map[String, Any] = commandName match {
    case "aggregate" => // extractAggregation: the pipeline element only
      command.get("pipeline").map(p => Map("pipeline" -> p))
        .getOrElse(Map.empty)
    case "delete" => // extractDelete: first entry of the deletes array
      firstOfArray(command, "deletes")
    case "find" => // extractFind: filter/sort/limit/hint
      command.view.filterKeys(Set("filter", "sort", "limit", "hint")).toMap
    case "findAndModify" => // extractFindAndModify: query/update/upsert
      command.view.filterKeys(Set("query", "update", "upsert")).toMap
    case "update" => // extractUpdate: first entry of the updates array
      firstOfArray(command, "updates")
    case "insert" => // extractInsert: ordered/documents
      command.view.filterKeys(Set("ordered", "documents")).toMap
    case _ => command
  }

  private def firstOfArray(command: Map[String, Any],
      key: String): Map[String, Any] =
    command.get(key) match {
      case Some(s: Seq[_]) => s.headOption match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      }
      case _ => Map.empty
    }

  /** reference formatStatement (otel_monitor.go:305-316): extended-JSON
    * with 2-space indentation; the stripped variant replaces leaf values
    * with `<type>` placeholders first ([[Fingerprint.strip]] = the
    * reference's stripDocument). */
  def formatStatement(section: Map[String, Any], stripped: Boolean): String = {
    if (section.isEmpty) return ""
    val doc: Any = if (stripped) Fingerprint.strip(section) else section
    renderJson(doc, 0)
  }

  private def renderJson(v: Any, depth: Int): String = {
    val pad = "  " * (depth + 1)
    val close = "  " * depth
    v match {
      case null => "null"
      case m: Map[_, _] =>
        val fields = m.asInstanceOf[Map[String, Any]].toSeq
        if (fields.isEmpty) "{}"
        else fields.map { case (k, x) =>
          s"""$pad"${escape(k)}": ${renderJson(x, depth + 1)}"""
        }.mkString("{\n", ",\n", s"\n$close}")
      case s: Seq[_] =>
        if (s.isEmpty) "[]"
        else s.map(x => pad + renderJson(x, depth + 1))
          .mkString("[\n", ",\n", s"\n$close]")
      case s: String => s""""${escape(s)}""""
      case b: Boolean => b.toString
      case n @ (_: Int | _: Long | _: Double | _: Float | _: Short |
          _: Byte) => n.toString
      case d: BigDecimal => d.toString
      case other => s""""${escape(other.toString)}""""
    }
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

/** Session-side command issue/trace plumbing: generates (connectionId,
  * requestId) pairs and brackets each command body with
  * started/succeeded/failed events — what the mongo driver does around the
  * wire call, so [[OtelMonitor]] sees the same event stream. */
final class CommandTracer(val monitor: OtelMonitor,
    val connectionId: String) {
  private val req = new AtomicLong()

  def command[T](databaseName: String, commandName: String,
      cmd: Map[String, Any])(body: => T)(replyBytes: T => Long): T = {
    val id = req.incrementAndGet()
    monitor.started(CommandStartedEvent(connectionId, id, commandName,
      databaseName, cmd))
    try {
      val out = body
      monitor.succeeded(
        CommandSucceededEvent(connectionId, id, commandName, replyBytes(out)))
      out
    } catch {
      case e: Throwable =>
        monitor.failed(
          CommandFailedEvent(connectionId, id, commandName, e.toString))
        throw e
    }
  }
}
