package graft.apm

import OtelMonitor._

class OtelMonitorSpec extends graft.SparkSpec {

  private def monitor(statements: Boolean = true) =
    new OtelMonitor(commandAttributeDisabled = !statements)

  private def start(m: OtelMonitor, name: String, cmd: Map[String, Any],
      reqId: Long = 1L): Unit =
    m.started(CommandStartedEvent("db0.example.net:27017[-4]", reqId, name,
      "testdb", cmd))

  test("span per command: semconv attributes, name, success lifecycle") {
    val m = monitor()
    start(m, "find", Map("find" -> "users", "filter" -> Map("age" -> 21)))
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 1L,
      "find", replyBytes = 1234L))
    val spans = m.tracer.finished
    assert(spans.size == 1)
    val s = spans.head
    assert(s.name == "users.find")
    val a = s.attributes
    assert(a("db.system") == "mongodb")
    assert(a("db.operation") == "find")
    assert(a("db.name") == "testdb")
    assert(a("db.mongodb.collection") == "users")
    assert(a("net.peer.name") == "db0.example.net")
    assert(a("net.peer.port") == 27017)
    assert(a("net.transport") == "ip_tcp")
    assert(a("db.response_bytes") == 1234L)
    assert(a.contains("code.stacktrace"))
    assert(s.status == SpanStatus.Unset) // success leaves status unset
    assert(s.endNanos >= s.startNanos)
  }

  test("failed command sets error status and ends the span") {
    // exercised through the CollectionApi seam: an injected failure on
    // the mock collection must surface to the caller AND close its span
    // with error status — the same path a real wire error takes
    val m = monitor()
    val coll = new graft.db.MockCollection(
      spark.range(1).toDF("_id"), monitor = Some(m))
    coll.failOn = Map("find" -> new RuntimeException("boom"))
    val thrown = intercept[RuntimeException] { coll.find(Map.empty) }
    assert(thrown.getMessage == "boom")
    val s = m.tracer.finished.head
    assert(s.status == SpanStatus.Error("java.lang.RuntimeException: boom"))
  }

  test("span keyed by (connection, request): unknown finish is a no-op") {
    val m = monitor()
    start(m, "find", Map("find" -> "users"), reqId = 7L)
    m.succeeded(CommandSucceededEvent("other:1[1]", 7L, "find", 0L))
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 8L,
      "find", 0L))
    assert(m.tracer.finished.isEmpty)
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 7L,
      "find", 0L))
    assert(m.tracer.finished.size == 1)
  }

  test("db.statement carries full values; stripped replaces them by type") {
    val m = monitor(statements = true)
    start(m, "find", Map("find" -> "users",
      "filter" -> Map("name" -> "ada", "age" -> Map("$gt" -> 40))))
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 1L,
      "find", 0L))
    val a = m.tracer.finished.head.attributes
    val full = a("db.statement").toString
    assert(full.contains("\"ada\"") && full.contains("40"))
    val stripped = a("db.statement.stripped").toString
    assert(!stripped.contains("ada") && !stripped.contains("40"))
    assert(stripped.contains("<string>") && stripped.contains("<int>"))
  }

  test("statements disabled (the default) emits neither attribute") {
    val m = new OtelMonitor() // reference default: disabled
    start(m, "find", Map("find" -> "users", "filter" -> Map("a" -> 1)))
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 1L,
      "find", 0L))
    val a = m.tracer.finished.head.attributes
    assert(!a.contains("db.statement") && !a.contains("db.statement.stripped"))
  }

  test("command transformer returning None suppresses statements") {
    val m = new OtelMonitor(commandAttributeDisabled = false,
      commandTransformer = _ => None)
    start(m, "find", Map("find" -> "users", "filter" -> Map("a" -> 1)))
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 1L,
      "find", 0L))
    val a = m.tracer.finished.head.attributes
    assert(!a.contains("db.statement"))
  }

  test("dissectors cut each command to its operation section") {
    // find: filter/sort/limit/hint only
    assert(operationSection("find", Map("find" -> "c", "filter" -> Map("a" -> 1),
      "sort" -> Map("a" -> 1), "limit" -> 5, "hint" -> "idx",
      "batchSize" -> 100)).keySet == Set("filter", "sort", "limit", "hint"))
    // findAndModify: query/update/upsert
    assert(operationSection("findAndModify", Map("findAndModify" -> "c",
      "query" -> Map("a" -> 1), "update" -> Map("$set" -> Map("b" -> 2)),
      "upsert" -> true, "new" -> true)).keySet ==
      Set("query", "update", "upsert"))
    // insert: ordered/documents
    assert(operationSection("insert", Map("insert" -> "c", "ordered" -> true,
      "documents" -> Seq(Map("a" -> 1)))).keySet == Set("ordered", "documents"))
    // update/delete: first entry of their array
    assert(operationSection("update", Map("update" -> "c", "updates" -> Seq(
      Map("q" -> Map("a" -> 1), "u" -> Map("$inc" -> Map("n" -> 1)))))) ==
      Map("q" -> Map("a" -> 1), "u" -> Map("$inc" -> Map("n" -> 1))))
    assert(operationSection("delete", Map("delete" -> "c", "deletes" -> Seq(
      Map("q" -> Map("a" -> 1), "limit" -> 0)))) ==
      Map("q" -> Map("a" -> 1), "limit" -> 0))
    // aggregate: pipeline element only
    assert(operationSection("aggregate", Map("aggregate" -> "c",
      "pipeline" -> Seq(Map("$match" -> Map("a" -> 1))), "cursor" -> Map())) ==
      Map("pipeline" -> Seq(Map("$match" -> Map("a" -> 1)))))
    // unknown commands pass through whole
    assert(operationSection("ping", Map("ping" -> 1)) == Map("ping" -> 1))
  }

  test("peerInfo parses host:port[conn] with defaults") {
    assert(peerInfo("db0.example.net:27017[-4]") == ("db0.example.net", 27017))
    assert(peerInfo("db0.example.net:9999") == ("db0.example.net", 9999))
    assert(peerInfo("db0.example.net") == ("db0.example.net", 27017))
    assert(peerInfo("host[3]") == ("host", 27017))
  }

  test("formatStatement pretty-prints and strips arrays compacted") {
    val section = Map("filter" -> Map(
      "tags" -> Seq("a", "b"), "n" -> Seq(1, 2, 3)))
    val full = formatStatement(section, stripped = false)
    assert(full.contains("\n")) // indented
    assert(full.contains("\"tags\""))
    val stripped = formatStatement(section, stripped = true)
    // compactArray: one entry per distinct element type
    assert(stripped.split("<string>").length == 2,
      s"expected a single <string> in $stripped")
    assert(stripped.split("<int>").length == 2)
    assert(formatStatement(Map.empty, stripped = false) == "")
  }

  test("stack trace elides driver/harness frames") {
    val st = stackTrace()
    assert(!st.contains("org.apache.spark"))
    assert(!st.contains("graft."))
  }

  test("span name falls back to bare command without a collection") {
    val m = monitor()
    start(m, "ping", Map("ping" -> 1))
    m.succeeded(CommandSucceededEvent("db0.example.net:27017[-4]", 1L,
      "ping", 0L))
    assert(m.tracer.finished.head.name == "ping")
  }
}

/** End-to-end: a session constructed with a monitor emits spans for the
  * commands its collections and queries run. */
class SessionTracingSpec extends graft.SparkSpec {
  import spark.implicits._

  test("session commands produce finished spans") {
    val root = java.nio.file.Files.createTempDirectory("graft-otel").toString
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("_id", "cat")
      .write.parquet(s"$root/things.parquet")
    val mon = new OtelMonitor(commandAttributeDisabled = false)
    val sess = new graft.db.GraftSession(spark, root, Some(mon))
    val coll = sess.db("db").c("things")

    val rows = coll.find(Map("cat" -> "a")).sort("-_id").limit(5).all()
    assert(rows.size == 2)
    coll.count()
    intercept[NoSuchElementException] {
      coll.find(Map("cat" -> "zzz")).one()
    }

    val spans = mon.tracer.finished
    assert(spans.map(_.name).count(_ == "things.find") == 2)
    assert(spans.map(_.name).contains("things.count"))
    val findSpan = spans.find(_.name == "things.find").get
    val stmt = findSpan.attributes("db.statement").toString
    assert(stmt.contains("\"filter\"") && stmt.contains("\"cat\""))
    assert(stmt.contains("\"sort\"") && stmt.contains("\"limit\""))
    val strippedStmt = findSpan.attributes("db.statement.stripped").toString
    assert(strippedStmt.contains("<string>") && !strippedStmt.contains("\"a\""))
    // the find that threw NotFound still ends its span successfully at the
    // driver level only when rows came back; NoSuchElementException is a
    // client-side failure -> error status
    val failed = spans.filter(_.status.isInstanceOf[SpanStatus.Error])
    assert(failed.size == 1)
  }
}
