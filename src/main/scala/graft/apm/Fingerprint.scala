package graft.apm

/** Query-shape fingerprinting — reference stripDocument/stripValue/
  * compactArray (/root/reference/apm/otel_monitor.go:457-524): replace
  * every leaf value with a `<type>` placeholder (recursing into documents
  * and arrays, deduplicating array element types) so structurally identical
  * queries group under one fingerprint regardless of literals. Used for
  * APM grouping and statement tracing (db.statement stripped variant,
  * otel_monitor.go:212-249).
  */
object Fingerprint {

  def typeName(v: Any): String = v match {
    case null => "null"
    case _: String => "string"
    case _: Boolean => "bool"
    case _: Int | _: Long => "int"
    case _: Float | _: Double => "double"
    case _: java.math.BigDecimal | _: BigDecimal => "decimal"
    case _: java.sql.Timestamp | _: java.time.Instant | _: java.util.Date =>
      "date"
    case _: Array[Byte] => "binary"
    case _ => "value"
  }

  /** Strip a document to its type skeleton. */
  def strip(v: Any): Any = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> strip(x) }
    case s: Seq[_] => compactArray(s)
    case other => s"<${typeName(other)}>"
  }

  /** Arrays keep one entry per distinct element shape
    * (compactArray, otel_monitor.go:~505-524). */
  private def compactArray(s: Seq[_]): Seq[Any] =
    s.map(strip).distinct

  /** Canonical string form (sorted keys) — the grouping fingerprint. */
  def render(v: Any): String = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s""""$k": ${render(x)}""" }
        .mkString("{", ", ", "}")
    case s: Seq[_] => s.map(render).mkString("[", ", ", "]")
    case other => other.toString
  }

  def fingerprint(query: Map[String, Any]): String = render(strip(query))
}
