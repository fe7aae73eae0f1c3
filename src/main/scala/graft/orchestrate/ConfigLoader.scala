package graft.orchestrate

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model._
import scala.jdk.CollectionConverters._

/** Config-file application entry — reference NewApplication
  * (/root/reference/config.go:16-80) over model.Configuration
  * (/root/reference/model/config.go:7-37). The JSON shape mirrors the
  * reference's tags:
  *
  * {{{
  * { "options": { "dry_run": false, "limit": 0 },
  *   "simple_migrations": [
  *     { "options": { "id": "first", "dependencies": [],
  *                    "namespace": { "db_name": "mci", "collection": "test" },
  *                    "query": { "time": { "$gt": "..." } }, "limit": 0 },
  *       "update": { "$rename": { "time": "timeSince" } } } ],
  *   "manual_migrations":  [ { "options": {...}, "name": "op-name" } ],
  *   "stream_migrations":  [ { "options": {...}, "name": "proc-name" } ] }
  * }}}
  *
  * Validation parity: update-doc presence (config.go:32-35), registered
  * op/processor existence (config.go:47-50,62-65), option validity
  * (model/generator.go:15-33).
  */
object ConfigLoader {

  private val mapper = new ObjectMapper()

  /** Parse arbitrary JSON into the engine's document representation
    * (Map[String, Any] / Seq[Any] / scalars) — also usable for query and
    * update documents supplied as JSON strings. */
  def parseJson(json: String): Any = toScala(mapper.readTree(json))

  /** BSON Extended-JSON v2 type wrappers (the form mongoexport and the
    * drivers emit in config files): a single-key `{$type: value}` object
    * decodes to the native value. Deliberately restricted to the TYPE
    * keys — query operators ({$gt: …}) are also single-$-key objects and
    * must stay documents. */
  private val extendedJsonTypes = Set("$date", "$numberLong", "$numberInt",
    "$numberDouble", "$numberDecimal", "$oid", "$uuid")

  private def decodeExtended(k: String, inner: Any): Any = k match {
    case "$date" => inner match {
      case s: String => java.time.Instant.parse(s)
      case l: Long => java.time.Instant.ofEpochMilli(l) // relaxed form
      case i: Int => java.time.Instant.ofEpochMilli(i.toLong)
      case other => throw new IllegalArgumentException(
        s"$$date: expected ISO string or epoch millis, got $other")
    }
    case "$numberLong" => inner.toString.toLong
    case "$numberInt" => inner.toString.toInt
    case "$numberDouble" => inner.toString.toDouble
    case "$numberDecimal" => BigDecimal(inner.toString)
    case "$oid" | "$uuid" => inner.toString // ids are strings here
  }

  /** Normalize Extended-JSON type wrappers in an ALREADY-parsed document
    * tree — the YAML path (hand-rolled block parser) and any
    * caller-assembled maps route through here; `parseJson` decodes
    * inline. */
  def normalizeExtendedJson(v: Any): Any = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      if (mm.size == 1 && extendedJsonTypes(mm.head._1))
        decodeExtended(mm.head._1, normalizeExtendedJson(mm.head._2))
      else mm.map { case (k, x) => k -> normalizeExtendedJson(x) }
    case s: Seq[_] => s.map(normalizeExtendedJson)
    case other => other
  }

  private def toScala(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import com.fasterxml.jackson.databind.node._
    n match {
      case o: ObjectNode if o.size() == 1 &&
          extendedJsonTypes(o.fieldNames().next()) =>
        val k = o.fieldNames().next()
        decodeExtended(k, toScala(o.get(k)))
      case o: ObjectNode =>
        o.properties().asScala.map(e => e.getKey -> toScala(e.getValue)).toMap
      case a: ArrayNode => a.asScala.map(toScala).toSeq
      case t: TextNode => t.textValue()
      case b: BooleanNode => b.booleanValue()
      case _: NullNode => null
      case num: NumericNode =>
        if (num.isIntegralNumber) num.longValue() else num.doubleValue()
      case other => other.asText()
    }
  }

  def doc(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected object: $other")
  }

  private def options(v: Any): GeneratorOptions = {
    val m = doc(v)
    val ns = doc(m.getOrElse("namespace",
      throw new IllegalArgumentException("options.namespace required")))
    GeneratorOptions(
      jobId = m.getOrElse("id", "").toString,
      dependsOn = m.get("dependencies") match {
        case Some(s: Seq[_]) => s.map(_.toString)
        case _ => Nil
      },
      ns = Namespace(ns.getOrElse("db_name", "").toString,
        ns.getOrElse("collection", "").toString),
      query = doc(m.getOrElse("query", Map.empty)),
      limit = m.get("limit").collect { case n: Long => n.toInt }.getOrElse(0),
      sortBy = m.get("sort_by") match {
        case Some(s: Seq[_]) => s.map(_.toString)
        case _ => Nil
      },
      idColumn = m.get("id_column").map(_.toString))
  }

  /** Build a Configuration from JSON, with the reference's validation. */
  def fromJson(json: String, registries: Registries = new Registries)
      : Configuration = fromDoc(doc(parseJson(json)), registries)

  /** Build a Configuration from YAML — the reference's config files are
    * YAML-shaped (model/config.go:7-37 `yaml:` tags); same keys, same
    * validation. Parses the indentation subset config files actually use
    * (nested maps, `- ` lists, scalars, inline JSON flow values — JSON is
    * itself valid YAML). */
  def fromYaml(yaml: String, registries: Registries = new Registries)
      : Configuration =
    fromDoc(doc(normalizeExtendedJson(parseYaml(yaml))), registries)

  private def fromDoc(root: Map[String, Any], registries: Registries)
      : Configuration = {
    val opts = doc(root.getOrElse("options", Map.empty))
    val appOptions = ApplicationOptions(
      dryRun = opts.get("dry_run").contains(true),
      limit = opts.get("limit").collect { case n: Long => n.toInt }.getOrElse(0))

    def seqOf(key: String): Seq[Map[String, Any]] = root.get(key) match {
      case Some(s: Seq[_]) => s.map(doc)
      case _ => Nil
    }

    val simple = seqOf("simple_migrations").map { m =>
      val update = doc(m.getOrElse("update", // config.go:32-35
        throw new IllegalArgumentException("simple migration requires update")))
      require(update.nonEmpty, "simple migration requires a non-empty update")
      SimpleMigration(options(m("options")), update)
    }
    val manual = seqOf("manual_migrations").map { m =>
      val name = m.getOrElse("name", "").toString
      require(registries.operation(name).nonEmpty, // config.go:47-50
        s"manual migration operation '$name' is not registered")
      ManualMigration(options(m("options")), name)
    }
    val stream = seqOf("stream_migrations").map { m =>
      val name = m.getOrElse("name", "").toString
      require(registries.processor(name).nonEmpty, // config.go:62-65
        s"stream migration processor '$name' is not registered")
      StreamMigration(options(m("options")), name)
    }
    val all = simple ++ manual ++ stream
    all.foreach(s => require(s.options.isValid,
      s"invalid migration options: ${s.options}"))
    Configuration(appOptions, simple, manual, stream)
  }

  /** NewApplication: config JSON → ready-to-run MigrationApp. */
  def newApplication(spark: org.apache.spark.sql.SparkSession, root: String,
      json: String, registries: Registries = new Registries): MigrationApp = {
    val conf = fromJson(json, registries)
    new MigrationApp(spark, root, conf.options, registries)
      .setup(conf.simpleMigrations ++ conf.manualMigrations ++
        conf.streamMigrations)
  }

  // ---- spec -> JSON round-trip -------------------------------------------

  /** Serialize a Configuration back to the JSON the loader reads — the
    * round-trip the reference gets from registering every job type with its
    * serializer (generator_simple.go:19-22 etc.):
    * `fromJson(toJson(conf)) == conf`. */
  def toJson(conf: Configuration): String = renderJson(Map(
    "options" -> Map(
      "dry_run" -> conf.options.dryRun, "limit" -> conf.options.limit),
    "simple_migrations" -> conf.simpleMigrations.map(m =>
      Map("options" -> optionsDoc(m.options), "update" -> m.update)),
    "manual_migrations" -> conf.manualMigrations.map(m =>
      Map("options" -> optionsDoc(m.options), "name" -> m.operationName)),
    "stream_migrations" -> conf.streamMigrations.map(m =>
      Map("options" -> optionsDoc(m.options), "name" -> m.processorName))))

  def toJson(spec: MigrationSpec): String = spec match {
    case SimpleMigration(o, u) =>
      renderJson(Map("options" -> optionsDoc(o), "update" -> u))
    case ManualMigration(o, n) =>
      renderJson(Map("options" -> optionsDoc(o), "name" -> n))
    case StreamMigration(o, n) =>
      renderJson(Map("options" -> optionsDoc(o), "name" -> n))
  }

  private def optionsDoc(o: GeneratorOptions): Map[String, Any] = {
    var m: Map[String, Any] = Map(
      "id" -> o.jobId,
      "dependencies" -> o.dependsOn,
      "namespace" -> Map(
        "db_name" -> o.ns.db, "collection" -> o.ns.collection),
      "query" -> o.query,
      "limit" -> o.limit)
    if (o.sortBy.nonEmpty) m += "sort_by" -> o.sortBy
    o.idColumn.foreach(c => m += "id_column" -> c)
    m
  }

  /** Compact JSON renderer for the engine's document representation. */
  def renderJson(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      .map { case (k, x) => s""""${escapeJson(k)}":${renderJson(x)}""" }
      .mkString("{", ",", "}")
    case s: Seq[_] => s.map(renderJson).mkString("[", ",", "]")
    case s: String => s""""${escapeJson(s)}""""
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Double | _: Float | _: Short |
        _: Byte) => n.toString
    case d: BigDecimal => d.toString
    case other => s""""${escapeJson(other.toString)}""""
  }

  private def escapeJson(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  // ---- YAML subset parser ------------------------------------------------

  /** Parse the YAML subset the reference's config files use: 2-space-ish
    * indentation, block maps (`key:` / `key: value`), block lists (`- `),
    * scalars (null/bool/number/quoted/plain string), and inline JSON flow
    * values (`query: {"a": {"$gt": 1}}`). Comments (`#` full-line) and
    * blank lines are skipped. Produces the same Map/Seq/scalar document
    * form as [[parseJson]]. */
  def parseYaml(yaml: String): Any = {
    val lines = collection.mutable.ArrayBuffer.from(
      yaml.linesIterator
        .map(_.replace("\t", "  "))
        .map(l => if (l.trim.startsWith("#")) "" else l)
        .filterNot(_.trim.isEmpty)
        .filterNot(_.trim == "---"))
    if (lines.isEmpty) Map.empty[String, Any]
    else new YamlBlockParser(lines).parseBlock(indentOf(lines.head))
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  private final class YamlBlockParser(
      lines: collection.mutable.ArrayBuffer[String]) {
    private var i = 0

    def parseBlock(indent: Int): Any = {
      if (i >= lines.length || indentOf(lines(i)) < indent)
        return Map.empty[String, Any]
      if (lines(i).trim.startsWith("- ") || lines(i).trim == "-")
        parseList(indentOf(lines(i)))
      else parseMap(indentOf(lines(i)))
    }

    private def parseList(indent: Int): Seq[Any] = {
      val buf = collection.mutable.ArrayBuffer.empty[Any]
      while (i < lines.length && indentOf(lines(i)) == indent &&
          (lines(i).trim.startsWith("- ") || lines(i).trim == "-")) {
        val content = lines(i).trim.stripPrefix("-").trim
        if (content.isEmpty) { // item body on the following lines
          i += 1
          buf += parseBlock(indent + 1)
        } else if (isMapEntry(content) && !isFlow(content) &&
            !isQuoted(content)) {
          // "- key: value" opens a map item: rewrite the dash as spaces and
          // re-parse this line as the first entry of a nested map block
          lines(i) = " " * (indent + 2) +
            lines(i).trim.stripPrefix("-").trim
          buf += parseMap(indent + 2)
        } else { // plain scalar item
          i += 1
          buf += scalar(content)
        }
      }
      buf.toSeq
    }

    private def parseMap(indent: Int): Map[String, Any] = {
      var m = Map.empty[String, Any]
      while (i < lines.length && indentOf(lines(i)) == indent &&
          !lines(i).trim.startsWith("- ") && lines(i).trim != "-") {
        val t = lines(i).trim
        val colon = t.indexOf(':')
        require(colon > 0, s"yaml: expected 'key: value', got '$t'")
        val key = unquote(t.substring(0, colon).trim)
        val rest = t.substring(colon + 1).trim
        i += 1
        m += key -> (if (rest.isEmpty) parseBlock(indent + 1)
          else scalar(rest))
      }
      m
    }

    private def isFlow(s: String) = s.startsWith("{") || s.startsWith("[")
    private def isQuoted(s: String) =
      s.startsWith("\"") || s.startsWith("'")

    /** A list item opens a nested map only when it looks like YAML's
      * `key: ` form — plain-identifier key, colon followed by space or
      * end-of-line. `- http://host/path` and `- 12:30:00` are scalars, not
      * `{http: //host/path}`. */
    private val mapEntryRe =
      """^([A-Za-z0-9_.$-]+|"[^"]*"|'[^']*'):(\s.*)?$""".r
    private def isMapEntry(s: String): Boolean = mapEntryRe.matches(s)

    /** Drop an inline ` # comment` from a plain scalar (flow values keep
      * their text — `#` inside JSON strings is data); a quoted scalar keeps
      * everything inside its quotes. */
    private def stripComment(s: String): String =
      if (isFlow(s)) s
      else if (isQuoted(s)) {
        val end = s.indexOf(s.head, 1)
        if (end > 0) s.substring(0, end + 1) else s
      } else {
        val ix = s.indexOf(" #")
        if (ix >= 0) s.substring(0, ix).trim else s
      }

    private def scalar(raw: String): Any = stripComment(raw) match {
      case "" | "~" | "null" => null
      case "true" => true
      case "false" => false
      case "{}" => Map.empty[String, Any]
      case "[]" => Seq.empty[Any]
      case q if isQuoted(q) => unquote(q)
      case f if isFlow(f) => parseJson(f) // JSON flow is valid YAML
      case n =>
        scala.util.Try(n.toLong).toOption
          .orElse(scala.util.Try(n.toDouble).toOption)
          .getOrElse(n)
    }

    private def unquote(s: String): String =
      if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
          (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
      else s
  }
}
