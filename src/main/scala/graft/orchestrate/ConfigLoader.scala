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

  private def toScala(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import com.fasterxml.jackson.databind.node._
    n match {
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
      limit = m.get("limit").collect { case n: Long => n.toInt }.getOrElse(0))
  }

  /** Build a Configuration from JSON, with the reference's validation. */
  def fromJson(json: String, registries: Registries = new Registries)
      : Configuration = {
    val root = doc(parseJson(json))
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
}
