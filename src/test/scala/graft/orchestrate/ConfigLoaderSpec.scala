package graft.orchestrate

import graft.SparkSpec
import graft.model._
import java.nio.file.Files

class ConfigLoaderSpec extends SparkSpec {
  import spark.implicits._

  private val json =
    """{ "options": { "dry_run": false, "limit": 0 },
      |  "simple_migrations": [
      |    { "options": { "id": "first", "dependencies": [],
      |                   "namespace": { "db_name": "mci", "collection": "items" },
      |                   "query": { "cat": "x" }, "limit": 0 },
      |      "update": { "$set": { "cat": "done" } } },
      |    { "options": { "id": "second", "dependencies": ["first"],
      |                   "namespace": { "db_name": "mci", "collection": "items" } },
      |      "update": { "$inc": { "v": 1 } } } ] }""".stripMargin

  test("parses configuration with dependencies and query docs") {
    val conf = ConfigLoader.fromJson(json)
    assert(conf.simpleMigrations.map(_.id) == Seq("first", "second"))
    assert(conf.simpleMigrations.head.options.query == Map("cat" -> "x"))
    assert(conf.simpleMigrations(1).options.dependsOn == Seq("first"))
  }

  test("missing update rejected (config.go:32-35 parity)") {
    val bad = """{"simple_migrations":[{"options":{"id":"x",
      |"namespace":{"db_name":"d","collection":"c"}}}]}""".stripMargin
    intercept[IllegalArgumentException] { ConfigLoader.fromJson(bad) }
  }

  test("unregistered manual op rejected (config.go:47-50 parity)") {
    val bad = """{"manual_migrations":[{"options":{"id":"x",
      |"namespace":{"db_name":"d","collection":"c"}},"name":"ghost"}]}""".stripMargin
    intercept[IllegalArgumentException] { ConfigLoader.fromJson(bad) }
  }

  test("config-driven application runs end-to-end") {
    val root = Files.createTempDirectory("graft-cfg").toString
    Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("_id", "cat", "v")
      .write.parquet(s"$root/items.parquet")
    val app = ConfigLoader.newApplication(spark, root, json)
    val res = app.run()
    assert(res.map(_.id) == Seq("first", "second"))
    assert(res.forall(!_.hasErrors))
    val out = spark.read.parquet(s"$root/items.parquet")
    assert(out.where($"cat" === "done").count() == 1)
    assert(out.select("v").as[Double].collect().sorted.toSeq == Seq(2.0, 3.0))
  }

  test("spec -> JSON -> spec round-trips (generator_simple.go:19-22 parity)") {
    val regs = new Registries
    regs.registerOperation("op1", identity)
    regs.registerProcessor("proc1", identity)
    val conf = Configuration(
      ApplicationOptions(dryRun = true, limit = 3),
      simpleMigrations = Seq(SimpleMigration(
        GeneratorOptions("s1", Seq("dep"), Namespace("db", "items"),
          query = Map("cat" -> "x", "v" -> Map("$gt" -> 2L)),
          limit = 5, sortBy = Seq("-v"), idColumn = Some("_id")),
        Map("$set" -> Map("cat" -> "done")))),
      manualMigrations = Seq(ManualMigration(
        GeneratorOptions("m1", Nil, Namespace("db", "items")), "op1")),
      streamMigrations = Seq(StreamMigration(
        GeneratorOptions("t1", Nil, Namespace("db", "items")), "proc1")))
    val round = ConfigLoader.fromJson(ConfigLoader.toJson(conf), regs)
    assert(round == conf)
    // single-spec writer round-trips through parse too
    val one = ConfigLoader.parseJson(
      ConfigLoader.toJson(conf.simpleMigrations.head))
    assert(ConfigLoader.doc(one).contains("update"))
  }

  test("Extended JSON v2 type wrappers decode; query operators stay docs") {
    val q = ConfigLoader.parseJson(
      """{"ts": {"$gt": {"$date": "2024-01-02T03:04:05Z"}},
        |  "n": {"$numberLong": "9007199254740993"},
        |  "i": {"$numberInt": "42"},
        |  "d": {"$numberDouble": "2.5"},
        |  "dec": {"$numberDecimal": "1.10"},
        |  "id": {"$oid": "507f1f77bcf86cd799439011"},
        |  "legacy": {"$date": 86400000}}""".stripMargin)
      .asInstanceOf[Map[String, Any]]
    assert(q("ts").asInstanceOf[Map[String, Any]]("$gt") ==
      java.time.Instant.parse("2024-01-02T03:04:05Z"))
    assert(q("n") == 9007199254740993L)
    assert(q("i") == 42)
    assert(q("d") == 2.5)
    assert(q("dec") == BigDecimal("1.10"))
    assert(q("id") == "507f1f77bcf86cd799439011")
    assert(q("legacy") == java.time.Instant.ofEpochMilli(86400000L))
    // {$gt: …} is a single-$-key object too — it must NOT decode
    assert(q("ts").isInstanceOf[Map[_, _]])
  }

  test("normalizeExtendedJson handles YAML-parsed trees") {
    val raw = Map("query" -> Map("ts" -> Map("$gt" ->
      Map("$date" -> "2024-06-01T00:00:00Z"))),
      "vals" -> Seq(Map("$numberLong" -> "7")))
    val norm = ConfigLoader.normalizeExtendedJson(raw)
      .asInstanceOf[Map[String, Any]]
    assert(norm("query").asInstanceOf[Map[String, Any]]("ts")
      .asInstanceOf[Map[String, Any]]("$gt") ==
      java.time.Instant.parse("2024-06-01T00:00:00Z"))
    assert(norm("vals") == Seq(7L))
  }

  test("YAML config parses to the same configuration as JSON") {
    val yaml =
      """# reference configs are yaml-shaped (model/config.go yaml tags)
        |options:
        |  dry_run: false
        |  limit: 0
        |simple_migrations:
        |  - options:
        |      id: first
        |      dependencies: []
        |      namespace:
        |        db_name: mci
        |        collection: items
        |      query:
        |        cat: x
        |      limit: 0
        |    update:
        |      $set:
        |        cat: done
        |  - options:
        |      id: second
        |      dependencies:
        |        - first
        |      namespace: {"db_name": "mci", "collection": "items"}
        |    update: {"$inc": {"v": 1}}
        |""".stripMargin
    val fromYaml = ConfigLoader.fromYaml(yaml)
    val fromJson = ConfigLoader.fromJson(json)
    assert(fromYaml.simpleMigrations.map(_.id) ==
      fromJson.simpleMigrations.map(_.id))
    assert(fromYaml.simpleMigrations.head.options.query == Map("cat" -> "x"))
    assert(fromYaml.simpleMigrations.head.update ==
      Map("$set" -> Map("cat" -> "done")))
    assert(fromYaml.simpleMigrations(1).options.dependsOn == Seq("first"))
    assert(fromYaml.simpleMigrations(1).update == Map("$inc" -> Map("v" -> 1L)))
  }

  test("YAML scalars: null, bool, numbers, quoted strings") {
    val parsed = ConfigLoader.doc(ConfigLoader.parseYaml(
      """a: null
        |b: ~
        |c: true
        |d: 42
        |e: 4.5
        |f: "quo ted"
        |g: 'single'
        |h: plain string
        |empty_map: {}
        |empty_list: []
        |""".stripMargin))
    assert(parsed("a") == null && parsed("b") == null)
    assert(parsed("c") == true)
    assert(parsed("d") == 42L)
    assert(parsed("e") == 4.5)
    assert(parsed("f") == "quo ted" && parsed("g") == "single")
    assert(parsed("h") == "plain string")
    assert(parsed("empty_map") == Map.empty)
    assert(parsed("empty_list") == Seq.empty)
  }
}
