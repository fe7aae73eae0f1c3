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
}
