package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.Instant

import graft.model._
import graft.db.{GraftSession, TableOps}
import graft.db.TableOps._
import graft.orchestrate.MigrationApp
import graft.backup.{Backup, BackupOptions}
import graft.apm.Apm

/** Driver contract — one `queries` entry + matching DuckDB `oracleSql` per
  * implemented operator from SURVEY.md §2 (plus the LLM-pipeline extension
  * operators). Every query routes through the library (compilers / TableOps /
  * pipeline / ops), not ad-hoc DataFrame code; outputs are deterministically
  * ordered and float-exact (decimal-cast sums) so they hash-match DuckDB.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.table(s, dir, name)
  private def coll(s: SparkSession, dir: String, name: String) =
    new GraftSession(s, dir).db("testdata").c(name)

  /** Flagship: the reference's own example migration (example_test.go:49-58)
    * — `{time: {$gt: cutoff}}` + `{$rename: {time: timeSince}}` — run
    * end-to-end through the orchestrator (deps, ledger, write-back) on a
    * temp copy of sf0.001 events. */
  def entry(spark: SparkSession): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-entry")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      tmp.resolve("events.parquet"))
    val app = new MigrationApp(spark, tmp.toString)
    app.setup(Seq(SimpleMigration(
      GeneratorOptions(
        jobId = "rename-ts",
        ns = Namespace("mci", "events"),
        query = Map("ts" -> Map("$gt" -> Instant.parse("2024-01-02T00:00:00Z")))),
      update = Map("$rename" -> Map("ts" -> "timeSince")))))
    val results = app.run()
    require(results.forall(!_.hasErrors), s"migration failed: $results")
    spark.read.parquet(s"$tmp/events.parquet")
  }

  // exact decimal-cast sum of a double column, deterministic in both engines
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(18, 2))).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.1 filtered scan through the query compiler + session facade
    "q01_find" -> ((s, dir) =>
      coll(s, dir, "lineitem")
        .find(Map(
          "l_returnflag" -> "R",
          "l_quantity" -> Map("$gte" -> 30),
          "l_linestatus" -> Map("$in" -> Seq("F", "O"))))
        .sort("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .toDF),

    // §2.1 point lookup (FindId)
    "q02_find_id" -> ((s, dir) =>
      coll(s, dir, "orders").findId(42L, "o_orderkey").toDF),

    // §2.6 sort(-field)/skip/limit through the ± sort-string parser
    "q03_sort_limit_skip" -> ((s, dir) =>
      coll(s, dir, "lineitem").find()
        .sort("-l_extendedprice", "l_orderkey", "l_linenumber")
        .skip(10).limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .toDF),

    // §2.4 filtered count
    "q04_count" -> ((s, dir) =>
      coll(s, dir, "orders").find(Map("o_orderstatus" -> "O"))
        .toDF.agg(count(lit(1)).as("cnt"))),

    // §2.8 update compiler: $set + $inc applied to matching rows
    "q05_update_set_inc" -> ((s, dir) => {
      val (res, _) = TableOps.updateAll(
        tbl(s, dir, "lineitem"),
        Map("l_returnflag" -> "A"),
        Map("$set" -> Map("l_linestatus" -> "X"),
            "$inc" -> Map("l_quantity" -> 5)),
        "l_orderkey")
      res.select("l_orderkey", "l_linenumber", "l_linestatus", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.8 $rename (the anser example shape) on matching rows
    "q06_update_rename" -> ((s, dir) => {
      val (res, _) = TableOps.updateAll(
        tbl(s, dir, "events"),
        Map("ts" -> Map("$gt" -> Instant.parse("2024-01-15T00:00:00Z"))),
        Map("$rename" -> Map("ts" -> "timeSince")),
        "event_id")
      res.select("event_id", "ts", "timeSince").orderBy("event_id")
    }),

    // §2.9 RemoveAll (anti-filter) + rollup of the survivors
    "q07_remove_all" -> ((s, dir) => {
      val (res, _) = TableOps.removeAll(
        tbl(s, dir, "lineitem"), Map("l_quantity" -> Map("$lt" -> 10)))
      res.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // §2.9 Upsert: MERGE-shaped last-wins by key (updates + inserts)
    "q08_upsert" -> ((s, dir) => {
      val base = tbl(s, dir, "orders")
      val updates = base.where(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = base.where(col("o_orderstatus") === "P")
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      TableOps.upsert(base, updates.unionByName(inserts), "o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // §2.9 ordered Bulk: update → remove → insert in one batch
    "q09_bulk" -> ((s, dir) => {
      val part = tbl(s, dir, "part")
      val inserts = part.where(col("p_partkey") <= 3)
        .withColumn("p_partkey", col("p_partkey") + 1000000L)
      TableOps.runBulk(part, Seq(
        BulkUpdate(Map("p_size" -> Map("$gte" -> 40)),
          Map("$set" -> Map("p_brand" -> "Brand#XL"))),
        BulkRemove(Map("p_retailprice" -> Map("$lt" -> 910.0))),
        BulkInsert(inserts)), "p_partkey")
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    }),

    // §2.3 dependency-state semi-join (broadcast; _id ∈ edges shape)
    "q10_semijoin" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val edges = tbl(s, dir, "lineitem").where(col("l_quantity") > 45)
        .select(col("l_orderkey").as("o_orderkey"))
      orders.join(broadcast(edges), Seq("o_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    }),

    // §2.4 aggregation pipeline: $match + $group + $sort
    "q11_pipeline_group" -> ((s, dir) =>
      coll(s, dir, "orders").pipe(Seq(
        Map("$match" -> Map("o_totalprice" -> Map("$gt" -> 1000.0))),
        Map("$group" -> Map(
          "_id" -> "$o_orderstatus",
          "n" -> Map("$sum" -> 1),
          "maxp" -> Map("$max" -> "$o_totalprice"),
          "minp" -> Map("$min" -> "$o_totalprice"))),
        Map("$sort" -> Map("_id" -> 1))))),

    // §2.4 headline grouped aggregation (TPC-H Q1 shape, decimal-exact)
    "q12_agg_sum" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.from(
          Instant.parse("1998-09-01T00:00:00Z"))))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // §2.4 pipeline $unwind + $sortByCount (word histogram)
    "q13_unwind_wordcount" -> ((s, dir) =>
      coll(s, dir, "documents").pipe(Seq(
        Map("$addFields" -> Map("word" -> Map("$split" -> Seq("$text", " ")))),
        Map("$unwind" -> "$word"),
        Map("$sortByCount" -> "$word"),
        Map("$limit" -> 50)))),

    // §2.3 $lookup + $unwind + $project (join parity layer)
    "q14_lookup" -> ((s, dir) =>
      new GraftSession(s, dir).db("testdata").c("orders").pipe(Seq(
        Map("$lookup" -> Map("from" -> "customer",
          "localField" -> "o_custkey", "foreignField" -> "c_custkey",
          "as" -> "cust")),
        Map("$unwind" -> "$cust"),
        Map("$project" -> Map("o_orderkey" -> 1, "c_name" -> "$cust.c_name")),
        Map("$sort" -> Map("o_orderkey" -> 1))))),

    // §2.12 APM event-window rollup (map-side-combining aggregation)
    "q15_apm_rollup" -> ((s, dir) =>
      Apm.rollup(
        tbl(s, dir, "events")
          .withColumn("ok", col("event_type") =!= "error")
          .withColumn("dur", col("event_id") % 1000),
        Seq("event_type"), "ok", "dur")
        .orderBy("event_type")),

    // §2.1 backup export frame: query + sort + limit
    "q16_backup" -> ((s, dir) =>
      Backup.exportFrame(tbl(s, dir, "events"), BackupOptions(
        query = Map("event_type" -> "click"),
        sortKeys = Seq("-ts", "event_id"),
        limit = 100))
        .select("event_id", "user_id", "ts")),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_find" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30
        |  AND l_linestatus IN ('F', 'O')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_find_id" ->
      "SELECT * FROM orders WHERE o_orderkey = 42",

    "q03_sort_limit_skip" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20 OFFSET 10""".stripMargin,

    "q04_count" ->
      "SELECT COUNT(*) AS cnt FROM orders WHERE o_orderstatus = 'O'",

    "q05_update_set_inc" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'A' THEN 'X' ELSE l_linestatus END AS l_linestatus,
        |  CASE WHEN l_returnflag = 'A' THEN l_quantity + 5 ELSE l_quantity END AS l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q06_update_rename" ->
      """SELECT event_id,
        |  CASE WHEN ts > TIMESTAMP '2024-01-15 00:00:00' THEN NULL ELSE ts END AS ts,
        |  CASE WHEN ts > TIMESTAMP '2024-01-15 00:00:00' THEN ts ELSE NULL END AS timeSince
        |FROM events ORDER BY event_id""".stripMargin,

    "q07_remove_all" ->
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE NOT (l_quantity < 10)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q08_upsert" ->
      """WITH updates AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'P'
        |)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT * FROM updates
        |  UNION ALL
        |  SELECT * FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |) ORDER BY o_orderkey""".stripMargin,

    "q09_bulk" ->
      """WITH u AS (
        |  SELECT p_partkey, p_name,
        |         CASE WHEN p_size >= 40 THEN 'Brand#XL' ELSE p_brand END AS p_brand,
        |         p_type, p_size, p_retailprice
        |  FROM part
        |), r AS (
        |  SELECT * FROM u WHERE NOT (p_retailprice < 910.0)
        |), i AS (
        |  SELECT * FROM r
        |  UNION ALL
        |  SELECT p_partkey + 1000000, p_name, p_brand, p_type, p_size, p_retailprice
        |  FROM part WHERE p_partkey <= 3
        |)
        |SELECT p_partkey, p_brand, p_size FROM i ORDER BY p_partkey""".stripMargin,

    "q10_semijoin" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q11_pipeline_group" ->
      """SELECT o_orderstatus AS _id, CAST(COUNT(*) AS BIGINT) AS n,
        |       MAX(o_totalprice) AS maxp, MIN(o_totalprice) AS minp
        |FROM orders WHERE o_totalprice > 1000.0
        |GROUP BY o_orderstatus ORDER BY _id""".stripMargin,

    "q12_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q13_unwind_wordcount" ->
      """SELECT word AS _id, CAST(COUNT(*) AS BIGINT) AS count
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY count DESC, _id LIMIT 50""".stripMargin,

    "q14_lookup" ->
      """SELECT o_orderkey, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q15_apm_rollup" ->
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS succeeded,
        |  CAST(SUM(CASE WHEN event_type <> 'error' THEN 0 ELSE 1 END) AS BIGINT) AS failed,
        |  CAST(SUM(event_id % 1000) AS BIGINT) AS duration_ns
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_backup" ->
      """SELECT event_id, user_id, ts FROM events
        |WHERE event_type = 'click'
        |ORDER BY ts DESC, event_id LIMIT 100""".stripMargin,
  )
}
