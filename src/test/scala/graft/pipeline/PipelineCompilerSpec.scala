package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def sales = Seq(
    ("a", 1, 10.0, Seq("x", "y")),
    ("a", 2, 20.0, Seq("y")),
    ("b", 3, 30.0, Seq.empty[String]),
    ("b", 4, 40.0, Seq("z"))).toDF("cat", "n", "amt", "tags")

  private def run(stages: Map[String, Any]*) =
    PipelineCompiler.compile(stages)(sales)

  test("$match + $group accumulators") {
    val out = run(
      Map("$match" -> Map("amt" -> Map("$gte" -> 20.0))),
      Map("$group" -> Map("_id" -> "$cat",
        "total" -> Map("$sum" -> "$amt"),
        "cnt" -> Map("$sum" -> 1),
        "top" -> Map("$max" -> "$n"))),
      Map("$sort" -> Map("_id" -> 1)))
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getLong(2), r.getInt(3))).toSeq ==
      Seq(("a", 20.0, 1L, 2), ("b", 70.0, 2L, 4)))
  }

  test("$group _id null = global aggregation") {
    val out = run(Map("$group" -> Map("_id" -> null,
      "s" -> Map("$sum" -> "$amt"))))
    assert(out.select("s").as[Double].head() == 100.0)
  }

  test("embedded-doc literal builds a struct; dotted paths resolve into it") {
    val out = run(
      Map("$addFields" -> Map("nested" -> Map("c" -> "$cat", "n2" ->
        Map("$multiply" -> Seq("$n", 2))))),
      Map("$match" -> Map("nested.c" -> "a",
        "nested.n2" -> Map("$gte" -> 4))),
      Map("$project" -> Map("n" -> 1)))
    assert(out.as[Int].collect().toSeq == Seq(2))
  }

  test("$group with only _id is the distinct idiom") {
    val out = run(Map("$group" -> Map("_id" -> "$cat")),
      Map("$sort" -> Map("_id" -> 1)))
    assert(out.columns.toSeq == Seq("_id"))
    assert(out.as[String].collect().toSeq == Seq("a", "b"))
    val compound = run(
      Map("$group" -> Map("_id" -> Map("c" -> "$cat"))))
    assert(compound.select("_id.c").distinct().count() == 2)
    assert(compound.count() == 2)
  }

  test("$group compound _id struct") {
    val out = run(Map("$group" -> Map(
      "_id" -> Map("c" -> "$cat", "parity" -> Map("$mod" -> Seq("$n", 2))),
      "cnt" -> Map("$count" -> Map.empty))))
    assert(out.count() == 4)
    assert(out.schema("_id").dataType.typeName == "struct")
  }

  test("$project include / exclude / computed") {
    assert(run(Map("$project" -> Map("cat" -> 1, "n" -> 1))).columns.toSeq
      == Seq("cat", "n"))
    assert(run(Map("$project" -> Map("tags" -> 0))).columns.toSeq
      == Seq("cat", "n", "amt"))
    val computed = run(Map("$project" -> Map(
      "cat" -> 1, "double_amt" -> Map("$multiply" -> Seq("$amt", 2)))))
    assert(computed.where($"cat" === "b").agg(sum("double_amt"))
      .as[Double].head() == 140.0)
  }

  test("$unwind explodes and drops empties") {
    val out = run(Map("$unwind" -> "$tags"))
    assert(out.count() == 4) // "b",3 row with [] disappears
    assert(out.where($"tags" === "y").count() == 2)
  }

  test("$sort / $limit / $skip") {
    val out = run(Map("$sort" -> Map("amt" -> -1)), Map("$skip" -> 1),
      Map("$limit" -> 2))
    assert(out.select("n").as[Int].collect().toSeq == Seq(3, 2))
  }

  test("$count") {
    assert(run(Map("$count" -> "total")).select("total").as[Long].head() == 4)
  }

  test("$sortByCount") {
    val out = run(Map("$unwind" -> "$tags"), Map("$sortByCount" -> "$tags"))
    assert(out.head().getString(0) == "y")
    assert(out.head().getLong(1) == 2)
  }

  test("$lookup + $unwind flattens a join") {
    val dims = Seq(("a", "Alpha"), ("b", "Beta")).toDF("key", "label")
    val out = PipelineCompiler.compile(Seq(
      Map("$lookup" -> Map("from" -> "dims", "localField" -> "cat",
        "foreignField" -> "key", "as" -> "d")),
      Map("$unwind" -> "$d"),
      Map("$project" -> Map("n" -> 1, "label" -> "$d.label"))),
      tables = { case "dims" => dims })(sales)
    assert(out.where($"label" === "Beta").select("n").as[Int]
      .collect().sorted.toSeq == Seq(3, 4))
  }

  test("$lookup keeps unmatched rows with empty arrays") {
    val dims = Seq(("a", "Alpha")).toDF("key", "label")
    val out = PipelineCompiler.compile(Seq(
      Map("$lookup" -> Map("from" -> "dims", "localField" -> "cat",
        "foreignField" -> "key", "as" -> "d"))),
      tables = { case "dims" => dims })(sales)
    assert(out.where($"cat" === "b").select(size($"d")).as[Int]
      .collect().toSeq == Seq(0, 0))
  }

  test("$addFields + expression language") {
    val out = run(Map("$addFields" -> Map(
      "label" -> Map("$cond" -> Seq(Map("$gte" -> Seq("$amt", 25.0)),
        "big", "small")),
      "upper" -> Map("$toUpper" -> "$cat"))))
    assert(out.where($"label" === "big").count() == 2)
    assert(out.select("upper").as[String].collect().toSet == Set("A", "B"))
  }

  test("$replaceRoot") {
    val nested = sales.select(struct($"cat", $"n").as("sub"))
    val out = PipelineCompiler.compile(Seq(
      Map("$replaceRoot" -> Map("newRoot" -> "$sub"))))(nested)
    assert(out.columns.toSeq == Seq("cat", "n"))
  }

  test("unsupported stage rejected") {
    intercept[IllegalArgumentException] { run(Map("$facet" -> Map.empty)) }
  }
}

class SampleStageSpec extends graft.SparkSpec {
  import spark.implicits._
  test("$sample is deterministic for a fixed seed and bounded by size") {
    val df = (1 to 100).toDF("n")
    val s1 = PipelineCompiler.compile(Seq(Map("$sample" ->
      Map("size" -> 5, "seed" -> 7))))(df).select("n").as[Int].collect().toSeq
    val s2 = PipelineCompiler.compile(Seq(Map("$sample" ->
      Map("size" -> 5, "seed" -> 7))))(df).select("n").as[Int].collect().toSeq
    assert(s1 == s2 && s1.size == 5)
  }
}

class BucketStageSpec extends graft.SparkSpec {
  import spark.implicits._
  test("$bucket groups into boundary buckets with default") {
    val df = Seq(5.0, 15.0, 25.0, 95.0).toDF("v")
    val out = PipelineCompiler.compile(Seq(
      Map("$bucket" -> Map("groupBy" -> "$v",
        "boundaries" -> Seq(0.0, 10.0, 30.0),
        "default" -> "other",
        "n" -> Map("$sum" -> 1))),
      Map("$sort" -> Map("_id" -> 1))))(df)
    val rows = out.collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    assert(rows == Seq(("0.0", 1L), ("10.0", 2L), ("other", 1L)))
  }
}

class ExprLangSpec extends graft.SparkSpec {
  import spark.implicits._
  private def df = Seq(("2024-03-15 10:30:00", 25.0), ("2024-07-01 08:00:00", 5.0))
    .toDF("ts", "v").withColumn("ts", $"ts".cast("timestamp"))

  test("$switch with default") {
    val out = PipelineCompiler.compile(Seq(Map("$addFields" -> Map(
      "band" -> Map("$switch" -> Map(
        "branches" -> Seq(
          Map("case" -> Map("$gte" -> Seq("$v", 20.0)), "then" -> "high"),
          Map("case" -> Map("$gte" -> Seq("$v", 10.0)), "then" -> "mid")),
        "default" -> "low"))))))(df)
    assert(out.select("band").as[String].collect().toSeq == Seq("high", "low"))
  }

  test("$dateToString and $dateTrunc") {
    val out = PipelineCompiler.compile(Seq(Map("$addFields" -> Map(
      "day" -> Map("$dateToString" -> Map("date" -> "$ts", "format" -> "%Y-%m-%d")),
      "mon" -> Map("$dateTrunc" -> Map("date" -> "$ts", "unit" -> "month"))))))(df)
    assert(out.select("day").as[String].head() == "2024-03-15")
    assert(out.select("mon").as[java.sql.Timestamp].head().toString
      .startsWith("2024-03-01"))
  }

  test("type conversions and $trim") {
    val out = PipelineCompiler.compile(Seq(Map("$addFields" -> Map(
      "s" -> Map("$toString" -> "$v"),
      "i" -> Map("$toInt" -> "$v"),
      "t" -> Map("$trim" -> Map("input" -> Map("$literal" -> "  x  ")))))))(df)
    val r = out.select("s", "i", "t").head()
    assert(r.getString(0) == "25.0" && r.getInt(1) == 25 && r.getString(2) == "x")
  }
}
