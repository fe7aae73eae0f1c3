package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", Seq(1, 2, 3, 4, 5), 10.0),
    (2L, "b", Seq(9), 20.0),
    (3L, "c", Seq.empty[Int], 30.0)
  ).toDF("_id", "name", "arr", "score")

  test("inclusion doc keeps _id plus listed fields, in schema order") {
    val out = ProjectionCompiler.project(df, Map("score" -> 1, "name" -> true))
    assert(out.columns.toSeq == Seq("_id", "name", "score"))
  }

  test("_id: 0 drops _id from an inclusion projection") {
    val out = ProjectionCompiler.project(df, Map("name" -> 1, "_id" -> 0))
    assert(out.columns.toSeq == Seq("name"))
  }

  test("exclusion doc keeps everything else") {
    val out = ProjectionCompiler.project(df, Map("arr" -> 0, "score" -> false))
    assert(out.columns.toSeq == Seq("_id", "name"))
  }

  test("mixed inclusion/exclusion rejected (except _id)") {
    intercept[IllegalArgumentException] {
      ProjectionCompiler.project(df, Map("name" -> 1, "score" -> 0))
    }
  }

  private lazy val nested = Seq(
    (1L, ("x", (10.0, "A")), "k"),
    (2L, ("y", (20.0, "B")), "l"))
    .toDF("_id", "raw", "tag")
    .withColumn("info", struct($"raw._1".as("name"),
      struct($"raw._2._1".as("bal"), $"raw._2._2".as("seg")).as("acct")))
    .drop("raw")

  test("dotted inclusion rebuilds the struct with only selected members, " +
      "in the underlying schema's field order") {
    // projection doc lists acct.seg BEFORE name; output must still follow
    // the struct's own (name, acct) order, like Mongo document order
    val out = ProjectionCompiler.project(nested,
      Map("info.acct.seg" -> 1, "info.name" -> 1))
    assert(out.columns.toSeq == Seq("_id", "info"))
    val r = out.orderBy("_id").select("info").head()
    val info = r.getStruct(0)
    assert(info.schema.fieldNames.toSeq == Seq("name", "acct"))
    assert(info.getStruct(1).schema.fieldNames.toSeq == Seq("seg"))
    assert(info.getStruct(1).getString(0) == "A" &&
      info.getString(0) == "x")
  }

  test("dotted $slice rewrites just that member inside the struct") {
    val sdf = Seq((1L, (Seq(1, 2, 3, 4), "k")), (2L, (Seq(9), "l")))
      .toDF("_id", "raw")
      .withColumn("info", struct($"raw._1".as("arr"), $"raw._2".as("tag")))
      .drop("raw")
    val out = ProjectionCompiler.project(sdf,
      Map("info.arr" -> Map("$slice" -> 2)))
    assert(out.columns.toSeq == Seq("_id", "info"))
    val rows = out.orderBy("_id").collect()
    assert(rows(0).getStruct(1).getSeq[Int](0) == Seq(1, 2))
    assert(rows(0).getStruct(1).getString(1) == "k") // other member kept
    assert(rows(1).getStruct(1).getSeq[Int](0) == Seq(9))
  }

  test("dotted operator/exclusion collisions reject; nested $elemMatch rejects") {
    intercept[IllegalArgumentException] { // $slice top + dotted exclusion
      ProjectionCompiler.project(nested,
        Map("info" -> Map("$slice" -> 1), "info.name" -> 0))
    }
    intercept[IllegalArgumentException] { // server parity
      ProjectionCompiler.project(nested,
        Map("info.name" -> Map("$elemMatch" -> Map("$gt" -> 1))))
    }
  }

  test("dotted exclusion drops just the struct member") {
    val out = ProjectionCompiler.project(nested, Map("info.acct.bal" -> 0))
    assert(out.columns.toSeq == Seq("_id", "tag", "info"))
    val fields = out.schema("info").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(fields.fieldNames.toSeq == Seq("name", "acct"))
    assert(fields("acct").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("seg"))
  }

  test("dotted paths: collisions and mixing reject") {
    intercept[IllegalArgumentException] { // whole field + member
      ProjectionCompiler.project(nested,
        Map("info" -> 1, "info.name" -> 1))
    }
    intercept[IllegalArgumentException] { // member + deeper member
      ProjectionCompiler.project(nested,
        Map("info.acct" -> 1, "info.acct.seg" -> 1))
    }
    intercept[IllegalArgumentException] { // dotted exclusion in inclusion
      ProjectionCompiler.project(nested,
        Map("tag" -> 1, "info.name" -> 0))
    }
  }

  test("$slice positive / negative / [skip, limit] forms") {
    def arrs(doc: Map[String, Any]): Map[Long, Seq[Int]] =
      ProjectionCompiler.project(df, doc ++ Map("_id" -> 1))
        .select("_id", "arr").as[(Long, Seq[Int])].collect().toMap
    val first2 = arrs(Map("arr" -> Map("$slice" -> 2)))
    assert(first2(1L) == Seq(1, 2) && first2(2L) == Seq(9) &&
      first2(3L) == Seq())
    val last2 = arrs(Map("arr" -> Map("$slice" -> -2)))
    assert(last2(1L) == Seq(4, 5) && last2(2L) == Seq(9) && last2(3L) == Seq())
    val mid = arrs(Map("arr" -> Map("$slice" -> Seq(1, 2))))
    assert(mid(1L) == Seq(2, 3) && mid(2L) == Seq() && mid(3L) == Seq())
    val fromEnd = arrs(Map("arr" -> Map("$slice" -> Seq(-3, 2))))
    assert(fromEnd(1L) == Seq(3, 4))
    // negative skip beyond length clamps to the start (Mongo semantics)
    assert(fromEnd(2L) == Seq(9))
  }

  test("$slice alone keeps all other fields (exclusion-like mode)") {
    val out = ProjectionCompiler.project(df, Map("arr" -> Map("$slice" -> 1)))
    assert(out.columns.toSeq == Seq("_id", "name", "arr", "score"))
    // and composes with an exclusion
    val out2 = ProjectionCompiler.project(df,
      Map("arr" -> Map("$slice" -> 1), "score" -> 0))
    assert(out2.columns.toSeq == Seq("_id", "name", "arr"))
  }

  test("$elemMatch projection: first match as 1-element array, null if none") {
    val out = ProjectionCompiler.project(df,
      Map("_id" -> 1, "arr" -> Map("$elemMatch" -> Map("$gte" -> 3))))
      .select("_id", "arr").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Int](1))).toMap
    assert(out(1L).contains(Seq(3)))
    assert(out(2L).contains(Seq(9)))
    assert(out(3L).isEmpty)
  }

  test("$elemMatch over struct elements with field conditions") {
    val sdf = Seq(
      (1L, Seq((1, "x"), (7, "y"))),
      (2L, Seq((2, "x")))
    ).toDF("_id", "items")
      .withColumn("items", col("items").cast(
        "array<struct<score:int,kind:string>>"))
    val out = ProjectionCompiler.project(sdf,
      Map("_id" -> 1, "items" -> Map("$elemMatch" ->
        Map("score" -> Map("$gt" -> 5), "kind" -> "y"))))
      .select("_id", "items").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[org.apache.spark.sql.Row](1)))
      .toMap
    assert(out(1L).get.map(_.getInt(0)) == Seq(7))
    assert(out(2L).isEmpty)
  }

  test("query-side $elemMatch accepts field-condition docs too") {
    val sdf = Seq(
      (1L, Seq((1, "x"), (7, "y"))),
      (2L, Seq((2, "x")))
    ).toDF("_id", "items")
      .withColumn("items", col("items").cast(
        "array<struct<score:int,kind:string>>"))
    val hits = sdf.where(QueryCompiler.compile(Map("items" ->
      Map("$elemMatch" -> Map("score" -> Map("$gt" -> 5), "kind" -> "y")))))
      .select("_id").as[Long].collect().toSeq
    assert(hits == Seq(1L))
  }

  test("wired through GraftQuery.select(doc)") {
    val sf = "/root/testdata/sf0.001"
    val out = new graft.db.GraftSession(spark, sf).db("t").c("embeddings")
      .find(Map("vec_id" -> Map("$lt" -> 10)))
      .select(Map("label" -> 0, "embedding" -> Map("$slice" -> 2)))
      .toDF
    assert(out.columns.toSeq == Seq("vec_id", "embedding"))
    assert(out.select(max(size(col("embedding")))).head().getInt(0) <= 2)
  }
}
