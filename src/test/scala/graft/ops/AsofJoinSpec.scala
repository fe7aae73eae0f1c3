package graft.ops

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 15L, "e3"), (3L, 5L, "e4"))
    .toDF("k", "ts", "ev")
  private def right = Seq(
    (1L, 10L, "snapA"), (1L, 15L, "snapB"), (2L, 1L, "snapC"))
    .toDF("k", "ts", "snap")

  test("backward as-of attaches the latest right row at or before ts") {
    val out = AsofJoin.backward(left, right, "k", "ts", "ts", Seq("snap"))
      .orderBy("k", "ts")
      .select("ev", "snap").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(out == Seq(
      ("e1", Some("snapA")), // inclusive: same-instant snapshot visible
      ("e2", Some("snapB")),
      ("e3", Some("snapC")),
      ("e4", None)))         // no prior snapshot -> null (left join)
  }

  test("left columns are preserved verbatim") {
    val out = AsofJoin.backward(left, right, "k", "ts", "ts", Seq("snap"))
    assert(out.columns.toSeq == Seq("k", "ts", "ev", "snap"))
    assert(out.count() == 4)
  }

  test("whole-row semantics: nulls in the latest snapshot are preserved") {
    val l = Seq((1L, 30L, "e")).toDF("k", "ts", "ev")
    val r = Seq((1L, 10L, Option("old"), Option(5L)),
      (1L, 20L, Option.empty[String], Option(7L)))
      .toDF("k", "ts", "snap", "num")
    val row = AsofJoin.backward(l, r, "k", "ts", "ts", Seq("snap", "num"))
      .collect()(0)
    // the latest right row (ts=20) has snap=null: a per-column
    // last(ignoreNulls) would resurrect "old" from ts=10 and mix rows;
    // whole-row carry keeps (null, 7) from the single latest row
    assert(row.getAs[String]("snap") == null)
    assert(row.getAs[Long]("num") == 7L)
  }

  test("clashing value columns rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right, "k", "ts", "ts", Seq("ev"))
    }
  }
}
