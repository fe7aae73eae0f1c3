package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot registers as a SQL function") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(d == 11.0)
  }

  test("vec_dot Column API matches lambda math on float arrays") {
    val df = Seq((Array(1.0f, 0.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    val native = df.select(VectorFunctions.vec_dot($"a", $"b")).as[Double].head()
    val lambda = df.select(aggregate(zip_with($"a", $"b",
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)).as[Double].head()
    assert(native == lambda && native == 4.0)
  }

  test("vec_dot rejects non-array inputs") {
    // a fresh session: Spark 4 posts even failed ANALYSIS to the session
    // listener bus, and the shared session's ObservationManager listener
    // re-raises on such events, spamming ERROR into otherwise-green logs
    val s2 = spark.newSession()
    import s2.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorFunctions.vec_dot($"a", $"b")).schema
    }
  }

  test("Granularity.roundUp rounds to the series, fixed points stay") {
    val vals = Seq(0.0, 0.7, 1.0, 1.01, 1.6, 15.0, 29.0, 99.0, 100.0,
      716.0).toDF("v")
    def up(g: String): Seq[Double] = vals
      .select(Granularity.roundUp($"v", g)).as[Double].collect().toSeq
    assert(up("R5") ==
      Seq(0.0, 1.0, 1.0, 1.6, 1.6, 16.0, 40.0, 100.0, 100.0, 1000.0))
    assert(up("E6") ==
      Seq(0.0, 1.0, 1.0, 1.5, 2.2, 15.0, 33.0, 100.0, 100.0, 1000.0))
    assert(up("POWERSOF2") ==
      Seq(0.0, 1.0, 1.0, 2.0, 2.0, 16.0, 32.0, 128.0, 128.0, 1024.0))
  }

  test("Granularity negative input yields NaN, unknown series rejected") {
    val got = Seq(-3.0).toDF("v")
      .select(Granularity.roundUp($"v", "R10")).as[Double].head()
    assert(got.isNaN)
    intercept[IllegalArgumentException] {
      Granularity.roundUp(lit(1.0), "E192")
    }
  }

  test("quantizeInto rejects reserved __g_* columns instead of clobbering") {
    val ok = Granularity.quantizeInto(
      Seq(1.3).toDF("v"), $"v", "R10", "q")
    assert(ok.select("q").as[Double].head() == 1.6)
    intercept[IllegalArgumentException] {
      Granularity.quantizeInto(
        Seq((1.3, 7.0)).toDF("v", "__g_v"), $"v", "R10", "q")
    }
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Skew

  test("saltedJoin matches a plain join") {
    val left = (1 to 500).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "n")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = left.join(right, Seq("key")).select("key", "n", "tag")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "key", 8)
      .select("key", "n", "tag").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("saltedSumCount matches plain aggregation") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val plain = df.groupBy("g").agg(sum("v").as("sum"), count(lit(1)).as("count"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedSumCount(df, "g", "v", 8)
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
