package graft.ops

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 2000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(df, "id", 0.2).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", 0.2).select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size > 300 && a.size < 500) // ~400 expected
  }

  test("membership is monotone in the fraction (stable splits)") {
    val small = Sampling.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    val big = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratified fractions apply per class") {
    val out = Sampling.stratifiedHashSample(df, "id", "lang",
      Map("en" -> 0.0), defaultFraction = 1.0)
    assert(out.where($"lang" === "en").count() == 0)
    assert(out.where($"lang" === "de").count() == 1500)
  }

  test("trainTestSplit partitions without overlap") {
    val (train, test) = Sampling.trainTestSplit(df, "id", 0.25)
    assert(train.count() + test.count() == 2000)
    assert(train.join(test, "id").count() == 0)
    val t2 = Sampling.trainTestSplit(df, "id", 0.25)._2
    assert(test.select("id").as[Long].collect().toSet ==
      t2.select("id").as[Long].collect().toSet)
  }

  test("salt changes the sample") {
    val a = Sampling.hashSample(df, "id", 0.2, "s1").select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", 0.2, "s2").select("id").as[Long].collect().toSet
    assert(a != b)
  }
}
