package graft.props

import graft.SparkSpec
import graft.query.QueryCompiler
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (raw ScalaCheck generators, deterministic seeds).
  *
  * 1. QueryCompiler vs reference semantics: for random thresholds/sets the
  *    compiled predicate must select exactly the rows a plain Scala filter
  *    selects (the compiler is a pure function of the query document).
  * 2. Randomized nested-document round-trip (the reference's backup fuzz
  *    idiom, /root/reference/backup/backup_test.go:44-86): write nested
  *    rows to parquet, read back, compare counts and structure.
  */
trait GenSampling {
  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))
}

class QueryCompilerProps extends SparkSpec with GenSampling {
  import spark.implicits._

  private lazy val rows: Seq[(Long, Double, String)] =
    (1L to 200L).map(i => (i, (i * 37 % 100).toDouble, s"c${i % 7}"))
  private lazy val df = rows.toDF("_id", "v", "cat").cache()

  test("compiled $gt/$lte selects exactly the Scala-filtered rows") {
    for ((lo, hi) <- samples(Gen.zip(Gen.choose(0.0, 100.0),
        Gen.choose(0.0, 100.0)), 15)) {
      val expected = rows.filter(r => r._2 > lo && r._2 <= hi).map(_._1).toSet
      val got = df.where(QueryCompiler.compile(Map(
        "v" -> Map("$gt" -> lo, "$lte" -> hi)))).select("_id")
        .as[Long].collect().toSet
      assert(got == expected, s"lo=$lo hi=$hi")
    }
  }

  test("compiled $in matches set membership") {
    for (cats <- samples(Gen.nonEmptyListOf(
        Gen.choose(0, 8).map(i => s"c$i")), 15)) {
      val expected = rows.filter(r => cats.contains(r._3)).map(_._1).toSet
      val got = df.where(QueryCompiler.compile(Map(
        "cat" -> Map("$in" -> cats)))).select("_id").as[Long].collect().toSet
      assert(got == expected, s"cats=$cats")
    }
  }

  test("$or is the union of branch matches") {
    for ((t, c) <- samples(Gen.zip(Gen.choose(0.0, 100.0),
        Gen.choose(0, 6)), 15)) {
      val expected = rows.filter(r => r._2 < t || r._3 == s"c$c").map(_._1).toSet
      val got = df.where(QueryCompiler.compile(Map("$or" -> Seq(
        Map("v" -> Map("$lt" -> t)), Map("cat" -> s"c$c")))))
        .select("_id").as[Long].collect().toSet
      assert(got == expected, s"t=$t c=$c")
    }
  }
}

// top-level so Spark can derive Encoders without outer-scope capture
case class Inner(k_int: Long, k_float: Double, first: Seq[Long])
case class Doc(_id: Long, k_int: Long, k_float: Double,
    first: Seq[Long], second: Option[Inner])

class NestedRoundTripProps extends SparkSpec with GenSampling {
  import spark.implicits._

  private val genInner = for {
    i <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    f <- Gen.choose(-1e12, 1e12)
    arr <- Gen.listOf(Gen.choose(-1000L, 1000L))
  } yield Inner(i, f, arr)

  private val genDoc = for {
    id <- Gen.choose(0L, Long.MaxValue / 2)
    i <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    f <- Gen.choose(-1e12, 1e12)
    arr <- Gen.listOf(Gen.choose(-1000L, 1000L))
    sub <- Gen.option(genInner)
  } yield Doc(id, i, f, arr, sub)

  test("randomized nested documents round-trip through parquet intact") {
    for (docs <- samples(Gen.listOfN(30, genDoc), 5) if docs.nonEmpty) {
      val path = java.nio.file.Files
        .createTempDirectory("graft-prop").toString + "/docs"
      docs.toDF().write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path).as[Doc].collect()
      assert(back.length == docs.length)
      assert(back.sortBy(d => (d._id, d.k_int)).toSeq ==
        docs.sortBy(d => (d._id, d.k_int)))
    }
  }
}
