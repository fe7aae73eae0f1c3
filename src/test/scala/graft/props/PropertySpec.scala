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

class DataPipelineOpsProps extends SparkSpec with GenSampling {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val genWords: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2"))

  test("tokenChunks covers every token exactly once at overlap 0") {
    for ((words, size) <- samples(
        Gen.zip(genWords, Gen.choose(1, 7)), 10) if words.nonEmpty) {
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.ops.Chunking
        .tokenChunks(df, "doc_id", "text", size)
        .orderBy("chunk_idx").select("chunk_text").as[String].collect()
      assert(chunks.flatMap(_.split(" ")).toSeq == words, s"size=$size")
    }
  }

  test("tokenChunks with overlap: consecutive chunks share the overlap") {
    for ((words, (size, ov)) <- samples(Gen.zip(genWords,
        Gen.choose(2, 7).flatMap(s =>
          Gen.choose(1, s - 1).map(o => (s, o)))), 10)
        if words.size >= 2) {
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.ops.Chunking
        .tokenChunks(df, "doc_id", "text", size, ov)
        .orderBy("chunk_idx").select("chunk_text").as[String].collect()
        .map(_.split(" ").toSeq)
      for (Seq(a, b) <- chunks.toSeq.sliding(2) if a.size == size)
        assert(a.takeRight(ov) == b.take(ov), s"size=$size ov=$ov")
      // reconstruction: drop each chunk's leading overlap, concat
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(ov))
      assert(rebuilt == words, s"size=$size ov=$ov")
    }
  }

  test("redactPii is idempotent on random pii-bearing text") {
    val genPii = Gen.oneOf("a@b.com", "123-45-6789", "555-123-4567",
      "10.0.0.1", "plain", "42")
    for (parts <- samples(Gen.listOfN(8, genPii), 10)) {
      val df = Seq(Tuple1(parts.mkString(" "))).toDF("t")
      val once = df.select(graft.ops.Redaction.redactPii(col("t")).as("r"))
      val twice = once.select(graft.ops.Redaction.redactPii(col("r")))
        .as[String].head()
      assert(twice == once.as[String].head(), s"parts=$parts")
    }
  }

  test("quantizeInt8 codes bounded and reconstruction within scale/2") {
    val genVec = Gen.listOfN(16, Gen.choose(-100.0f, 100.0f))
    for (vs <- samples(Gen.listOfN(5, genVec), 8)) {
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val rows = graft.ops.Quantize.quantizeInt8(df, "embedding")
        .select(col("embedding").cast("array<double>"), col("qvec"),
          col("qscale"))
        .as[(Seq[Double], Seq[Int], Double)].collect()
      for ((orig, codes, scale) <- rows) {
        assert(codes.forall(c => c >= -127 && c <= 127))
        for ((x, c) <- orig.zip(codes))
          assert(math.abs(x - c * scale) <= scale / 2 + 1e-9)
      }
    }
  }
}

class GeoProps extends SparkSpec with GenSampling {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  /** Reference even-odd ray cast (plain Scala), the independent oracle for
    * the compiled Column expression. */
  private def inPolyRef(x: Double, y: Double,
      ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var i = 0
    val n = ring.size
    while (i < n) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring((i + 1) % n)
      if (yi != yj && ((yi > y) != (yj > y)) &&
          x < (y - yi) * ((xj - xi) / (yj - yi)) + xi)
        inside = !inside
      i += 1
    }
    inside
  }

  test("pointInPolygon matches the scalar ray-cast on random polygons") {
    val coordGen = Gen.chooseNum(-10.0, 10.0)
    val ringGen = for {
      n <- Gen.chooseNum(3, 8)
      xs <- Gen.listOfN(n, coordGen)
      ys <- Gen.listOfN(n, coordGen)
    } yield xs.zip(ys)
    val points = samples(Gen.zip(coordGen, coordGen), 60)
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, Seq(x, y)) }
    val df = points.toDF("id", "loc").cache()
    try {
      for (ring <- samples(ringGen, 25)) {
        val got = df.where(graft.functions.Geo.pointInPolygon(
            col("loc").getItem(0), col("loc").getItem(1), ring))
          .select("id").as[Long].collect().toSet
        val want = points.collect {
          case (id, Seq(x, y)) if inPolyRef(x, y, ring) => id
        }.toSet
        assert(got == want, s"ring=$ring")
      }
    } finally { df.unpersist(); () }
  }

  test("pipeline-form $set with a literal ≡ classic $set for random preds") {
    import graft.update.UpdateCompiler
    val rows = (1L to 120L).map(i => (i, (i * 13 % 50).toDouble))
    val d = rows.toDF("_id", "v")
    for (thr <- samples(Gen.choose(0.0, 50.0), 8)) {
      val q = Map("v" -> Map("$gt" -> thr))
      val classic = UpdateCompiler.applyUpdate(d,
        QueryCompiler.compile(q), Map("$set" -> Map("tag" -> 1)))
        .select("_id", "tag").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
        .toMap
      val piped = UpdateCompiler.applyUpdatePipeline(d,
        QueryCompiler.compile(q),
        Seq(Map("$set" -> Map("tag" -> Map("$literal" -> 1)))))
        .select("_id", "tag").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
        .toMap
      assert(classic == piped, s"thr=$thr")
    }
  }

  test("PCA full-basis projection preserves pairwise distances") {
    import graft.ops.Pca
    for (seed <- samples(Gen.choose(1, 1000), 3)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 40).map(i =>
        (i.toLong, Array.fill(5)(rnd.nextGaussian())))
      val d = rows.toDF("id", "emb")
      val m = Pca.fit(d, "emb")
      val proj = Pca.project(d, "emb", m, "pc")
        .select("id", "pc").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      def d2(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val raw = rows.toMap
      for (i <- 0L until 10L; j <- (i + 1) until 10L) {
        val orig = d2(raw(i), raw(j))
        val rot = d2(proj(i), proj(j))
        assert(math.abs(orig - rot) < 1e-9, s"seed=$seed pair=($i,$j)")
      }
    }
  }
}
