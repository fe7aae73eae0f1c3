package graft.ops

import org.apache.spark.sql.functions._

class PcaSpec extends graft.SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen recovers an analytic spectrum") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1 with vectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12) // same sign, equal components
  }

  test("fit: orthonormal components, descending eigenvalues, axis-aligned fixture") {
    // variance 25 along x, 1 along y, uncorrelated → PC1 = ±e_x
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)(Array(rnd.nextGaussian() * 5.0,
      rnd.nextGaussian() * 1.0, 0.0))
    val df = rows.map(Tuple1(_)).toDF("emb")
    val m = Pca.fit(df, "emb")
    assert(m.d == 3 && m.k == 3)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    // orthonormal basis
    for (i <- m.components.indices; j <- i until m.k) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m.components(i), m.components(j)) - expect) < 1e-9,
        s"dot($i,$j)")
    }
    // PC1 is the x axis (canonical sign makes it +e_x)
    assert(math.abs(m.components(0)(0) - 1.0) < 0.01)
    assert(math.abs(m.eigenvalues(0) - 25.0) < 3.0)
    // zero-variance third axis has ~0 eigenvalue
    assert(math.abs(m.eigenvalues(2)) < 1e-9)
  }

  test("project: scan-fused, norm-preserving under the full basis") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(Array.fill(8)(rnd.nextGaussian()))
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
    val m = Pca.fit(df, "emb")
    val out = Pca.project(df, "emb", m, "pc")
    // full-basis projection preserves centered squared norm
    val rowsOut = out.select(col("id"), col("emb"), col("pc")).collect()
    rowsOut.foreach { r =>
      val x = r.getSeq[Double](1).toArray
      val p = r.getSeq[Double](2).toArray
      val cx = x.zip(m.mean).map { case (a, b) => a - b }
      assert(math.abs(dot(cx, cx) - dot(p, p)) < 1e-9)
    }
    // no join/shuffle in the projection plan
    val plan = Pca.project(df, "emb", m, "pc")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
    // variance along PC1 ≈ top eigenvalue (population variance)
    val pc1 = rowsOut.map(_.getSeq[Double](2).head)
    val v1 = pc1.map(a => a * a).sum / pc1.length
    assert(math.abs(v1 - m.eigenvalues(0)) < 1e-6)
  }

  test("whitened projection has ~unit variance per component") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(500)(Array(rnd.nextGaussian() * 9.0,
      rnd.nextGaussian() * 2.0, 0.0))
    val df = rows.map(Tuple1(_)).toDF("emb")
    val m = Pca.fit(df, "emb")
    val w = Pca.project(df, "emb", m, "pc", whiten = true)
      .select("pc").collect().map(_.getSeq[Double](0))
    for (i <- 0 until 2) {
      val v = w.map(p => p(i) * p(i)).sum / w.length
      assert(math.abs(v - 1.0) < 1e-6, s"component $i variance $v")
    }
    // zero-variance component stays zero, not NaN
    assert(w.forall(p => p(2) == 0.0))
  }

  test("pcaTopK: high recall vs brute force; exact when candidates cover") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id",
      "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // overfetch spanning the corpus → identical to brute force
    val full = Pca.pcaTopK(df, queries, "vec_id", "embedding", 5,
      nComponents = 12, overfetch = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
    // truncated projection + moderate overfetch → recall ≥ 0.8
    val approx = Pca.pcaTopK(df, queries, "vec_id", "embedding", 5,
      nComponents = 6, overfetch = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("fit is invariant to repartitioning up to tiny float noise") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)(Array.fill(6)(rnd.nextGaussian()))
    val df = rows.map(Tuple1(_)).toDF("emb")
    val a = Pca.fit(df.repartition(1), "emb")
    val b = Pca.fit(df.repartition(7), "emb")
    a.eigenvalues.zip(b.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9)
    }
    a.components.zip(b.components).foreach { case (u, v) =>
      assert(math.abs(math.abs(dot(u, v)) - 1.0) < 1e-9)
    }
  }
}
