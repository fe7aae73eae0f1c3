package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the standard pre-step for
  * cheap ANN / clustering / visualization at corpus scale (project 100 TB
  * of d-dim embeddings to k ≪ d dims once, then every downstream distance
  * computation is k/d the cost).
  *
  * Plan shape (the 100 TB concern): the only distributed pass is a
  * partition-local Gram accumulation — each partition folds its rows into
  * ONE (count, Σx, upper-triangular ΣxxT) accumulator of d(d+1)/2 + d + 1
  * doubles, and the driver reduces one accumulator per partition (the
  * RowMatrix.computeGramianMatrix shape from Spark MLlib: no shuffle, no
  * per-row d² expansion — mapPartitions is the genuine per-partition
  * imperative case here). The d×d covariance eigendecomposition is
  * driver-side Jacobi — d is an embedding dimension (tens to low
  * thousands), the matrix is tiny and the cost is independent of corpus
  * size, same contract as the k-row IVF centroid table
  * (Clustering.scala). Projection is scan-fused lambda algebra (zip_with
  * + aggregate) against literal component vectors — codegen'd, no join,
  * no shuffle.
  *
  * Determinism: partition Gram sums are IEEE-double adds, so components
  * are stable only to the last ulp across different partitionings — the
  * same caveat Spark MLlib carries. Downstream consumers should round
  * projected coordinates before hashing them (see q164's norm identity,
  * stable at 1e-6 because the eigenbasis is orthonormal regardless of
  * ulp-level Gram noise).
  */
object Pca {

  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], // k rows, each a d-vector
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** Fit the top-k principal components of `embCol` (population
    * covariance). k defaults to d (full orthonormal basis). */
  def fit(df: DataFrame, embCol: String, k: Int = Int.MaxValue): Model = {
    val vecs = df.select(col(embCol).cast("array<double>"))
      .where(col(embCol).isNotNull)
    // one accumulator per partition: [n, Σx (d), upper-tri ΣxxT d(d+1)/2]
    val (d, acc) = vecs.rdd
      .mapPartitions { it =>
        var st: Array[Double] = null
        var dd = 0
        it.foreach { row =>
          val x = row.getSeq[Double](0)
          if (st == null) {
            dd = x.length
            st = new Array[Double](1 + dd + dd * (dd + 1) / 2)
          }
          require(x.length == dd,
            s"pca: ragged embedding dim ${x.length} != $dd")
          st(0) += 1.0
          var i = 0
          var t = 1 + dd
          while (i < dd) {
            st(1 + i) += x(i)
            var j = i
            while (j < dd) { st(t) += x(i) * x(j); t += 1; j += 1 }
            i += 1
          }
        }
        if (st == null) Iterator.empty else Iterator.single((dd, st))
      }
      .reduce { (a, b) =>
        require(a._1 == b._1, s"pca: mixed embedding dims ${a._1}/${b._1}")
        val out = new Array[Double](a._2.length)
        var i = 0
        while (i < out.length) { out(i) = a._2(i) + b._2(i); i += 1 }
        (a._1, out)
      }
    val n = acc(0)
    require(n > 1, s"pca: need at least 2 rows, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    // covariance C = ΣxxT/n − μμT, symmetrized from the upper triangle
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = acc(t) / n - mean(i) * mean(j)
        cov(i)(j) = v; cov(j)(i) = v
        t += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(ix => -values(ix))
    val kk = math.min(k, d)
    val comps = order.take(kk).map { ix =>
      val v = Array.tabulate(d)(r => vectors(r)(ix))
      // canonical sign: the largest-|coordinate| entry is positive
      val m = v.indices.maxBy(a => math.abs(v(a)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.take(kk).map(values).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns matrix). O(d³) per sweep on the
    * driver, deterministic rotation order. */
  private[ops] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sgn = if (theta >= 0) 1.0 else -1.0
            val tTan = sgn / (math.abs(theta) +
              math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** PCA-accelerated ANN: candidates by L2 distance in the projected
    * space (k'·d multiply-adds per pair instead of d², and the coarse
    * compare reads k' doubles instead of d), exact cosine re-rank on the
    * full vectors. With nComponents = d the projection is a pure rotation,
    * so candidate generation is EXACTLY centered-L2 (= plain L2) order —
    * the oracle-verifiable configuration; smaller k' trades recall for
    * coarse-pass cost, the usual 100 TB move (project once, scan cheap).
    *
    * Plan: one fit pass; the corpus is scanned once, projected in the
    * scan, joined to the BROADCAST projected queries, and the coarse
    * top-(k·overfetch) per query goes through one window; the re-rank
    * reads the full vectors carried on the candidate rows — no second
    * join against the corpus. */
  def pcaTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nComponents: Int = 16,
      overfetch: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && overfetch > 0, "pcaTopK: k and overfetch must be > 0")
    val model = fit(corpus, vecCol, nComponents)
    val cp = Partitioning.ensureMinPartitions(
      project(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv")), "cv", model, "cpc"))
    val qp = project(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")), "qv", model, "qpc")
    // native codegen'd squared distance (r16): identical index-ordered
    // math to aggregate(zip_with(.., (a,b) => (a-b)*(a-b)), 0.0, _+_),
    // evaluated once per candidate pair — the interpreted-HOF form walked
    // 2 lambdas × k' elements per pair (the FloatVecDot rationale)
    val d2 = graft.functions.VectorFunctions.vec_sqdist(
      col("cpc"), col("qpc"))
    val coarseW = Window.partitionBy("query_id")
      .orderBy(col("__d2").asc, col("neighbor_id").asc)
    val cand = cp.join(broadcast(qp), col("query_id") =!= col("neighbor_id"))
      .withColumn("__d2", d2)
      .withColumn("__cr", row_number().over(coarseW))
      .where(col("__cr") <= k * overfetch)
    val rerankW = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    cand
      .withColumn("__cos", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(rerankW))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Scan-fused projection: outCol = [⟨x − μ, cᵢ⟩ for each component].
    * Literal model vectors fold into codegen — no join, no shuffle.
    * `whiten` divides each coordinate by √λᵢ, giving unit variance per
    * component (the usual preprocessing before cosine/Euclidean ANN or
    * k-means on projected vectors); zero-variance components stay zero
    * rather than dividing by ~0. */
  def project(df: DataFrame, embCol: String, model: Model,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val x = col(embCol).cast("array<double>")
    if (!whiten) {
      // ONE native plan node for the whole k×d projection (r16): the
      // per-coordinate aggregate(zip_with(centered, cLit)) trees carried
      // k copies of the centering subtree (CollapseProject inlines it),
      // so every row paid k·d interpreted HOF lambdas + k+1 array
      // allocations, and plan analysis walked k aggregate trees.
      // VecMatProject keeps the identical index-ordered fold arithmetic
      // and zip_with null semantics — see its scaladoc.
      df.withColumn(outCol, graft.functions.VectorFunctions
        .vec_mat_project(x, Some(model.mean.toSeq),
          model.components.map(_.toSeq).toSeq))
    } else {
      // whiten path (no declared query uses it): the original
      // per-coordinate form, typedlit literals (r15, plan-bloat fix)
      val muLit = typedlit(model.mean.toSeq)
      val centered = zip_with(x, muLit, (a, b) => a - b)
      val coords = model.components.zipWithIndex.map { case (comp, i) =>
        val cLit = typedlit(comp.toSeq)
        val raw = aggregate(zip_with(centered, cLit, (a, b) => a * b),
          lit(0.0), (acc, e) => acc + e)
        val ev = model.eigenvalues(i)
        if (ev > 1e-12) raw / lit(math.sqrt(ev)) else lit(0.0)
      }
      df.withColumn(outCol, array(coords: _*))
    }
  }
}
