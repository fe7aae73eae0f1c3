package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vec_dot

/** Scalar (int8) quantization of embedding columns — the standard 4×
  * memory/shuffle reduction for vector search at scale. Quantization is a
  * pure per-row `Column` transform (zero shuffle, fused into the scan) and
  * the quantized search path runs its candidate math entirely in small
  * integers (exact, engine-reproducible).
  *
  * Determinism contract: all arithmetic is double-precision IEEE with a
  * fixed operation order plus `floor(x + 0.5)` rounding (half away from
  * negative infinity), so any engine reproduces the codes bit-for-bit.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization: `scale = max|x| / 127`, code_i
    * = floor(x_i/scale + 0.5). Zero vectors quantize to all-zero codes with
    * scale 1.0. Adds `outCol` (array<int>, codes in [-127, 127]) and
    * `scaleCol` (double) so `x_i ≈ code_i * scale`. */
  def quantizeInt8(df: DataFrame, vecCol: String, outCol: String = "qvec",
      scaleCol: String = "qscale"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxabs = array_max(transform(v, x => abs(x)))
    val scale = when(maxabs > 0.0, maxabs / 127.0).otherwise(lit(1.0))
    df.withColumn(scaleCol, scale)
      .withColumn(outCol,
        transform(v, x => floor(x / col(scaleCol) + lit(0.5)).cast("int")))
  }

  /** Cosine of two quantized vectors: the per-vector scales cancel, so the
    * score is `dot(codesA, codesB) / (||codesA|| * ||codesB||)` — exact
    * integer dot/norms (int8 products summed in double stay exact far past
    * any realistic dimensionality). */
  private def quantCosine(dot: Column, nsqA: Column, nsqB: Column): Column =
    when(nsqA === 0.0 || nsqB === 0.0, lit(0.0))
      .otherwise(dot / (sqrt(nsqA) * sqrt(nsqB)))

  /** Exact top-k over int8-quantized vectors: quantize corpus + queries,
    * broadcast the (small) query side, stream the corpus once, rank by
    * quantized cosine with deterministic id tie-break. Same plan shape as
    * [[Similarity.bruteForceTopK]] but every candidate pair moves 1-byte
    * codes instead of 4-byte floats — the variant a 100 TB corpus scan
    * actually ships between stages.
    * Output: (query_id, neighbor_id, rank). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    def codes(df: DataFrame, id: String, v: String): DataFrame =
      quantizeInt8(df.select(col(idCol).as(id), col(vecCol)), vecCol, v)
        .withColumn(v, col(v).cast("array<double>"))
        .select(col(id), col(v), vec_dot(col(v), col(v)).as(v + "_n"))
    val c = Partitioning.ensureMinPartitions(codes(corpus, "neighbor_id", "cq"))
    val q = codes(queries, "query_id", "qq")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", quantCosine(vec_dot(col("qq"), col("cq")),
        col("qq_n"), col("cq_n")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
