package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Preferred-number rounding for `$bucketAuto`'s `granularity` option
  * (reference passes the stage through opaquely; Mongo semantics:
  * bucket boundaries must be members of the chosen series).
  *
  * We implement granularity as QUANTIZE-BEFORE-BOUNDARIES: every groupBy
  * value is rounded UP to the nearest series number first, and the
  * equal-count boundary computation then runs over the (small) distinct
  * quantized domain — so a near-unique continuous column never reaches
  * the distinct-value window unquantized, which is what makes
  * `$bucketAuto` safe at 100 TB. Documented divergence from Mongo: the
  * first bucket's `min` is the round-up of its smallest value, not the
  * round-down of the raw minimum.
  *
  * Pure `Column` math (codegen'd CASE chain): exponent via
  * `floor(log10(v))` with a mantissa-range correction, so a 1-ulp libm
  * difference in `log10` can never change the result — the identical
  * formula is mirrored in DuckDB by [[sqlCase]]. Input must be
  * non-negative (Mongo errors on negatives; we yield NaN).
  */
object Granularity {

  /** Series mantissas in [1, 10), ascending. Renard (ISO 3) and IEC 60063
    * E-series preferred numbers — public standard tables. */
  val series: Map[String, Seq[Double]] = {
    val r5 = Seq(1.0, 1.6, 2.5, 4.0, 6.3)
    val r10 = Seq(1.0, 1.25, 1.6, 2.0, 2.5, 3.15, 4.0, 5.0, 6.3, 8.0)
    val r20 = Seq(1.0, 1.12, 1.25, 1.4, 1.6, 1.8, 2.0, 2.24, 2.5, 2.8,
      3.15, 3.55, 4.0, 4.5, 5.0, 5.6, 6.3, 7.1, 8.0, 9.0)
    val r40 = Seq(1.0, 1.06, 1.12, 1.18, 1.25, 1.32, 1.4, 1.5, 1.6, 1.7,
      1.8, 1.9, 2.0, 2.12, 2.24, 2.36, 2.5, 2.65, 2.8, 3.0, 3.15, 3.35,
      3.55, 3.75, 4.0, 4.25, 4.5, 4.75, 5.0, 5.3, 5.6, 6.0, 6.3, 6.7,
      7.1, 7.5, 8.0, 8.5, 9.0, 9.5)
    val r80 = Seq(1.0, 1.03, 1.06, 1.09, 1.12, 1.15, 1.18, 1.22, 1.25,
      1.28, 1.32, 1.36, 1.4, 1.45, 1.5, 1.55, 1.6, 1.65, 1.7, 1.75, 1.8,
      1.85, 1.9, 1.95, 2.0, 2.06, 2.12, 2.18, 2.24, 2.3, 2.36, 2.43, 2.5,
      2.58, 2.65, 2.72, 2.8, 2.9, 3.0, 3.07, 3.15, 3.25, 3.35, 3.45,
      3.55, 3.65, 3.75, 3.87, 4.0, 4.12, 4.25, 4.37, 4.5, 4.62, 4.75,
      4.87, 5.0, 5.15, 5.3, 5.45, 5.6, 5.8, 6.0, 6.15, 6.3, 6.5, 6.7,
      6.9, 7.1, 7.3, 7.5, 7.75, 8.0, 8.25, 8.5, 8.75, 9.0, 9.25, 9.5,
      9.75)
    val e6 = Seq(1.0, 1.5, 2.2, 3.3, 4.7, 6.8)
    val e12 = Seq(1.0, 1.2, 1.5, 1.8, 2.2, 2.7, 3.3, 3.9, 4.7, 5.6, 6.8,
      8.2)
    val e24 = Seq(1.0, 1.1, 1.2, 1.3, 1.5, 1.6, 1.8, 2.0, 2.2, 2.4, 2.7,
      3.0, 3.3, 3.6, 3.9, 4.3, 4.7, 5.1, 5.6, 6.2, 6.8, 7.5, 8.2, 9.1)
    val e48 = Seq(1.0, 1.05, 1.1, 1.15, 1.21, 1.27, 1.33, 1.4, 1.47,
      1.54, 1.62, 1.69, 1.78, 1.87, 1.96, 2.05, 2.15, 2.26, 2.37, 2.49,
      2.61, 2.74, 2.87, 3.01, 3.16, 3.32, 3.48, 3.65, 3.83, 4.02, 4.22,
      4.42, 4.64, 4.87, 5.11, 5.36, 5.62, 5.9, 6.19, 6.49, 6.81, 7.15,
      7.5, 7.87, 8.25, 8.66, 9.09, 9.53)
    val e96 = Seq(1.0, 1.02, 1.05, 1.07, 1.1, 1.13, 1.15, 1.18, 1.21,
      1.24, 1.27, 1.3, 1.33, 1.37, 1.4, 1.43, 1.47, 1.5, 1.54, 1.58,
      1.62, 1.65, 1.69, 1.74, 1.78, 1.82, 1.87, 1.91, 1.96, 2.0, 2.05,
      2.1, 2.15, 2.21, 2.26, 2.32, 2.37, 2.43, 2.49, 2.55, 2.61, 2.67,
      2.74, 2.8, 2.87, 2.94, 3.01, 3.09, 3.16, 3.24, 3.32, 3.4, 3.48,
      3.57, 3.65, 3.74, 3.83, 3.92, 4.02, 4.12, 4.22, 4.32, 4.42, 4.53,
      4.64, 4.75, 4.87, 4.99, 5.11, 5.23, 5.36, 5.49, 5.62, 5.76, 5.9,
      6.04, 6.19, 6.34, 6.49, 6.65, 6.81, 6.98, 7.15, 7.32, 7.5, 7.68,
      7.87, 8.06, 8.25, 8.45, 8.66, 8.87, 9.09, 9.31, 9.53, 9.76)
    Map("R5" -> r5, "R10" -> r10, "R20" -> r20, "R40" -> r40,
      "R80" -> r80, "1-2-5" -> Seq(1.0, 2.0, 5.0), "E6" -> e6,
      "E12" -> e12, "E24" -> e24, "E48" -> e48, "E96" -> e96)
  }

  private def seriesFor(name: String): Seq[Double] =
    series.getOrElse(name, throw new IllegalArgumentException(
      s"unsupported granularity: $name (supported: " +
        s"${series.keys.toSeq.sorted.mkString(", ")}, POWERSOF2)"))

  /** [[roundUp]] staged through real projection columns: each libm
    * subexpression (log10, pow, the divisions) lands in its own column,
    * referenced multiple times downstream — Catalyst's CollapseProject
    * keeps non-cheap multi-referenced expressions staged, so every step
    * computes ONCE per row inside whole-stage codegen. The pure-Column
    * [[roundUp]] form either re-inlines the subtree per series branch
    * (when-chain) or falls out of codegen entirely (higher-order filter):
    * ~7 µs/row interpreted vs sub-µs staged. Use THIS form on hot paths
    * with DataFrame access ($bucketAuto does). */
  def quantizeInto(df: org.apache.spark.sql.DataFrame, v0: Column,
      granularity: String, as: String): org.apache.spark.sql.DataFrame =
    if (granularity == "POWERSOF2")
      df.withColumn(as, roundUp(v0, granularity)) // small tree already
    else {
      // the staging columns below would silently overwrite-and-drop a
      // user column of the same name (same guard as $addFields'
      // __graft_root_snapshot and clusterAwareSplit's cluster rep)
      require(!df.columns.exists(_.startsWith("__g_")),
        "quantizeInto: input has reserved __g_* staging columns: " +
          df.columns.filter(_.startsWith("__g_")).mkString(", "))
      val s = seriesFor(granularity)
      val v = col("__g_v")
      val m = col("__g_m")
      val mant = s.foldRight(lit(10.0): Column) { (step, acc) =>
        when(m <= step, step).otherwise(acc) // m is a cheap column ref here
      }
      df.withColumn("__g_v", v0.cast("double"))
        .withColumn("__g_k0", floor(log10(v)))
        .withColumn("__g_m0", v / pow(lit(10.0), col("__g_k0")))
        .withColumn("__g_k",
          when(col("__g_m0") >= 10.0, col("__g_k0") + 1)
            .when(col("__g_m0") < 1.0, col("__g_k0") - 1)
            .otherwise(col("__g_k0")))
        .withColumn("__g_p", pow(lit(10.0), col("__g_k")))
        .withColumn("__g_m", v / col("__g_p"))
        .withColumn(as,
          when(v === 0, 0.0).when(v < 0, Double.NaN)
            .otherwise(mant * col("__g_p")))
        .drop("__g_v", "__g_k0", "__g_m0", "__g_k", "__g_p", "__g_m")
    }

  /** Round `v` UP to the nearest member of the granularity series.
    * Zero maps to zero; negatives (a Mongo error) yield NaN. */
  def roundUp(v: Column, granularity: String): Column =
    if (granularity == "POWERSOF2") {
      // p = 2^ceil(log2 v), with ulp corrections so a libm wiggle in
      // log2 can never change the result
      val p0 = pow(lit(2.0), ceil(log(2.0, v)))
      val p = when(p0 < v, p0 * 2)
        .when(p0 / 2 >= v, p0 / 2)
        .otherwise(p0)
      when(v === 0, 0.0).when(v < 0, Double.NaN).otherwise(p)
    } else {
      val s = seriesFor(granularity)
      val k0 = floor(log10(v))
      val m0 = v / pow(lit(10.0), k0)
      // correct floor(log10) off-by-one (values within an ulp of a decade)
      val k = when(m0 >= 10.0, k0 + 1).when(m0 < 1.0, k0 - 1).otherwise(k0)
      val p = pow(lit(10.0), k)
      val m = v / p
      // smallest series member >= m via a lambda over an array literal:
      // the lambda binds m ONCE, so the expression tree stays O(|series|)
      // literals — a nested when-chain would re-inline the whole mantissa
      // subtree per branch and blow up analysis/codegen for E96-size series
      val mant = coalesce(
        get(filter(array(s.map(lit): _*), x => m <= x), lit(0)),
        lit(10.0))
      when(v === 0, 0.0).when(v < 0, Double.NaN).otherwise(mant * p)
    }

  /** The SAME rounding as [[roundUp]], rendered as DuckDB SQL over value
    * expression `vExpr` — used by oracle queries so both engines quantize
    * with bit-identical arithmetic. */
  def sqlCase(vExpr: String, granularity: String): String =
    if (granularity == "POWERSOF2") {
      val p0 = s"pow(2.0, ceil(log2($vExpr)))"
      s"""CASE WHEN $vExpr = 0 THEN 0.0 WHEN $vExpr < 0 THEN 'NaN'::DOUBLE
         | WHEN $p0 < $vExpr THEN $p0 * 2
         | WHEN $p0 / 2 >= $vExpr THEN $p0 / 2
         | ELSE $p0 END""".stripMargin.replace("\n", "")
    } else {
      val s = seriesFor(granularity)
      val k0 = s"floor(log10($vExpr))"
      val m0 = s"($vExpr / pow(10.0, $k0))"
      val k = s"(CASE WHEN $m0 >= 10.0 THEN $k0 + 1 " +
        s"WHEN $m0 < 1.0 THEN $k0 - 1 ELSE $k0 END)"
      val p = s"pow(10.0, $k)"
      val m = s"($vExpr / $p)"
      // same lambda-over-series shape as roundUp: m referenced once
      val arr = s.mkString("[", ", ", "]")
      val mant = s"COALESCE(list_filter($arr, x -> $m <= x)[1], 10.0)"
      s"CASE WHEN $vExpr = 0 THEN 0.0 WHEN $vExpr < 0 THEN 'NaN'::DOUBLE " +
        s"ELSE ($mant) * $p END"
    }
}
