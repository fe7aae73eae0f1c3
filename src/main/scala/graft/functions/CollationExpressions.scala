package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Numeric-ordering collation key (Mongo `collation.numericOrdering`).
  *
  * The reference passes the collation document through to the server
  * (/root/reference/db/wrapper.go:452-481); here ordering happens in
  * Spark's sort, so "item10 after item2" must hold under the ordinary
  * binary comparison of a derived KEY. [[NumericKey.key]] rewrites every
  * maximal digit run into `\u0001` + length-prefix + digits-without-
  * leading-zeros: the marker makes numbers compare before letters (ICU's
  * digits-first primary order), the length prefix makes a shorter
  * (= smaller, zeros stripped) number sort first, and equal-length runs
  * compare digit-by-digit — so lexicographic order of keys IS numeric
  * order of runs. Zero-stripping also makes "007" collate equal to "7",
  * matching ICU's CODAN numeric comparison.
  *
  * The length prefix is a width char (`\u0001`–`\u0004` = how many
  * length chars follow) + that many base-256 chars from the
  * surrogate-free page U+0100–U+01FF, most-significant first, minimal
  * width. Width buckets carry disjoint value ranges, so lexicographic
  * order of (width, length chars) IS numeric order of run lengths for
  * EVERY possible Java string length — no clamp (a single char would
  * cap at 0xFFFF, collapsing longer runs into one bucket) and no lone
  * surrogates (chars 0xD800–0xDFFF would transcode to '?' inside
  * UTF8String and corrupt the ordering).
  *
  * [[NumericSortKey]] wraps the transform as a scalar Catalyst
  * expression (same static-call-from-codegen pattern as
  * [[PorterStem]]), so collated predicates and sort keys stay inside
  * whole-stage codegen and the plan shape is unchanged at scale.
  */
object NumericKey {

  private def appendRunLength(sb: java.lang.StringBuilder,
      len: Int): Unit = {
    val width =
      if (len < (1 << 8)) 1
      else if (len < (1 << 16)) 2
      else if (len < (1 << 24)) 3
      else 4
    sb.append(width.toChar)
    var w = width - 1
    while (w >= 0) {
      sb.append((0x0100 + ((len >>> (8 * w)) & 0xFF)).toChar)
      w -= 1
    }
  }

  /** Collation key whose binary order is numeric order on digit runs. */
  def key(s: String): String = {
    val n = s.length
    var i = 0
    var hasDigit = false
    while (i < n && !hasDigit) {
      val c = s.charAt(i)
      hasDigit = c >= '0' && c <= '9'
      i += 1
    }
    if (!hasDigit) return s // fast path: nothing to rewrite
    val sb = new java.lang.StringBuilder(n + 8)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && { val d = s.charAt(j); d >= '0' && d <= '9' }) j += 1
        var k = i
        while (k < j - 1 && s.charAt(k) == '0') k += 1 // strip leading 0s
        val len = j - k
        sb.append('\u0001')
        appendRunLength(sb, len)
        sb.append(s, k, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}

/** `numeric_sort_key(str)` — scalar Catalyst expression; null-safe,
  * codegen is one static call to [[NumericKey.key]]. */
case class NumericSortKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"numeric_sort_key expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NumericKey.key(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NumericKey.key($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

/** Unicode NFC normalization (Mongo `collation.normalization`).
  *
  * ICU collation normalizes input so canonically-equivalent strings
  * ("é" precomposed U+00E9 vs decomposed e + U+0301) collate equal.
  * This engine's fold tables ([[graft.query.Collation]]) are keyed on
  * PRECOMPOSED characters, so the faithful mapping of
  * `normalization: true` is composing the input to NFC before the
  * fold — decomposed input then hits the same translate tables as
  * precomposed. JDK `java.text.Normalizer` is the implementation
  * (public platform API, same canonical-composition tables ICU uses);
  * one static call inside whole-stage codegen. */
object NfcNormalizer {
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s,
      java.text.Normalizer.Form.NFC)) s // fast path: no allocation
    else java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC)
}

/** `nfc_normalize(str)` — scalar Catalyst expression; null-safe,
  * codegen is one static call to [[NfcNormalizer.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"nfc_normalize expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NfcNormalizer.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NfcNormalizer.nfc($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object CollationFunctions {
  /** Column-level numeric-ordering collation key. */
  def numeric_sort_key(c: Column): Column =
    ColumnBridge.column(NumericSortKey(ColumnBridge.expression(c)))

  /** Column-level NFC normalization. */
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
