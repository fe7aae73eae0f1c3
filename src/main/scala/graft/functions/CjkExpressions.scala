package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lucene CJKAnalyzer-style bigram tokenization for `lucene.cjk`.
  *
  * Chinese/Japanese text has no word separators, so the
  * `[^\p{L}\p{N}]+` split every other analyzer uses keeps an entire
  * clause as ONE token and `$search`/`$text` silently return near-empty
  * results on a CJK corpus. Lucene's published answer (CJKAnalyzer =
  * StandardTokenizer + CJKBigramFilter) is overlapping character
  * bigrams: each run of adjacent Han / Hiragana / Katakana / Hangul
  * code points emits every adjacent pair as a term (an isolated single
  * CJK character survives as a unigram), while non-CJK runs tokenize as
  * ordinary lowercased alphanumeric words minus the analyzer's classic
  * English stop set. Query and index sides share one static function,
  * so they can never disagree. The reference delegates all analysis to
  * the Atlas server (/root/reference/db/wrapper.go:88-94).
  *
  * Shape contract (the [[FrenchSnowball]] family's): a pure static
  * function wrapped by a scalar Catalyst expression whose generated
  * code is ONE static call — the tokenization stays inside whole-stage
  * codegen and adds no shuffle.
  */
object CjkTokenizer {

  /** Han / Hiragana / Katakana / Hangul — the script set Lucene's
    * CJKBigramFilter bigram-joins by default (astral Extension B+
    * ideographs included; matching runs per CODE POINT, so surrogate
    * pairs bigram as one character). */
  def isCjk(cp: Int): Boolean =
    (cp >= 0x1100 && cp <= 0x11FF) || // hangul jamo
    (cp >= 0x2E80 && cp <= 0x2FDF) || // CJK radicals + kangxi
    (cp >= 0x3040 && cp <= 0x30FF) || // hiragana + katakana
    (cp >= 0x3130 && cp <= 0x318F) || // hangul compat jamo
    (cp >= 0x31F0 && cp <= 0x31FF) || // katakana phonetic ext
    (cp >= 0x3400 && cp <= 0x4DBF) || // ideograph ext A
    (cp >= 0x4E00 && cp <= 0x9FFF) || // unified ideographs
    (cp >= 0xAC00 && cp <= 0xD7AF) || // hangul syllables
    (cp >= 0xF900 && cp <= 0xFAFF) || // compat ideographs
    (cp >= 0x20000 && cp <= 0x2FA1F)  // ext B..compat supplement

  /** Analyze one text: lowercase, CJK runs → overlapping bigrams
    * (length-1 run → unigram), non-CJK alphanumeric runs → word tokens
    * minus the English stop set (CJKAnalyzer's default stop list —
    * bigrams never collide with it). Driver-side query terms and the
    * row-side column path both come here. */
  def terms(input: String): Seq[String] = {
    val s = input.toLowerCase(java.util.Locale.ROOT)
    val out = Seq.newBuilder[String]
    val run = new java.util.ArrayList[Integer] // current CJK run
    val word = new java.lang.StringBuilder     // current non-CJK word
    def flushRun(): Unit = {
      if (run.size == 1)
        out += new String(Character.toChars(run.get(0)))
      else {
        var i = 0
        while (i < run.size - 1) {
          val sb = new java.lang.StringBuilder(4)
          sb.appendCodePoint(run.get(i))
          sb.appendCodePoint(run.get(i + 1))
          out += sb.toString
          i += 1
        }
      }
      run.clear()
    }
    def flushWord(): Unit =
      if (word.length > 0) {
        val w = word.toString
        if (!graft.ops.TextFunctions.EnglishStopWords(w)) out += w
        word.setLength(0)
      }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isCjk(cp)) {
        flushWord()
        run.add(cp)
      } else if (Character.isLetter(cp) || Character.isDigit(cp)) {
        if (!run.isEmpty) flushRun()
        word.appendCodePoint(cp)
      } else {
        flushWord()
        if (!run.isEmpty) flushRun()
      }
      i += Character.charCount(cp)
    }
    flushWord()
    if (!run.isEmpty) flushRun()
    out.result()
  }

  /** Row-side form: ONE static call inside generated code. */
  def tokenize(input: UTF8String): ArrayData =
    new GenericArrayData(
      terms(input.toString).map(UTF8String.fromString).toArray[Any])
}

/** `cjk_tokens(text)` — scalar Catalyst expression; null-safe, returns
  * array<string> of CJKAnalyzer-style terms, codegen is one static call
  * to [[CjkTokenizer.tokenize]]. */
case class CjkTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"cjk_tokens expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CjkTokenizer.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CjkTokenizer.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object CjkFunctions {
  /** Column-level CJK bigram tokenization of a text column. */
  def cjk_tokens(c: Column): Column =
    ColumnBridge.column(CjkTokens(ColumnBridge.expression(c)))
}
