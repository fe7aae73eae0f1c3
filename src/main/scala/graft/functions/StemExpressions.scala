package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming for the `lucene.english` analyzer.
  *
  * The reference passes `$search` stages (and so analyzer selection) to
  * the Atlas server verbatim (/root/reference/db/wrapper.go:88-94); here
  * the analysis chain runs in-plan, so "filtering" must reduce to the
  * same index term as "filter" at SCAN time. The stemmer is M.F. Porter's
  * 1980 algorithm (the one behind Lucene's PorterStemFilter), implemented
  * from the published definition: steps 1a/1b/1c (plurals, -ed/-ing,
  * y→i), 2/3 (double suffixes), 4 (suffix drop at measure>1), 5 (final
  * -e / -ll cleanup).
  *
  * [[PorterStem]] wraps it as a scalar Catalyst expression: eval and the
  * generated code both call the same static [[Porter.stem]], so the
  * column path and the driver-side query-term path can never disagree,
  * and the call stays inside whole-stage codegen (one static invocation
  * per token — no interpreted fallback, no UDF registry).
  */
object Porter {

  /** Stem one lowercase word. Non-letters and words of length <= 2 pass
    * through unchanged (Porter's contract). */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    val n = word.length
    while (i < n) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word // only plain lowercase ASCII stems
      i += 1
    }
    val s = new Stem(word.toCharArray)
    s.step1ab(); s.step1c(); s.step2(); s.step3(); s.step4(); s.step5()
    new String(s.b, 0, s.k + 1)
  }

  // Reference-shaped implementation: b[0..k] is the live word, j marks
  // the stem end while a suffix match is being considered.
  private final class Stem(val b: Array[Char]) {
    var k: Int = b.length - 1
    private var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** Measure: the number of VC sequences in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, final consonant not w/x/y:
      * the "*o" condition that restores a trailing e (e.g. hop-ing →
      * hope). */
    private def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    private def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val c = b(k)
          if (c == 'l' || c == 's' || c == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    def step2(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log")
        case _ =>
      }
    }

    def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    def step4(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") ||
          ends("ent")
        case 'o' => (ends("ion") && j >= 0 &&
          (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }
  }
}

/** `porter_stem(token)` — scalar Catalyst expression over a string
  * column; null-safe, stays inside whole-stage codegen (the generated
  * code is one static call to [[Porter.stem]]). */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"porter_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Porter.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Porter.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object StemFunctions {
  /** Column-level Porter stem of a (lowercase) token column. */
  def porter_stem(c: Column): Column =
    ColumnBridge.column(PorterStem(ColumnBridge.expression(c)))
}
