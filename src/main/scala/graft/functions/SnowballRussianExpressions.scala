package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Snowball Russian stemmer (snowballstem.org/algorithms/russian/
  * stemmer.html) — the first non-Latin ALPHABETIC analysis chain
  * (`lucene.russian`, `$text $language ru`), pairing the round-12 `ru`
  * collation tailoring ([[graft.query.Collation]]) with stemmed search
  * the way every Latin collation locale already has. Same provenance
  * and shape contract as the [[FrenchSnowball]] family: implemented
  * from the published algorithm description; a pure static function
  * wrapped by a scalar Catalyst expression whose generated code is ONE
  * static call. The reference delegates analysis to the Atlas server
  * (/root/reference/db/wrapper.go:88-94).
  *
  * Published structure, all suffix matching confined to RV (the region
  * after the first vowel — Snowball's `setlimit tomark pV`, so a
  * matched suffix AND any tested preceding letter must lie inside RV):
  *   prelude  ё → е
  *   step 1   PERFECTIVE GERUND (group 1 requires a preceding а/я,
  *            which is tested but not removed); otherwise try
  *            REFLEXIVE (ся/сь) then ADJECTIVAL | VERB | NOUN
  *   step 2   final и
  *   step 3   DERIVATIONAL ост/ость, entirely inside R2
  *   step 4   undouble нн; or remove SUPERLATIVE ейш/ейше then
  *            undouble нн; or remove final ь
  * Snowball's `among` is longest-match WITHOUT backtracking: when the
  * longest matching suffix carries the а/я condition and the condition
  * fails, the whole among fails — shorter suffixes are NOT retried.
  */
object RussianSnowball {

  private val Vowels = "аеиоуыэюя".toSet

  // step-1 suffix classes from the published algorithm; `true` marks
  // the group-1 entries whose match requires a PRECEDING а or я
  // (tested inside RV, not removed). Longest-first = Snowball among.
  private val PerfGerund: Seq[(String, Boolean)] = Seq(
    ("ившись", false), ("ывшись", false), ("вшись", true),
    ("ивши", false), ("ывши", false), ("вши", true),
    ("ив", false), ("ыв", false), ("в", true)
  ).sortBy(-_._1.length)

  private val Adjective: Seq[String] = Seq(
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
    "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею").sortBy(-_.length)

  private val Participle: Seq[(String, Boolean)] = Seq(
    ("ивш", false), ("ывш", false), ("ующ", false),
    ("ем", true), ("нн", true), ("вш", true), ("ющ", true), ("щ", true)
  ).sortBy(-_._1.length)

  private val Verb: Seq[(String, Boolean)] = (Seq(
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно").map(s => (s, true)) ++ Seq(
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю")
    .map(s => (s, false))).sortBy(-_._1.length)

  private val Noun: Seq[String] = Seq(
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
    "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
    "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я").sortBy(-_.length)

  // suffix (and, for conditioned entries, the tested preceding letter)
  // entirely inside the region starting at `limit`
  private def endsIn(w: String, s: String, limit: Int): Boolean =
    w.endsWith(s) && w.length - s.length >= limit

  private def precededByAYa(w: String, sufLen: Int, rv: Int): Boolean = {
    val i = w.length - sufLen - 1
    i >= rv && (w.charAt(i) == 'а' || w.charAt(i) == 'я')
  }

  /** Stem one lowercase Russian word. Words containing anything
    * outside the lowercase Cyrillic block а-я (+ё) pass through
    * unchanged, like the Latin stemmers' letter gates. */
  def stem(input0: String): String = {
    if (input0.length <= 1) return input0
    // prelude: ё → е (before region marks, as published)
    val input = input0.replace('ё', 'е')
    var ok = true
    var k = 0
    while (ok && k < input.length) {
      val c = input.charAt(k); ok = c >= 'а' && c <= 'я'; k += 1
    }
    if (!ok) return input0

    val n = input.length
    // RV: after the first vowel
    var i = 0
    while (i < n && !Vowels(input.charAt(i))) i += 1
    val rv = if (i < n) i + 1 else n
    // R1 / R2: after the first non-vowel following a vowel (no
    // 3-letter floor in Russian, unlike the Scandinavian algorithms)
    def regionAfter(from: Int): Int = {
      var j = from
      while (j < n && !Vowels(input.charAt(j))) j += 1
      while (j < n && Vowels(input.charAt(j))) j += 1
      if (j < n) j + 1 else n
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)

    var w = input

    // ---- step 1
    val gerund = PerfGerund.find { case (s, _) => endsIn(w, s, rv) }
    val gerundRemoved = gerund match {
      case Some((s, needsAYa))
          if !needsAYa || precededByAYa(w, s.length, rv) =>
        w = w.dropRight(s.length); true
      case _ => false // longest match failed its condition: no retry
    }
    if (!gerundRemoved) {
      // try reflexive
      if (endsIn(w, "ся", rv) || endsIn(w, "сь", rv)) w = w.dropRight(2)
      // adjectival | verb | noun — first that fires wins
      Adjective.find(s => endsIn(w, s, rv)) match {
        case Some(adj) =>
          w = w.dropRight(adj.length)
          // try a participle suffix before the removed adjective
          // ending (condition failure leaves w unchanged — `try`)
          Participle.find { case (s, _) => endsIn(w, s, rv) } match {
            case Some((s, needsAYa))
                if !needsAYa || precededByAYa(w, s.length, rv) =>
              w = w.dropRight(s.length)
            case _ => ()
          }
        case None =>
          val verbRemoved = Verb.find { case (s, _) =>
            endsIn(w, s, rv)
          } match {
            case Some((s, needsAYa))
                if !needsAYa || precededByAYa(w, s.length, rv) =>
              w = w.dropRight(s.length); true
            case _ => false
          }
          if (!verbRemoved)
            Noun.find(s => endsIn(w, s, rv))
              .foreach(s => w = w.dropRight(s.length))
      }
    }

    // ---- step 2: final и
    if (endsIn(w, "и", rv)) w = w.dropRight(1)

    // ---- step 3: derivational, entirely inside R2
    if (endsIn(w, "ость", r2)) w = w.dropRight(4)
    else if (endsIn(w, "ост", r2)) w = w.dropRight(3)

    // ---- step 4
    if (endsIn(w, "нн", rv)) w = w.dropRight(1)
    else {
      val sup =
        if (endsIn(w, "ейше", rv)) 4
        else if (endsIn(w, "ейш", rv)) 3 else 0
      if (sup > 0) {
        w = w.dropRight(sup)
        if (endsIn(w, "нн", rv)) w = w.dropRight(1)
      } else if (endsIn(w, "ь", rv)) w = w.dropRight(1)
    }
    w
  }
}

/** Scalar stem expression — one static call inside whole-stage
  * codegen, the [[DutchStem]] shape. */
case class RussianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"russian_stem expects a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RussianSnowball.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RussianSnowball.stem($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object RussianStemFunctions {
  def russian_stem(c: Column): Column =
    ColumnBridge.column(RussianStem(ColumnBridge.expression(c)))
}
