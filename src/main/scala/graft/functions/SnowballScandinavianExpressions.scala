package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Snowball Scandinavian stemmers (snowballstem.org/algorithms/
  * {swedish,danish,norwegian}) — the `lucene.swedish` /
  * `lucene.danish` / `lucene.norwegian` analyzers and `$text
  * $language` sv/da/nb, giving the round-12 tailored collation
  * locales ([[graft.query.Collation]] Tailorings) matching stemmed
  * search. Same provenance and shape contract as the
  * [[FrenchSnowball]] family: implemented from the published
  * algorithm descriptions; pure static functions wrapped by scalar
  * Catalyst expressions whose generated code is ONE static call. The
  * reference delegates analysis to the Atlas server
  * (/root/reference/db/wrapper.go:88-94).
  *
  * Shared Snowball mechanics, implemented once in
  * [[ScandinavianStemming]]: R1 = the region after the first
  * non-vowel following a vowel, with its start floored at 3 letters
  * (the published adjustment all three algorithms share); every
  * suffix/pattern match is confined to R1 the way Snowball's
  * `setlimit tomark p1` confines it — the WHOLE matched pattern,
  * including an s-ending's preceding letter, must lie inside R1. */
private[functions] object ScandinavianStemming {
  /** R1 start with the ≥3-letters floor. */
  def r1Pos(w: String, isVowel: Char => Boolean): Int = {
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w.charAt(i))) i += 1
    while (i < n && isVowel(w.charAt(i))) i += 1
    val r = if (i < n) i + 1 else n
    math.max(r, math.min(3, n))
  }
}

object SwedishSnowball {

  private val Vowels = "aeiouyäåö".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "äåö".toSet

  // step-1 suffix list from the published algorithm, longest-first;
  // bare "s" (the s-ending case) competes in the same longest-match
  private val Step1 = (Seq("heterna", "hetens", "arnas", "ernas",
    "ornas", "heter", "anden", "heten", "arens", "andet", "andes",
    "arna", "erna", "orna", "ande", "arne", "aste", "aren", "ades",
    "erns", "ade", "are", "ern", "ens", "het", "ast", "ad", "en",
    "ar", "er", "or", "as", "es", "at", "a", "e").map(s => (s, false))
    :+ (("s", true))).sortBy(-_._1.length)
  // valid s-ending letters (note: includes o and y)
  private val SEnding = "bcdfghjklmnoprtvy".toSet
  private val Step3 = Seq("fullt", "löst", "lig", "els", "ig")
    .sortBy(-_.length)

  /** Stem one lowercase Swedish word. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input
    var w = input
    val r1 = ScandinavianStemming.r1Pos(w, v)

    // ---- step 1: longest among the suffix list and s-with-ending,
    // matched entirely inside R1
    Step1.find { case (s, _) =>
      w.endsWith(s) && w.length - s.length >= r1
    } match {
      case Some((s, false)) => w = w.dropRight(s.length)
      case Some((_, true)) =>
        // the s-ending letter must sit inside R1 too (setlimit)
        if (w.length - 2 >= r1 && SEnding(w.charAt(w.length - 2)))
          w = w.dropRight(1)
      case None => ()
    }

    // ---- step 2: consonant pair fully in R1 loses its last letter
    locally {
      val pairs = Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")
      if (w.length - 2 >= r1 && pairs.exists(w.endsWith))
        w = w.dropRight(1)
    }

    // ---- step 3: lig/ig/els delete; löst → lös, fullt → full
    Step3.find(s => w.endsWith(s) && w.length - s.length >= r1)
      .foreach {
        case s @ ("lig" | "ig" | "els") => w = w.dropRight(s.length)
        case "löst" | "fullt" => w = w.dropRight(1)
      }
    w
  }
}

object DanishSnowball {

  private val Vowels = "aeiouyæåø".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "æåø".toSet

  private val Step1 = (Seq("erendes", "erende", "hedens", "ethed",
    "erede", "heden", "heder", "endes", "ernes", "erens", "erets",
    "ered", "ende", "erne", "eren", "erer", "enes", "eres", "eret",
    "hed", "ene", "ere", "heds", "ens", "ers", "ets", "en", "er",
    "es", "et", "e").map(s => (s, false)) :+ (("s", true)))
    .sortBy(-_._1.length)
  // valid s-ending letters (note: includes a and å)
  private val SEnding = "abcdfghjklmnoprtvyzå".toSet
  private val Step3b = Seq("elig", "løst", "lig", "els", "ig")
    .sortBy(-_.length)

  private def consonantPair(w: String, r1: Int): String = {
    val pairs = Seq("gd", "dt", "gt", "kt")
    if (w.length - 2 >= r1 && pairs.exists(w.endsWith)) w.dropRight(1)
    else w
  }

  /** Stem one lowercase Danish word. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input
    var w = input
    val r1 = ScandinavianStemming.r1Pos(w, v)

    // ---- step 1: longest among the suffix list and s-with-ending,
    // inside R1
    Step1.find { case (s, _) =>
      w.endsWith(s) && w.length - s.length >= r1
    } match {
      case Some((s, false)) => w = w.dropRight(s.length)
      case Some((_, true)) =>
        if (w.length - 2 >= r1 && SEnding(w.charAt(w.length - 2)))
          w = w.dropRight(1)
      case None => ()
    }

    // ---- step 2: gd/dt/gt/kt fully in R1 lose the last letter
    w = consonantPair(w, r1)

    // ---- step 3: (a) igst loses its st (no region condition —
    // published); (b) elig/lig/els/ig delete in R1 then step 2 again;
    // løst → løs
    if (w.endsWith("igst")) w = w.dropRight(2)
    Step3b.find(s => w.endsWith(s) && w.length - s.length >= r1)
      .foreach {
        case s @ ("elig" | "lig" | "els" | "ig") =>
          w = w.dropRight(s.length)
          w = consonantPair(w, r1)
        case "løst" => w = w.dropRight(1)
      }

    // ---- step 4 (undouble): identical consonants, BOTH inside R1,
    // lose the last letter
    if (w.length - 2 >= r1 && w.length >= 2 && {
      val d = w.charAt(w.length - 1)
      d == w.charAt(w.length - 2) && !v(d)
    }) w = w.dropRight(1)
    w
  }
}

object NorwegianSnowball {

  private val Vowels = "aeiouyæåø".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "æåø".toSet

  // actions: 0 = delete, 1 = s-ending delete, 2 = replace with "er"
  private val Step1 = (Seq("hetenes", "hetene", "hetens", "heten",
    "heter", "endes", "edes", "enes", "ande", "ende", "ane", "ene",
    "ens", "ers", "ets", "het", "ast", "ede", "en", "ar", "er", "as",
    "es", "et", "a", "e").map(s => (s, 0))
    ++ Seq(("s", 1), ("erte", 2), ("ert", 2))).sortBy(-_._1.length)
  // valid s-ending: one of these letters, or k NOT preceded by a
  // vowel (the k and its preceding letter both inside R1 — setlimit)
  private val SEnding = "bcdfghjlmnoprtvyz".toSet
  private val Step3 = Seq("hetslov", "slov", "elov", "eleg", "elig",
    "leg", "eig", "lig", "els", "lov", "ig").sortBy(-_.length)

  /** Stem one lowercase Norwegian (bokmål) word. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input
    var w = input
    val r1 = ScandinavianStemming.r1Pos(w, v)

    // ---- step 1
    Step1.find { case (s, _) =>
      w.endsWith(s) && w.length - s.length >= r1
    } match {
      case Some((s, 0)) => w = w.dropRight(s.length)
      case Some((_, 1)) =>
        val pre = w.length - 2
        if (pre >= r1 && SEnding(w.charAt(pre))) w = w.dropRight(1)
        else if (pre - 1 >= r1 && w.charAt(pre) == 'k' &&
          !v(w.charAt(pre - 1))) w = w.dropRight(1)
      case Some((s, _)) => // erte / ert → er
        w = w.dropRight(s.length) + "er"
      case None => ()
    }

    // ---- step 2: dt/vt fully in R1 lose the last letter
    if (w.length - 2 >= r1 && (w.endsWith("dt") || w.endsWith("vt")))
      w = w.dropRight(1)

    // ---- step 3: d-suffixes delete in R1
    Step3.find(s => w.endsWith(s) && w.length - s.length >= r1)
      .foreach(s => w = w.dropRight(s.length))
    w
  }
}

/** Scalar stem expressions — one static call inside whole-stage
  * codegen, the [[DutchStem]] shape. */
case class SwedishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"swedish_stem expects a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SwedishSnowball.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.SwedishSnowball.stem($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

case class DanishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"danish_stem expects a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      DanishSnowball.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.DanishSnowball.stem($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

case class NorwegianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"norwegian_stem expects a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NorwegianSnowball.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NorwegianSnowball.stem($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object ScandinavianStemFunctions {
  def swedish_stem(c: Column): Column =
    ColumnBridge.column(SwedishStem(ColumnBridge.expression(c)))
  def danish_stem(c: Column): Column =
    ColumnBridge.column(DanishStem(ColumnBridge.expression(c)))
  def norwegian_stem(c: Column): Column =
    ColumnBridge.column(NorwegianStem(ColumnBridge.expression(c)))
}
