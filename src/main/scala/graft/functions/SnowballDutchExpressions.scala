package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Snowball Dutch stemmer (snowballstem.org/algorithms/dutch) — the
  * `lucene.dutch` analyzer and `$text $language` nl, completing
  * stemmed search for every collation locale the engine claims
  * ([[graft.query.Collation]] SupportedLocales). Same provenance and
  * shape contract as the [[FrenchSnowball]] family: implemented from
  * the published algorithm description; a pure static function wrapped
  * by a scalar Catalyst expression whose generated code is ONE static
  * call. The reference delegates analysis to the Atlas server
  * (/root/reference/db/wrapper.go:88-94). */
object DutchSnowball {

  private val Vowels = "aeiouyè".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "äëïöüáéíóúè".toSet

  /** Stem one lowercase Dutch word. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input

    // ---- prelude: strip umlauts and acutes; then mark initial y,
    // y-after-vowel, and i-between-vowels upper case (left to right
    // over the LIVE buffer, the shared prelude discipline)
    val base = input.map {
      case 'ä' | 'á' => 'a'
      case 'ë' | 'é' => 'e'
      case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'
      case 'ü' | 'ú' => 'u'
      case c => c
    }
    val sb = new java.lang.StringBuilder(base.length)
    var i = 0
    while (i < base.length) {
      val c = base.charAt(i)
      val prevV = i > 0 && v(sb.charAt(i - 1))
      val nextV = i + 1 < base.length && v(base.charAt(i + 1))
      val m =
        if (c == 'y' && (i == 0 || prevV)) 'Y'
        else if (c == 'i' && prevV && nextV) 'I'
        else c
      sb.append(m)
      i += 1
    }
    var w = sb.toString

    // regions; R1's start is floored at 3 letters (the German rule)
    val r1 = math.max(rPos(w, 0), math.min(3, w.length))
    val r2 = rPos(w, rPos(w, 0))

    def undouble(): Unit =
      if (w.endsWith("kk") || w.endsWith("dd") || w.endsWith("tt"))
        w = w.dropRight(1)
    // valid en-ending: a non-vowel, and the stem must not end in gem
    def validEn(stem: String): Boolean =
      stem.nonEmpty && !v(stem.charAt(stem.length - 1)) &&
        !stem.endsWith("gem")
    // valid s-ending: a non-vowel other than j
    def validS(stem: String): Boolean =
      stem.nonEmpty && !v(stem.charAt(stem.length - 1)) &&
        stem.charAt(stem.length - 1) != 'j'
    def delEn(): Unit = {
      // shared by step 1(b) and step 3a's preceding-en handling
      val suf = if (w.endsWith("ene")) "ene" else "en"
      val st = w.length - suf.length
      if (w.endsWith(suf) && st >= r1 && validEn(w.substring(0, st))) {
        w = w.substring(0, st); undouble()
      }
    }

    // ---- step 1: longest among heden / ene / en / se / s
    locally {
      val cands = Seq("heden", "ene", "en", "se", "s")
      cands.find(w.endsWith) match {
        case Some("heden") =>
          val st = w.length - 5
          if (st >= r1) w = w.substring(0, st) + "heid"
        case Some("ene") | Some("en") => delEn()
        case Some(suf @ ("se" | "s")) =>
          val st = w.length - suf.length
          if (st >= r1 && validS(w.substring(0, st)))
            w = w.substring(0, st)
        case _ => ()
      }
    }

    // ---- step 2: final e in R1 after a non-vowel; remember it for
    // step 3b's `bar`
    var eFound = false
    def step2(): Unit =
      if (w.endsWith("e") && w.length - 1 >= r1 && w.length > 1 &&
        !v(w.charAt(w.length - 2))) {
        w = w.dropRight(1); eFound = true; undouble()
      }
    step2()

    // ---- step 3a: heid (not after c), then its preceding en
    if (w.endsWith("heid") && w.length - 4 >= r2 &&
      (w.length == 4 || w.charAt(w.length - 5) != 'c')) {
      w = w.dropRight(4)
      delEn()
    }

    // ---- step 3b: d-suffixes, longest among end / ing / ig / lijk /
    // baar / bar
    locally {
      val cands = Seq("lijk", "baar", "end", "ing", "bar", "ig")
        .sortBy(-_.length)
      cands.find(w.endsWith) match {
        case Some(suf @ ("end" | "ing")) =>
          val st = w.length - 3
          if (st >= r2) {
            w = w.substring(0, st)
            if (w.endsWith("ig") && w.length - 2 >= r2 &&
              (w.length < 3 || w.charAt(w.length - 3) != 'e'))
              w = w.dropRight(2)
            else undouble()
          }
          // silence unused warning for suf
          val _ = suf
        case Some("ig") =>
          val st = w.length - 2
          if (st >= r2 && (st == 0 || w.charAt(st - 1) != 'e'))
            w = w.substring(0, st)
        case Some("lijk") =>
          val st = w.length - 4
          if (st >= r2) { w = w.substring(0, st); step2() }
        case Some("baar") =>
          val st = w.length - 4
          if (st >= r2) w = w.substring(0, st)
        case Some("bar") =>
          val st = w.length - 3
          if (st >= r2 && eFound) w = w.substring(0, st)
        case _ => ()
      }
    }

    // ---- step 4: undouble vowel — C + double a/e/o/u + non-vowel
    // (other than I) loses one vowel letter (maan → man, brood → brod)
    if (w.length >= 4) {
      val d = w.charAt(w.length - 1)
      val v2 = w.charAt(w.length - 2)
      val v1 = w.charAt(w.length - 3)
      val c0 = w.charAt(w.length - 4)
      if (!v(d) && d != 'I' && v1 == v2 && "aeou".contains(v1) && !v(c0))
        w = w.substring(0, w.length - 2) + d
    }

    // postlude: unmark
    w.map {
      case 'I' => 'i'
      case 'Y' => 'y'
      case c => c
    }
  }

  private def rPos(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !v(w.charAt(i))) i += 1
    while (i < n && v(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }
}

/** `dutch_stem(token)` — scalar expression, one static call inside
  * whole-stage codegen. */
case class DutchStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"dutch_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      DutchSnowball.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.DutchSnowball.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object DutchStemFunctions {
  /** Column-level Dutch Snowball stem of a (lowercase) token column. */
  def dutch_stem(c: Column): Column =
    ColumnBridge.column(DutchStem(ColumnBridge.expression(c)))
}
