package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Snowball stemmers for the non-English `lucene.*` analyzers.
  *
  * The reference passes `$search`/`$text` language analysis to the Atlas
  * server (/root/reference/db/wrapper.go:88-94); here the analysis chain
  * runs in-plan, so "continuellement" must reduce to the same index term
  * as "continuelle" at SCAN time. Both stemmers below implement the
  * published Snowball algorithms (M.F. Porter's snowballstem.org
  * definitions — the canonical published stemmers behind Lucene's
  * French/GermanStemFilter; like [[Porter]] they are implemented from
  * the algorithm description, original 1.x revision: the later He/Hi
  * ë/ï marking is not modeled, documented divergence for the rare
  * diaeresis words).
  *
  * Shape contract (same as [[PorterStem]]): each stemmer is a pure
  * static function wrapped by a scalar Catalyst expression whose
  * generated code is ONE static call, so it stays inside whole-stage
  * codegen and the column path and the driver-side query-term path can
  * never disagree.
  */
object FrenchSnowball {

  // marked-form vowels: the prelude upper-cases u/i/y where they act as
  // consonants, and upper-case letters are deliberately absent here
  private val Vowels = "aeiouyâàëéêèïîôûù".toSet
  private def v(c: Char): Boolean = Vowels(c)

  private val Letters = Vowels ++ ('a' to 'z') + 'ç'

  /** Stem one lowercase French word (non-French-alphabet tokens pass
    * through unchanged, Porter's contract). */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input

    // ---- prelude: mark consonantal u/i/y (and u-after-q) upper-case.
    // Snowball processes left to right over the LIVE buffer: the
    // previous-neighbor test sees an already-applied mark (in
    // "essayions" the y becomes Y, so the following i — now preceded
    // by a non-vowel — stays unmarked), while the next-neighbor test
    // sees the original character (not yet visited).
    val in = input
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      val prevV = i > 0 && v(sb.charAt(i - 1))
      val nextV = i + 1 < in.length && v(in.charAt(i + 1))
      val m =
        if ((c == 'u' || c == 'i') && prevV && nextV) c.toUpper
        else if (c == 'y' && (prevV || nextV)) 'Y'
        else if (c == 'u' && i > 0 && sb.charAt(i - 1) == 'q') 'U'
        else c
      sb.append(m)
      i += 1
    }
    var w = sb.toString

    // ---- regions (positions fixed after the prelude; "suffix in R" =
    // suffix start index >= region start)
    val rv = rvPos(w)
    val r1 = rPos(w, 0)
    val r2 = rPos(w, r1)

    // step 1: longest among the standard suffixes, grouped actions
    var step1Changed = false
    var mentFound = false
    locally {
      val n = w.length
      def at(suf: String): Boolean = w.endsWith(suf)
      def start(suf: String): Int = n - suf.length
      def inR(region: Int, suf: String): Boolean = start(suf) >= region
      def del(suf: String): Unit = { w = w.substring(0, start(suf)); step1Changed = true }
      def rep(suf: String, by: String): Unit = {
        w = w.substring(0, start(suf)) + by; step1Changed = true
      }
      // longest-match across ALL groups decides which action runs; a
      // failed region condition then means NO action (snowball `among`)
      val suffixes = Seq(
        "issements", "issement", "atrices", "amment", "emment", "ements",
        "atrice", "ations", "ateurs", "ances", "iqUes", "ismes", "ables",
        "istes", "ments", "ation", "ateur", "logies", "logie", "usions",
        "utions", "usion", "ution", "ences", "ement", "ités", "ives",
        "eaux", "euses", "ance", "iqUe", "isme", "able", "iste", "ence",
        "ment", "ité", "ifs", "aux", "euse", "eux", "ive", "if"
      ).sortBy(-_.length)
      suffixes.find(at) match {
        case None => ()
        case Some(suf) => suf match {
          case "ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
               "ances" | "iqUes" | "ismes" | "ables" | "istes" =>
            if (inR(r2, suf)) del(suf)
          case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" |
               "ations" =>
            if (inR(r2, suf)) {
              del(suf)
              if (w.endsWith("ic")) {
                if (n - suf.length - 2 >= r2) w = w.dropRight(2)
                else w = w.substring(0, w.length - 2) + "iqU"
              }
            }
          case "logie" | "logies" =>
            if (inR(r2, suf)) rep(suf, "log")
          case "usion" | "ution" | "usions" | "utions" =>
            if (inR(r2, suf)) rep(suf, "u")
          case "ence" | "ences" =>
            if (inR(r2, suf)) rep(suf, "ent")
          case "ement" | "ements" =>
            if (inR(rv, suf)) {
              del(suf)
              val m = w.length
              if (w.endsWith("iv") && m - 2 >= r2) {
                w = w.dropRight(2)
                if (w.endsWith("at") && w.length - 2 >= r2)
                  w = w.dropRight(2)
              } else if (w.endsWith("eus")) {
                if (m - 3 >= r2) w = w.dropRight(3)
                else if (m - 3 >= r1) w = w.dropRight(3) + "eux"
              } else if ((w.endsWith("abl") || w.endsWith("iqU")) &&
                  m - 3 >= r2) w = w.dropRight(3)
              else if ((w.endsWith("ièr") || w.endsWith("Ièr")) &&
                  m - 3 >= rv) w = w.dropRight(3) + "i"
            }
          case "ité" | "ités" =>
            if (inR(r2, suf)) {
              del(suf)
              val m = w.length
              if (w.endsWith("abil")) {
                if (m - 4 >= r2) w = w.dropRight(4)
                else w = w.dropRight(4) + "abl"
              } else if (w.endsWith("ic")) {
                if (m - 2 >= r2) w = w.dropRight(2)
                else w = w.dropRight(2) + "iqU"
              } else if (w.endsWith("iv") && m - 2 >= r2) w = w.dropRight(2)
            }
          case "if" | "ive" | "ifs" | "ives" =>
            if (inR(r2, suf)) {
              del(suf)
              if (w.endsWith("at") && w.length - 2 >= r2) {
                w = w.dropRight(2)
                if (w.endsWith("ic")) {
                  if (w.length - 2 >= r2) w = w.dropRight(2)
                  else w = w.dropRight(2) + "iqU"
                }
              }
            }
          case "eaux" => rep(suf, "eau")
          case "aux" => if (inR(r1, suf)) rep(suf, "al")
          case "euse" | "euses" =>
            if (inR(r2, suf)) del(suf)
            else if (inR(r1, suf)) rep(suf, "eux")
          case "issement" | "issements" =>
            if (inR(r1, suf) && start(suf) > 0 &&
              !v(w.charAt(start(suf) - 1))) del(suf)
          case "amment" =>
            if (inR(rv, suf)) { rep(suf, "ant"); mentFound = true }
          case "emment" =>
            if (inR(rv, suf)) { rep(suf, "ent"); mentFound = true }
          case "ment" | "ments" =>
            val st = start(suf)
            if (st > 0 && st - 1 >= rv && v(w.charAt(st - 1))) {
              del(suf); mentFound = true
            }
          case _ => ()
        }
      }
    }

    // steps 2a/2b (verb suffixes): run when step 1 removed nothing, or
    // removed a ment-class ending
    var verbChanged = false
    var did2 = false
    if (!step1Changed || mentFound) {
      did2 = true
      // 2a: i-verb suffixes. Matching is CONFINED to RV (snowball's
      // setlimit: a suffix reaching left of RV is no match at all and a
      // shorter one is tried), but once the longest in-RV suffix is
      // chosen the preceded-by-non-vowel condition either fires or the
      // step removes nothing — no fallback to shorter suffixes.
      val suffixes2a = Seq(
        "issaIent", "issantes", "issants", "issante", "issions", "issons",
        "issais", "issait", "issant", "issent", "issiez", "issez",
        "iraIent", "irions", "isses", "irais", "irait", "irent", "iriez",
        "irons", "iront", "isse", "irai", "iras", "irez", "îmes", "îtes",
        "ies", "ira", "ir", "is", "it", "ie", "ît", "i"
      ).distinct.sortBy(-_.length)
      val hit2a = suffixes2a.find { suf =>
        w.endsWith(suf) && w.length - suf.length >= rv
      }
      val removed2a = hit2a.exists { suf =>
        val st = w.length - suf.length
        if (st > 0 && st - 1 >= rv && !v(w.charAt(st - 1))) {
          w = w.substring(0, st); true
        } else false
      }
      if (removed2a) verbChanged = true
      else {
        // 2b: other verb suffixes; matching confined to RV the same way
        val g1 = Set("ions")
        val g2 = Set("é", "ée", "ées", "és", "èrent", "er", "era",
          "erai", "eraIent", "erais", "erait", "eras", "erez", "eriez",
          "erions", "erons", "eront", "ez", "iez")
        val g3 = Set("âmes", "ât", "âtes", "a", "ai", "aIent", "ais",
          "ait", "ant", "ante", "antes", "ants", "as", "asse",
          "assent", "asses", "assiez", "assions")
        val all = (g1 ++ g2 ++ g3).toSeq.sortBy(-_.length)
        all.find(suf => w.endsWith(suf) &&
          w.length - suf.length >= rv) match {
          case Some(suf) if g1(suf) =>
            if (w.length - suf.length >= r2) {
              w = w.dropRight(suf.length); verbChanged = true
            }
          case Some(suf) if g2(suf) =>
            w = w.dropRight(suf.length); verbChanged = true
          case Some(suf) => // g3
            w = w.dropRight(suf.length); verbChanged = true
            if (w.nonEmpty && w.endsWith("e") && w.length - 1 >= rv)
              w = w.dropRight(1)
          case None => ()
        }
      }
    }

    val lastObeyedAltered = if (did2) verbChanged else step1Changed
    if (lastObeyedAltered) {
      // step 3: tidy residual markers
      if (w.endsWith("Y")) w = w.dropRight(1) + "i"
      else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    } else {
      // step 4: residual suffixes
      if (w.length > 1 && w.endsWith("s") &&
        !"aiouès".contains(w.charAt(w.length - 2))) w = w.dropRight(1)
      val suffixes4 = Seq("Ière", "ière", "Ier", "ier", "ion", "e", "ë")
        .sortBy(-_.length)
      suffixes4.find(suf => w.endsWith(suf) &&
        w.length - suf.length >= rv) match {
        case Some("ion") =>
          // all of step 4 runs under setlimit-to-RV: the preceding s/t
          // test must stay INSIDE RV too (st - 1 >= rv), or a word with
          // r2 <= rv over-stems when 'ion' starts exactly at RV
          val st = w.length - 3
          if (st >= r2 && st - 1 >= rv &&
            (w.charAt(st - 1) == 's' || w.charAt(st - 1) == 't'))
            w = w.substring(0, st)
        case Some(suf @ ("ier" | "ière" | "Ier" | "Ière")) =>
          w = w.dropRight(suf.length) + "i"
        case Some("e") => w = w.dropRight(1)
        case Some("ë") => if (w.endsWith("guë")) w = w.dropRight(1)
        case _ => ()
      }
    }

    // step 5: un-double
    if (w.endsWith("enn") || w.endsWith("onn") || w.endsWith("ett") ||
      w.endsWith("ell") || w.endsWith("eill")) w = w.dropRight(1)

    // step 6: un-accent a final é/è followed by only non-vowels
    locally {
      var i = w.length - 1
      var run = 0
      while (i >= 0 && !v(w.charAt(i)) && w.charAt(i) != 'é' &&
        w.charAt(i) != 'è') { i -= 1; run += 1 }
      if (run >= 1 && i >= 0 && (w.charAt(i) == 'é' || w.charAt(i) == 'è'))
        w = w.substring(0, i) + "e" + w.substring(i + 1)
    }

    // postlude
    w.map {
      case 'I' => 'i'
      case 'U' => 'u'
      case 'Y' => 'y'
      case c => c
    }
  }

  /** RV: after the third letter when the word starts with two vowels or
    * with par/col/tap; else after the first vowel not at position 0;
    * else the word end. */
  private def rvPos(w: String): Int = {
    val n = w.length
    if (n >= 2 && v(w.charAt(0)) && v(w.charAt(1))) return math.min(3, n)
    if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap"))
      return math.min(3, n)
    var i = 1
    while (i < n && !v(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }

  /** Standard Rk: position after the first non-vowel following a vowel,
    * searching from `from`. */
  private def rPos(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !v(w.charAt(i))) i += 1
    while (i < n && v(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }
}

/** German Snowball stemmer (snowballstem.org/algorithms/german). */
object GermanSnowball {

  private val Vowels = "aeiouyäöü".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "äöüß".toSet
  private val SEnding = "bdfghklmnrt".toSet
  private val StEnding = "bdfghklmnt".toSet

  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input

    // prelude: ß → ss, then mark u/y between vowels (left to right over
    // the live buffer, like the French prelude: the previous-neighbor
    // test sees an already-applied mark)
    val base = input.replace("ß", "ss")
    val sb = new java.lang.StringBuilder(base.length)
    var i = 0
    while (i < base.length) {
      val c = base.charAt(i)
      val between = i > 0 && i + 1 < base.length &&
        v(sb.charAt(i - 1)) && v(base.charAt(i + 1))
      sb.append(if ((c == 'u' || c == 'y') && between) c.toUpper else c)
      i += 1
    }
    var w = sb.toString

    // regions: R2 from the raw R1; R1 then floored at 3 letters
    val r1raw = rPos(w, 0)
    val r2 = rPos(w, r1raw)
    val r1 = math.max(r1raw, math.min(3, w.length))

    def inR1(st: Int): Boolean = st >= r1
    def inR2(st: Int): Boolean = st >= r2

    // step 1
    locally {
      val cands = Seq("ern", "em", "er", "en", "es", "e", "s")
      cands.find(w.endsWith) match {
        case Some("s") =>
          val st = w.length - 1
          if (inR1(st) && st > 0 && SEnding(w.charAt(st - 1)))
            w = w.dropRight(1)
        case Some(suf @ ("ern" | "em" | "er")) =>
          // current spec keeps "system"-family 'em' (syst exception)
          val st = w.length - suf.length
          val systEm = suf == "em" && st >= 4 &&
            w.regionMatches(st - 4, "syst", 0, 4)
          if (inR1(st) && !systEm) w = w.substring(0, st)
        case Some(suf @ ("en" | "es" | "e")) =>
          val st = w.length - suf.length
          if (inR1(st)) {
            w = w.substring(0, st)
            if (w.endsWith("niss")) w = w.dropRight(1)
          }
        case _ => ()
      }
    }

    // step 2
    locally {
      val cands = Seq("est", "en", "er", "st")
      cands.find(w.endsWith) match {
        case Some("st") =>
          val st = w.length - 2
          if (inR1(st) && st > 3 && StEnding(w.charAt(st - 1)))
            w = w.substring(0, st)
        case Some(suf @ ("est" | "en" | "er")) =>
          val st = w.length - suf.length
          if (inR1(st)) w = w.substring(0, st)
        case _ => ()
      }
    }

    // step 3: d-suffixes
    locally {
      val cands = Seq("isch", "lich", "heit", "keit", "end", "ung",
        "ig", "ik")
      cands.find(w.endsWith) match {
        case Some(suf @ ("end" | "ung")) =>
          val st = w.length - suf.length
          if (inR2(st)) {
            w = w.substring(0, st)
            if (w.endsWith("ig") && inR2(w.length - 2) &&
              (w.length < 3 || w.charAt(w.length - 3) != 'e'))
              w = w.dropRight(2)
          }
        case Some(suf @ ("ig" | "ik" | "isch")) =>
          val st = w.length - suf.length
          if (inR2(st) && (st == 0 || w.charAt(st - 1) != 'e'))
            w = w.substring(0, st)
        case Some(suf @ ("lich" | "heit")) =>
          val st = w.length - suf.length
          if (inR2(st)) {
            w = w.substring(0, st)
            if ((w.endsWith("er") || w.endsWith("en")) &&
              inR1(w.length - 2)) w = w.dropRight(2)
          }
        case Some("keit") =>
          val st = w.length - 4
          if (inR2(st)) {
            w = w.substring(0, st)
            if (w.endsWith("lich") && inR2(w.length - 4)) w = w.dropRight(4)
            else if (w.endsWith("ig") && inR2(w.length - 2))
              w = w.dropRight(2)
          }
        case _ => ()
      }
    }

    // postlude: unmark, fold umlauts
    w.map {
      case 'U' => 'u'
      case 'Y' => 'y'
      case 'ä' => 'a'
      case 'ö' => 'o'
      case 'ü' => 'u'
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

/** `french_stem(token)` — scalar expression, one static call inside
  * whole-stage codegen (the [[PorterStem]] pattern). */
case class FrenchStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"french_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      FrenchSnowball.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.FrenchSnowball.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

/** `german_stem(token)` — scalar expression, one static call inside
  * whole-stage codegen (the [[PorterStem]] pattern). */
case class GermanStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"german_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      GermanSnowball.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GermanSnowball.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object SnowballFunctions {
  /** Column-level French Snowball stem of a (lowercase) token column. */
  def french_stem(c: Column): Column =
    ColumnBridge.column(FrenchStem(ColumnBridge.expression(c)))

  /** Column-level German Snowball stem of a (lowercase) token column. */
  def german_stem(c: Column): Column =
    ColumnBridge.column(GermanStem(ColumnBridge.expression(c)))
}
