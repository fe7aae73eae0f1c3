package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Snowball Turkish stemmer (snowballstem.org/algorithms/turkish/
  * stemmer.html, Evren Kapusuz Çilden) — pairs the tailored `tr`
  * collation ([[graft.query.Collation]], dotless-i case fold +
  * mid-alphabet letter pages) with stemmed search (`lucene.turkish`,
  * `$text $language tr`) the way every other collation locale already
  * has. Same provenance and shape contract as [[RussianSnowball]]:
  * implemented from the published algorithm description; a pure static
  * function wrapped by a scalar Catalyst expression whose generated
  * code is ONE static call. The reference delegates analysis to the
  * Atlas server (/root/reference/db/wrapper.go:88-94).
  *
  * Published structure (agglutinative: suffixes strip in reverse
  * morphotactic order, each gated by VOWEL HARMONY and optional
  * buffer-letter checks):
  *   - words of ≤1 syllable (≤1 vowel) pass through unchanged
  *   - stem_nominal_verb_suffixes: -(y)mUş/-(y)DU/-(y)sA/-yken |
  *     -cAsInA… | -lAr(+past/cond: stops noun stemming) | -nUz+past |
  *     -sUnUz/-(y)Uz/-sUn/-(y)Um | -DUr…
  *   - stem_noun_suffixes: case (-DA/-ndA/-DAn/-ndAn/-(n)Un/-(y)lA/
  *     -ncA/-(n)A/-(y)A/-(n)U/-(y)U/-(s)U) → possessive → plural
  *     (-lAr) → the -ki chain (evdekiler → evde+ki+ler → ev), applied
  *     once with chain continuations, not looped
  *   - postlude: append harmonic U to stems ending d/g, then devoice
  *     the final consonant (b→p, c→ç, d→t, ğ→k)
  *
  * Harmony (`check_vowel_harmony`): the word's LAST vowel must be
  * preceded somewhere by a vowel of its harmony class (a→aıou,
  * e→eiöü, ı→aı, i→ei, o/u→ou, ö/ü→öü) — Snowball `goto` semantics
  * (any earlier matching vowel), not strict adjacency. `ki`/`ken` are
  * invariant and skip the check, as published.
  *
  * Optional buffer letters, from the published `mark_suffix_with_
  * optional_*` routines: a present y/s/n must be preceded by a vowel
  * (vowel-final stems take the buffer consonant); a present buffer U
  * must be preceded by a consonant; when the optional letter is
  * absent, the character one position further in must be a vowel (for
  * y/s/n) / non-vowel (for U) — the published sanity check that a
  * plausible stem remains.
  *
  * Documented divergences from the published source: the alternation
  * ORDER inside the noun-suffix chain is reconstructed from the
  * algorithm's state-machine description (the behavior on the
  * inflection families below is hand-verified and spec-pinned); the
  * long-removed `is_reserved_word` special case of early revisions is
  * not modeled; and one final bare -(y)U/-(y)A strip normalizes
  * vowel-final stems so possessive- and plural-stripped forms MEET
  * (see the note in [[stem]] — the published pass order splits them). Spec-pinned families: kitap/kitaplar/kitabı/
  * kitaplarım/kitaplarımdan; ev/evler/evde/evdeki/evdekiler;
  * araba/arabam/arabaya/arabalar/arabayla/arabanın; gel/geldi/
  * geldiler/gelmiş/geldiniz; göz/gözler/gözlerimde; çocuğu→çocuk. */
object TurkishSnowball {

  private val Vowels = "aeıioöuü".toSet
  private val UVowels = "ıiuü".toSet
  private val Letters = "abcçdefgğhıijklmnoöprsştuüvyz".toSet

  private def isV(c: Char): Boolean = Vowels(c)

  /** check_vowel_harmony on the current word: last vowel's harmony
    * class must contain some EARLIER vowel (goto semantics). */
  private def harmony(w: String): Boolean = {
    var i = w.length - 1
    while (i >= 0 && !isV(w.charAt(i))) i -= 1
    if (i < 0) return false
    val allowed: Set[Char] = w.charAt(i) match {
      case 'a' => Set('a', 'ı', 'o', 'u')
      case 'e' => Set('e', 'i', 'ö', 'ü')
      case 'ı' => Set('a', 'ı')
      case 'i' => Set('e', 'i')
      case 'o' | 'u' => Set('o', 'u')
      case 'ö' | 'ü' => Set('ö', 'ü')
    }
    var j = i - 1
    while (j >= 0) { if (allowed(w.charAt(j))) return true; j -= 1 }
    false
  }

  /** Optional buffer consonant (y/s/n) before keep-length `p`:
    * present → must follow a vowel, consume it; absent → the char one
    * further in must be a vowel. None = the whole mark fails. */
  private def optC(w: String, p: Int, c: Char): Option[Int] =
    if (p >= 1 && w.charAt(p - 1) == c) {
      if (p >= 2 && isV(w.charAt(p - 2))) Some(p - 1) else None
    } else if (p >= 2 && isV(w.charAt(p - 2))) Some(p)
    else None

  /** Optional buffer vowel U (possessives): present → must follow a
    * consonant; absent → the char one further in must be a consonant. */
  private def optU(w: String, p: Int): Option[Int] =
    if (p >= 1 && UVowels(w.charAt(p - 1))) {
      if (p >= 2 && !isV(w.charAt(p - 2))) Some(p - 1) else None
    } else if (p >= 2 && !isV(w.charAt(p - 2))) Some(p)
    else None

  /** Longest suffix of `w` among `ss` → keep-length. */
  private def among(w: String, ss: Seq[String]): Option[Int] =
    ss.find(w.endsWith).map(w.length - _.length)

  // ---- marks: Option[keep-length], each gated by harmony unless the
  // suffix is published as invariant (ki, ken)
  private def hm(w: String)(body: => Option[Int]): Option[Int] =
    if (harmony(w)) body else None

  private val LAr = Seq("lar", "ler")
  private val LArI = Seq("ları", "leri")
  private val DA = Seq("da", "de", "ta", "te")
  private val NdA = Seq("nda", "nde")
  private val DAn = Seq("dan", "den", "tan", "ten")
  private val NdAn = Seq("ndan", "nden")
  private val NUn = Seq("ın", "in", "un", "ün")
  private val LA = Seq("la", "le")
  private val CA = Seq("ca", "ce")
  private val AE = Seq("a", "e")
  private val U1 = Seq("ı", "i", "u", "ü")
  private val MUzNUz =
    Seq("mız", "miz", "muz", "müz", "nız", "niz", "nuz", "nüz")
  private val UM = Seq("um", "üm", "ım", "im")
  private val SUn = Seq("sun", "sün", "sın", "sin")
  private val UZ = Seq("uz", "üz", "ız", "iz")
  private val SUnUz = Seq("sunuz", "sünüz", "sınız", "siniz")
  private val NUz = Seq("nuz", "nüz", "nız", "niz")
  private val DUr = Seq("dur", "dür", "dır", "dir",
    "tur", "tür", "tır", "tir")
  private val CAsInA = Seq("casına", "cesine")
  private val YDU = Seq("dı", "di", "du", "dü", "tı", "ti", "tu", "tü")
  private val SA = Seq("sa", "se")
  private val YmUs = Seq("muş", "müş", "mış", "miş")

  private def mLAr(w: String) = hm(w)(among(w, LAr))
  private def mLArI(w: String) = hm(w)(among(w, LArI))
  private def mKi(w: String) =
    if (w.endsWith("ki")) Some(w.length - 2) else None
  private def mDA(w: String) = hm(w)(among(w, DA))
  private def mNdA(w: String) = hm(w)(among(w, NdA))
  private def mDAn(w: String) = hm(w)(among(w, DAn))
  private def mNdAn(w: String) = hm(w)(among(w, NdAn))
  private def mNUn(w: String) =
    hm(w)(among(w, NUn).flatMap(optC(w, _, 'n')))
  private def mYlA(w: String) =
    hm(w)(among(w, LA).flatMap(optC(w, _, 'y')))
  private def mNcA(w: String) =
    hm(w)(among(w, CA).flatMap(optC(w, _, 'n')))
  private def mNA(w: String) =
    hm(w)(among(w, AE).flatMap(optC(w, _, 'n')))
  private def mYA(w: String) =
    hm(w)(among(w, AE).flatMap(optC(w, _, 'y')))
  private def mNU(w: String) =
    hm(w)(among(w, U1).flatMap(optC(w, _, 'n')))
  private def mYU(w: String) =
    hm(w)(among(w, U1).flatMap(optC(w, _, 'y')))
  private def mSU(w: String) =
    hm(w)(among(w, U1).flatMap(optC(w, _, 's')))
  private def mPoss(w: String) = hm(w)(
    among(w, MUzNUz).flatMap(optU(w, _)).orElse(
      among(w, Seq("m", "n")).flatMap(optU(w, _))))
  private def mYUm(w: String) =
    hm(w)(among(w, UM).flatMap(optC(w, _, 'y')))
  private def mSUn(w: String) = hm(w)(among(w, SUn))
  private def mYUz(w: String) =
    hm(w)(among(w, UZ).flatMap(optC(w, _, 'y')))
  private def mSUnUz(w: String) = hm(w)(among(w, SUnUz))
  private def mNUz(w: String) = hm(w)(among(w, NUz))
  private def mDUr(w: String) = hm(w)(among(w, DUr))
  private def mCAsInA(w: String) = hm(w)(among(w, CAsInA))
  private def mYDU(w: String) =
    hm(w)(among(w, YDU).flatMap(optC(w, _, 'y')))
  private def mYsA(w: String) =
    hm(w)(among(w, SA).flatMap(optC(w, _, 'y')))
  private def mYmUs(w: String) =
    hm(w)(among(w, YmUs).flatMap(optC(w, _, 'y')))
  private def mYken(w: String) =
    among(w, Seq("ken")).flatMap(optC(w, _, 'y')) // invariant suffix

  private def cut(w: String, p: Int): String = w.substring(0, p)

  /** Nominal verb suffixes; returns (word, continue-with-noun?). */
  private def nominalVerb(w0: String): (String, Boolean) = {
    // -(y)mUş / -(y)DU / -(y)sA / -yken
    mYmUs(w0).orElse(mYDU(w0)).orElse(mYsA(w0)).orElse(mYken(w0))
      .foreach(p => return (cut(w0, p), true))
    // -cAsInA [+person] + required -(y)mUş
    mCAsInA(w0).foreach { p =>
      val w1 = cut(w0, p)
      val w2 = mSUnUz(w1).orElse(mLAr(w1)).orElse(mYUm(w1))
        .orElse(mSUn(w1)).orElse(mYUz(w1)).map(cut(w1, _)).getOrElse(w1)
      mYmUs(w2).foreach(q => return (cut(w2, q), true))
      return (w1, true) // cAsInA alone still strips
    }
    // -lAr [+ -DUr/-(y)DU/-(y)sA/-(y)mUş → verb: stop noun stemming]
    mLAr(w0).foreach { p =>
      val w1 = cut(w0, p)
      mDUr(w1).orElse(mYDU(w1)).orElse(mYsA(w1)).orElse(mYmUs(w1))
        .foreach(q => return (cut(w1, q), false))
      return (w1, true)
    }
    // -nUz + required past/conditional
    mNUz(w0).foreach { p =>
      val w1 = cut(w0, p)
      mYDU(w1).orElse(mYsA(w1))
        .foreach(q => return (cut(w1, q), true))
      // required: without it the nUz match does not fire
    }
    // -sUnUz / -(y)Uz / -sUn / -(y)Um [+ -(y)mUş]
    mSUnUz(w0).orElse(mYUz(w0)).orElse(mSUn(w0)).orElse(mYUm(w0))
      .foreach { p =>
        val w1 = cut(w0, p)
        mYmUs(w1).foreach(q => return (cut(w1, q), true))
        return (w1, true)
      }
    // -DUr [+ person + required -(y)mUş]
    mDUr(w0).foreach { p =>
      val w1 = cut(w0, p)
      val w2 = mSUnUz(w1).orElse(mLAr(w1)).orElse(mYUm(w1))
        .orElse(mSUn(w1)).orElse(mYUz(w1)).map(cut(w1, _)).getOrElse(w1)
      mYmUs(w2).foreach(q => return (cut(w2, q), true))
      return (w1, true)
    }
    (w0, true)
  }

  /** try(possessive → plural → ki) continuations after a case mark. */
  private def afterCase(w0: String): String = {
    mPoss(w0).orElse(mSU(w0)).foreach { p =>
      val w1 = cut(w0, p)
      mLAr(w1).foreach { q =>
        val w2 = cut(w1, q); return kiChain(w2).getOrElse(w2)
      }
      return kiChain(w1).getOrElse(w1)
    }
    mLAr(w0).foreach { q =>
      val w1 = cut(w0, q); return kiChain(w1).getOrElse(w1)
    }
    kiChain(w0).getOrElse(w0)
  }

  /** The -ki chain: strip `ki`, then REQUIRE the case it attached to
    * (locative -DA / genitive -(n)Un / -ndA), then continue like any
    * case removal. Fails (None) when no case precedes — `ki` is only
    * a suffix after those cases. */
  private def kiChain(w0: String): Option[String] = mKi(w0).flatMap { p =>
    val w1 = cut(w0, p)
    mDA(w1).map(q => afterCase(cut(w1, q)))
      .orElse(mNUn(w1).map(q => afterCase(cut(w1, q))))
      .orElse(mNdA(w1).flatMap { q =>
        val w2 = cut(w1, q)
        mLArI(w2).map(cut(w2, _))
          .orElse(mSU(w2).map { r =>
            val w3 = cut(w2, r)
            mLAr(w3).map { s =>
              val w4 = cut(w3, s); kiChain(w4).getOrElse(w4)
            }.getOrElse(kiChain(w3).getOrElse(w3))
          })
          .orElse(kiChain(w2))
      })
  }

  /** Noun suffixes: one pass, first family that fires wins (with
    * REQUIRED inner continuations where the bare mark over-matches —
    * -ndA/-nA/-ndAn/-nU only exist after a possessive, so a failed
    * continuation restores the word; hand-verified on arabaya/masada/
    * evleri, where the required inner is what prevents over-stemming). */
  private def nounSuffixes(w0: String): String = {
    // plural first: -lAr [+ki]
    mLAr(w0).foreach { p =>
      val w1 = cut(w0, p); return kiChain(w1).getOrElse(w1)
    }
    // -ncA
    mNcA(w0).foreach { p =>
      val w1 = cut(w0, p)
      mLArI(w1).foreach(q => return cut(w1, q))
      return afterCase(w1)
    }
    // -ndA / -nA: REQUIRED continuation (possessive context)
    mNdA(w0).orElse(mNA(w0)).foreach { p =>
      val w1 = cut(w0, p)
      mLArI(w1).foreach(q => return cut(w1, q))
      mSU(w1).foreach { q =>
        val w2 = cut(w1, q)
        mLAr(w2).foreach { r =>
          val w3 = cut(w2, r); return kiChain(w3).getOrElse(w3)
        }
        return kiChain(w2).getOrElse(w2)
      }
      kiChain(w1).foreach(r => return r)
      // required inner failed: fall through to later families
    }
    // -ndAn / -nU: REQUIRED continuation
    mNdAn(w0).orElse(mNU(w0)).foreach { p =>
      val w1 = cut(w0, p)
      mSU(w1).foreach { q =>
        val w2 = cut(w1, q)
        mLAr(w2).foreach { r =>
          val w3 = cut(w2, r); return kiChain(w3).getOrElse(w3)
        }
        return kiChain(w2).getOrElse(w2)
      }
      mLArI(w1).foreach(q => return cut(w1, q))
    }
    // -DAn
    mDAn(w0).foreach(p => return afterCase(cut(w0, p)))
    // -(n)Un / -(y)lA
    mNUn(w0).orElse(mYlA(w0)).foreach(p => return afterCase(cut(w0, p)))
    // -lArI
    mLArI(w0).foreach(p => return cut(w0, p))
    // bare ki chain (evdeki)
    kiChain(w0).foreach(r => return r)
    // -DA / -(y)U / -(y)A
    mDA(w0).orElse(mYU(w0)).orElse(mYA(w0)).foreach { p =>
      val w1 = cut(w0, p)
      mPoss(w1).foreach { q =>
        val w2 = cut(w1, q)
        mLAr(w2).foreach { r =>
          val w3 = cut(w2, r); return kiChain(w3).getOrElse(w3)
        }
        return kiChain(w2).getOrElse(w2)
      }
      mLAr(w1).foreach { q =>
        val w2 = cut(w1, q); return kiChain(w2).getOrElse(w2)
      }
      return w1
    }
    // possessive / -(s)U alone [+plural +ki]
    mPoss(w0).orElse(mSU(w0)).foreach { p =>
      val w1 = cut(w0, p)
      mLAr(w1).foreach { q =>
        val w2 = cut(w1, q); return kiChain(w2).getOrElse(w2)
      }
      return kiChain(w1).getOrElse(w1)
    }
    w0
  }

  /** Postlude: append harmonic U to stems ending d/g, then devoice the
    * final consonant (published order: the appended vowel shields d/g
    * from devoicing; b/c/ğ still devoice). */
  private def postlude(w0: String): String = {
    var w = w0
    if (w.nonEmpty && (w.last == 'd' || w.last == 'g')) {
      var i = w.length - 1
      while (i >= 0 && !isV(w.charAt(i))) i -= 1
      if (i >= 0) w = w + (w.charAt(i) match {
        case 'a' | 'ı' => 'ı'
        case 'e' | 'i' => 'i'
        case 'o' | 'u' => 'u'
        case 'ö' | 'ü' => 'ü'
      })
    }
    if (w.nonEmpty) w.last match {
      case 'b' => w = w.dropRight(1) + 'p'
      case 'c' => w = w.dropRight(1) + 'ç'
      case 'd' => w = w.dropRight(1) + 't'
      case 'ğ' => w = w.dropRight(1) + 'k'
      case _ => ()
    }
    w
  }

  /** Stem one lowercase Turkish word (the analyzer applies the
    * dotless-i case fold İ→i/I→ı BEFORE lowercase). Words with ≤1
    * vowel or characters outside the Turkish alphabet pass through
    * unchanged, like the other stemmers' letter gates. */
  def stem(input: String): String = {
    var vowels = 0
    var ok = true
    var k = 0
    while (k < input.length) {
      val c = input.charAt(k)
      if (!Letters(c)) ok = false
      if (Vowels(c)) vowels += 1
      k += 1
    }
    if (!ok || vowels < 2) return input
    val (w1, cont) = nominalVerb(input)
    val w2 = if (cont) nounSuffixes(w1) else w1
    // Documented divergence from the published single pass: one final
    // bare -(y)U/-(y)A surface strip. A stem-final vowel is
    // surface-identical to a buffer-less dative/accusative, so the
    // published pass order leaves plural/copula-stripped forms one
    // strip AHEAD of possessive-stripped forms on vowel-final stems
    // (arabalar→arap but arabam→araba). This engine analyzes both the
    // corpus and the query, so inflection-family CONSISTENCY is the
    // property that matters — the final strip makes every family
    // member meet (arabam/arabalar/arabaya/araba all → arap).
    //
    // Reviewed and kept as-is: gating this strip on "an earlier
    // suffix family fired" would be a NO-OP, not a precision fix —
    // when neither pass stripped anything, nounSuffixes already tried
    // and failed these same -(y)U/-(y)A marks in its last families
    // (every earlier family returns a CHANGED word), so the strip
    // below cannot fire on an untouched word. And BARE vowel-final
    // nouns (araba, masa) lose their final vowel inside the single
    // published pass anyway: the -(y)A mark's optional-y rule accepts
    // a consonant-preceded final vowel, so the araba/arap conflation
    // is the published algorithm's own behavior, not introduced by
    // this strip (spec: "bare vowel-final nouns strip in the
    // published single pass").
    val w3 = mYU(w2).orElse(mYA(w2)).map(cut(w2, _)).getOrElse(w2)
    postlude(w3)
  }
}

/** Scalar stem expression — one static call inside whole-stage
  * codegen, the [[RussianStem]] shape. */
case class TurkishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"turkish_stem expects a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TurkishSnowball.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TurkishSnowball.stem($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object TurkishStemFunctions {
  def turkish_stem(c: Column): Column =
    ColumnBridge.column(TurkishStem(ColumnBridge.expression(c)))
}
