package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mongo `collation` option — case/diacritic-insensitive comparison and
  * sort, mapped to COMPILE-TIME key expressions (the reference's driver
  * options surface passes collation through to the server:
  * /root/reference/db/wrapper.go:452-481, client/client.go:28-29).
  *
  * ICU strength mapping:
  *   - strength 2 (secondary): case-insensitive — both sides fold to
  *     lowercase.
  *   - strength 1 (primary): case- AND diacritic-insensitive — lowercase
  *     plus a Latin-1/Latin-Extended diacritic-strip `translate` (the
  *     common-European subset; scan-fused, codegen'd).
  * Strength 3+ is the engine's default binary comparison — rejected with
  * guidance (omit the collation instead) unless `numericOrdering` or
  * `alternate: "shifted"` gives the key something to do; unsupported
  * locales reject the same way: a silently-ignored collation would
  * return WRONG rows.
  *
  * `alternate: "shifted"` (ICU variable weighting) strips the variable
  * characters — whitespace + punctuation under the default
  * `maxVariable: "punct"`, whitespace only under `"space"` — before the
  * strength fold, so "re-use" collates equal to "reuse". `caseLevel:
  * true` adds ICU's case level after the primary comparison: the key
  * becomes a (primary, case-pattern) struct whose field-lexicographic
  * order IS "whole primary level first, then case".
  *
  * The fold is a deterministic scalar key expression, so collated
  * predicates still push down as data filters and collated sorts ride the
  * normal sort machinery — nothing about the plan shape changes at scale.
  */
object Collation {

  final case class Spec(locale: String, strength: Int,
      numericOrdering: Boolean = false,
      alternateShifted: Boolean = false,
      maxVariable: String = "punct",
      caseLevel: Boolean = false,
      caseFirst: String = "off",
      backwards: Boolean = false,
      normalization: Boolean = false) {

    /** True when [[key]] produces a STRUCT-typed key (caseLevel's
      * (primary, case-pattern) pair, or a tailored locale's strength-2
      * (primary, secondary) pair) — consumers that mix non-string
      * literals into an `isin` must drop them instead (int vs struct
      * fails analysis, where Mongo semantics are "matches no string
      * row"). */
    def structKey: Boolean =
      caseLevel || (strength == 2 && Tailorings.contains(locale))

    // ICU case weights: under the default (off/lower) lowercase and
    // uncased elements order before uppercase; caseFirst "upper" swaps
    // the two bit characters, so uppercase orders first and uncased
    // elements (digit runs under numericOrdering) still group with
    // lowercase — a pure relabeling of the existing case-bit string
    private def caseBits: (String, String) =
      if (caseFirst == "upper") ("1", "0") else ("0", "1")

    // ICU `alternate: shifted`: the variable characters (whitespace +
    // punctuation under maxVariable "punct", whitespace only under
    // "space") are ignored at strengths 1-3 — "re-use" collates equal
    // to "reuse". The strip runs BEFORE case/diacritic folding, on both
    // the column and the literal sides.
    private def variableRegex: String =
      if (maxVariable == "space") "\\s+" else "[\\p{P}\\s]+"

    /** Collation key for a string column under this spec. Strength 3 is
      * the binary comparison (only reachable with numericOrdering or
      * alternate "shifted", which give the key something to do —
      * numericOrdering rewrites digit runs into length-prefixed form so
      * the binary comparison of the KEY is numeric, see
      * [[graft.functions.NumericKey]]). With `caseLevel` the key is a
      * two-field struct (primary key, case pattern): struct comparison
      * is field-lexicographic, exactly ICU's "compare the whole primary
      * level, then the case level" — a single concatenated string would
      * need a separator below 'U+0001' (taken by the numeric marker),
      * and embedded NULs don't survive every engine.
      *
      * TAILORED locales ([[Tailorings]]): the primary level routes the
      * tailored letters to private-use stand-ins before the generic
      * accent strip — post-z for å/ä/ö (sv) and æ/ø/å (da/nb/no), a
      * whole re-ordered alphabet page for tr (ç after c, ı before i,
      * with the dotless-i case fold applied before lowercase), ё→е
      * for ru — and strength 2 becomes a (primary, secondary) struct:
      * ICU compares the whole primary level first, then accents, with
      * the secondary string's within-group order corrected where
      * binary disagrees with CLDR (da: æ<<ä, ø<<ö; đ<<ð; acute<<grave
      * for fr/tr). fr/fr_CA tailor NOTHING at the primary level but
      * gain the true two-level reading ("côte" < "cozy"), which is
      * what `backwards` (fr_CA's default) reverses — the secondary
      * key is reversed so binary order reads accents from the END.
      * `normalization: true` composes the input to NFC first
      * ([[graft.functions.NfcNormalize]]), so canonically-equivalent
      * decomposed input collates equal. */
    def key(c: Column): Column = {
      // normalization: true composes the input to NFC FIRST, so
      // canonically-equivalent (decomposed) input hits the same
      // precomposed fold tables — both sides of every comparison
      val base00 =
        if (normalization)
          graft.functions.CollationFunctions.nfc_normalize(c)
        else c
      val base0 =
        if (alternateShifted) regexp_replace(base00, variableRegex, "")
        else base00
      val num: Column = Tailorings.get(locale) match {
        // the tailored two-level key exists at strengths 1/2 only; a
        // non-primary-reordering tailoring (fr/fr_CA) at strength 3
        // (numericOrdering / shifted) falls through to the generic
        // binary path below, like any untailored locale
        case Some(t) if strength <= 2 =>
          def numify(x: Column): Column =
            if (numericOrdering)
              graft.functions.CollationFunctions.numeric_sort_key(x)
            else x
          // locale-tailored CASE folding runs BEFORE lowercase (tr:
          // I→ı, İ→i — dotless-i changes the fold itself, not just
          // the order)
          val cased =
            if (t.preLowerFrom.isEmpty) base0
            else translate(base0, t.preLowerFrom, t.preLowerTo)
          val lowered = lower(cased)
          // LITERAL replace (like the driver twin's String.replace) —
          // regexp_replace would silently diverge from foldLit the day
          // a tailoring's digraph contains a regex metacharacter
          val pre = t.preReplace.fold(lowered) { case (f, r) =>
            replace(lowered, lit(f), lit(r))
          }
          val routed =
            if (t.primaryFrom.isEmpty) pre
            else translate(pre, t.primaryFrom, t.primaryTo)
          val primary = numify(stripDiacritics(routed))
          if (strength == 1) primary
          else {
            val sec0 =
              if (t.secondaryFrom.isEmpty) pre
              else translate(pre, t.secondaryFrom, t.secondaryTo)
            val sec = numify(sec0)
            // backwards (fr_CA default): the secondary level compares
            // from the END of the string — exactly the binary order of
            // the REVERSED secondary key (primaries tie ⇒ base letters
            // and any digit-run encodings are identical on both sides,
            // so the reversal aligns position-by-position and the
            // first difference is the LAST accent difference)
            struct(primary.as("p1"),
              (if (backwards) reverse(sec) else sec).as("s2"))
          }
        case _ =>
          val primary =
            if (strength == 1) stripDiacritics(lower(base0))
            else if (strength == 2) lower(base0)
            else base0
          if (numericOrdering)
            graft.functions.CollationFunctions.numeric_sort_key(primary)
          else primary
      }
      if (caseLevel) {
        // under numericOrdering a whole digit run is ONE collation
        // element (ICU CODAN), so it contributes one uncased position
        // to the case level — collapse the run BEFORE the bit mapping,
        // or "A07" (case '100') vs "A7" (case '10') would break the
        // "zeros collate equal" guarantee on pattern length alone
        val caseSrc =
          if (numericOrdering) regexp_replace(base0, "[0-9]+", "0")
          else base0
        // flatten NON-uppercase first: a literal bit char in the data
        // must flatten before uppercase letters mark, or data digits
        // would masquerade as case bits
        val (lo, hi) = caseBits
        struct(num.as("p"),
          regexp_replace(regexp_replace(caseSrc, "[^\\p{Lu}]", lo),
            "\\p{Lu}", hi).as("c"))
      } else num
    }

    /** Case pattern for the caseLevel struct key — the driver-side twin
      * of the column path's regexp pair. Both iterate per Unicode CODE
      * POINT (Java regexes match astral characters as one unit, so the
      * driver side must too — mapping per UTF-16 char would emit two
      * pattern chars for an emoji or a mathematical capital like U+1D400
      * and silently match nothing), and both collapse each maximal digit
      * run to one uncased position when numericOrdering is on. */
    private[query] def casePattern(base0: String): String = {
      val (lo, hi) = caseBits
      val sb = new java.lang.StringBuilder(base0.length)
      var i = 0
      while (i < base0.length) {
        val cp = base0.codePointAt(i)
        if (numericOrdering && cp >= '0' && cp <= '9') {
          sb.append(lo) // uncased: groups with lowercase in both modes
          while (i < base0.length && {
            val c = base0.charAt(i); c >= '0' && c <= '9'
          }) i += 1
        } else {
          sb.append(
            if (Character.getType(cp) == Character.UPPERCASE_LETTER) hi
            else lo)
          i += Character.charCount(cp)
        }
      }
      sb.toString
    }

    /** Driver-side twin of [[key]] for literal query values (the
      * non-caseLevel, non-tailored string form; [[foldLit]] is the
      * Column form every predicate should compare against). */
    def fold(s: String): String = {
      val s0 =
        if (normalization) graft.functions.NfcNormalizer.nfc(s) else s
      val varStripped =
        if (alternateShifted) s0.replaceAll(variableRegex, "") else s0
      val low =
        if (strength == 3) varStripped
        else varStripped.toLowerCase(java.util.Locale.ROOT)
      val folded = if (strength == 1) low.map(ch => {
        val i = Accented.indexOf(ch); if (i >= 0) Plain(i) else ch
      }) else low
      if (numericOrdering) graft.functions.NumericKey.key(folded)
      else folded
    }

    // driver-side twins of the tailored column chain: per-char
    // translate (the column `translate` semantics) after lower +
    // digraph fold
    private def translateStr(s: String, from: String, to: String): String =
      s.map(ch => { val i = from.indexOf(ch); if (i >= 0) to(i) else ch })
    private def tailoredPre(t: Tailoring, s: String): String = {
      val cased =
        if (t.preLowerFrom.isEmpty) s
        else translateStr(s, t.preLowerFrom, t.preLowerTo)
      val low = cased.toLowerCase(java.util.Locale.ROOT)
      t.preReplace.fold(low) { case (f, r) => low.replace(f, r) }
    }
    private[query] def tailoredPrimary(t: Tailoring, s: String): String = {
      val p =
        if (t.primaryFrom.isEmpty) tailoredPre(t, s)
        else translateStr(tailoredPre(t, s), t.primaryFrom, t.primaryTo)
      val stripped = p.map(ch => {
        val i = Accented.indexOf(ch); if (i >= 0) Plain(i) else ch
      })
      if (numericOrdering) graft.functions.NumericKey.key(stripped)
      else stripped
    }
    private[query] def tailoredSecondary(t: Tailoring, s: String): String = {
      val pre = tailoredPre(t, s)
      val sec =
        if (t.secondaryFrom.isEmpty) pre
        else translateStr(pre, t.secondaryFrom, t.secondaryTo)
      val keyed =
        if (numericOrdering) graft.functions.NumericKey.key(sec) else sec
      // surrogate-pair-safe reverse (java StringBuilder.reverse keeps
      // pairs intact), matching Spark's code-point-aware
      // UTF8String.reverse on the column side — Scala's String.reverse
      // would swap an emoji's surrogates into an invalid order and
      // silently diverge from key()
      if (backwards)
        new java.lang.StringBuilder(keyed).reverse.toString
      else keyed
    }

    /** Literal query value folded to the SAME shape [[key]] produces —
      * a string normally, a (primary, secondary) struct for tailored
      * strength 2, the (primary, case-pattern) struct under caseLevel
      * (nesting the tailored struct when both apply). */
    def foldLit(s: String): Column = {
      val s0 =
        if (normalization) graft.functions.NfcNormalizer.nfc(s) else s
      val base0 =
        if (alternateShifted) s0.replaceAll(variableRegex, "") else s0
      val inner: Column = Tailorings.get(locale) match {
        case Some(t) if strength <= 2 =>
          if (strength == 1) lit(tailoredPrimary(t, base0))
          else struct(lit(tailoredPrimary(t, base0)).as("p1"),
            lit(tailoredSecondary(t, base0)).as("s2"))
        case _ => lit(fold(s))
      }
      if (caseLevel) {
        // Character.getType(codePoint) == UPPERCASE_LETTER is the exact
        // driver-side twin of the column path's \p{Lu} (isUpper would
        // also accept Other_Uppercase chars like Roman numerals and
        // drift); per-code-point in [[casePattern]], matching the regex
        struct(inner.as("p"), lit(casePattern(base0)).as("c"))
      } else inner
    }
  }

  // lowercase Latin accent → base letter (the fold runs on lowercased
  // input, so only lowercase forms are needed); the parallel translate
  // tables derive from the pairs so they can never drift out of sync
  private val FoldPairs: Seq[(String, Char)] = Seq(
    "àáâãäåāăą" -> 'a', "èéêëēĕėęě" -> 'e', "ìíîïĩīĭįı" -> 'i',
    "òóôõöøōŏő" -> 'o', "ùúûüũūŭůűų" -> 'u', "çćĉċč" -> 'c',
    "ñńņň" -> 'n', "ýÿŷ" -> 'y', "šśŝş" -> 's', "žźż" -> 'z',
    "đď" -> 'd', "ģğĝġ" -> 'g', "ķ" -> 'k', "ĺļľł" -> 'l',
    "ŕŗř" -> 'r', "ţť" -> 't', "ŵ" -> 'w', "æ" -> 'a', "œ" -> 'o')
  private val Accented = FoldPairs.map(_._1).mkString
  private val Plain =
    FoldPairs.map { case (s, c) => c.toString * s.length }.mkString

  private def stripDiacritics(c: Column): Column =
    translate(c, Accented, Plain)

  /** CLDR tailoring for locales whose letters RE-ORDER beyond the
    * lower+strip model (round 12). `primaryFrom/To` routes each
    * tailored letter to its primary stand-in — U+E000.. (private use:
    * above every Latin letter in both UTF-8 byte order and code-point
    * order, and absent from text) for the post-z letters, a base
    * letter for secondary-equal mappings (ü→y) — BEFORE the generic
    * accent strip, which then cannot touch them. `secondaryFrom/To`
    * fixes the within-group secondary order where raw binary disagrees
    * with CLDR. `preReplace` folds a digraph whose primary+secondary
    * equal a letter (da/nb "aa" ≡ å; their tertiary difference is
    * below strength 2). Divergences (documented, not modeled): sv ô
    * (CLDR: secondary-equal ö) strips to o; þ expansions; tertiary
    * tailoring — strength 3 stays rejected for these locales. */
  private[query] final case class Tailoring(
      primaryFrom: String, primaryTo: String,
      secondaryFrom: String = "", secondaryTo: String = "",
      preReplace: Option[(String, String)] = None,
      preLowerFrom: String = "", preLowerTo: String = "",
      reordersPrimary: Boolean = true)

  // DUCET orders acute BEFORE grave at the secondary level; Latin-1
  // binary has the opposite (\u00e0=E0 < \u00e1=E1). The swap fixes the
  // pair on every vowel; other marks (breve/circumflex/ring/diaeresis/
  // tilde) keep binary order \u2014 a documented approximation of the
  // full DUCET mark sequence.
  private val AcuteGraveFrom = "\u00e0\u00e1\u00e8\u00e9\u00ec\u00ed\u00f2\u00f3\u00f9\u00fa"
  private val AcuteGraveTo = "\u00e1\u00e0\u00e9\u00e8\u00ed\u00ec\u00f3\u00f2\u00fa\u00f9"

  /** Full-alphabet private-use page tailoring: every letter of
    * `letters` (CLDR order; a multi-char entry is a DIGRAPH LETTER —
    * cs "ch" — routed via preReplace to its slot) maps to consecutive
    * code points from `pageBase`, and every accent-fold input
    * ([[FoldPairs]]) that is not itself a letter of the alphabet
    * routes to its base letter's stand-in (â→a's stand-in: the
    * generic strip runs AFTER the primary translate and could never
    * reach the stand-in page). This is the shape for locales whose
    * letters re-order MID-alphabet (ç between c and d has no spare
    * code point, unlike the Scandinavian post-z letters). Non-Latin
    * letters collate below the stand-ins — the same documented
    * divergence as the post-z PUA scheme. Secondary = raw lowered
    * text with the DUCET acute<<grave fix. */
  private def letterPage(letters: Seq[String], pageBase: Int,
      preLowerFrom: String = "", preLowerTo: String = ""): Tailoring = {
    val slots: Seq[(String, Char)] = letters.zipWithIndex.map {
      case (l, i) => l -> (pageBase + i).toChar }
    val single = slots.collect {
      case (l, c) if l.length == 1 => l.head -> c }
    val digraphs = slots.filter(_._1.length > 1)
    require(digraphs.size <= 1,
      "letterPage: one digraph letter per page (preReplace is single)")
    val standIn = single.toMap
    val letterSet = single.map(_._1).toSet
    val foldIns = FoldPairs.flatMap { case (accented, base) =>
      accented.filterNot(letterSet)
        .flatMap(ch => standIn.get(base).map(ch -> _)) }
    val all = single ++ foldIns
    Tailoring(
      primaryFrom = all.map(_._1).mkString,
      primaryTo = all.map(_._2).mkString,
      secondaryFrom = AcuteGraveFrom, secondaryTo = AcuteGraveTo,
      preReplace = digraphs.headOption.map {
        case (l, c) => l -> c.toString },
      preLowerFrom = preLowerFrom, preLowerTo = preLowerTo)
  }

  /** Turkish (CLDR tr): dotless-i changes the CASE FOLD itself (I→ı,
    * İ→i — applied BEFORE lowercase via `preLowerFrom/To`), and six
    * letters re-order mid-alphabet (ç after c, ğ after g, ı before i,
    * ö after o, ş after s, ü after u); q/w/x keep root positions. */
  private lazy val Turkish: Tailoring = letterPage(
    "abcçdefgğhıijklmnoöpqrsştuüvwxyz".map(_.toString),
    pageBase = 0xE100, preLowerFrom = "Iİ", preLowerTo = "ıi")

  /** Spanish (CLDR es): ñ is a DISTINCT letter between n and o — the
    * generic lower+strip model would fold it to n ("peña" ≡ "pena",
    * wrong at every strength). Accented vowels stay secondary. */
  private lazy val Spanish: Tailoring = letterPage(
    "abcdefghijklmnñopqrstuvwxyz".map(_.toString), pageBase = 0xE200)

  /** Polish (CLDR pl): nine letters with diacritics are distinct
    * primaries in place (a ą b c ć … z ź ż); q/v/x keep root
    * positions. */
  private lazy val Polish: Tailoring = letterPage(
    "aąbcćdeęfghijklłmnńoópqrsśtuvwxyzźż".map(_.toString),
    pageBase = 0xE300)

  /** Czech (CLDR cs): č/ř/š/ž are distinct primaries after their base
    * letters, and the DIGRAPH "ch" is ONE letter between h and i
    * (routed via preReplace on the lowered text — CLDR treats every
    * ch as the letter). ď/ť/ň/ě/ů/á/é/í/ó/ú/ý stay secondary via the
    * fold-ins. */
  private lazy val Czech: Tailoring = letterPage(
    Seq("a", "b", "c", "č", "d", "e", "f", "g", "h", "ch", "i", "j",
      "k", "l", "m", "n", "o", "p", "q", "r", "ř", "s", "š", "t", "u",
      "v", "w", "x", "y", "z", "ž"), pageBase = 0xE400)

  private[query] val Tailorings: Map[String, Tailoring] = {
    // Swedish (CLDR sv): \u2026 z < \u00e5 < \u00e4 << \u00e6 << \u0119 < \u00f6 << \u00f8 << \u0151 << \u0153;
    // \u00fc/\u0171 collate as y (secondary-higher); \u0111/\u00f0 as d. The secondary
    // binary order inside the post-z groups already matches CLDR
    // (\u00e4<\u00e6<\u0119, \u00f6<\u00f8<\u0151<\u0153, y<\u00fc<\u0171); the d-group needs \u0111<<\u00f0
    // (CLDR) while binary has \u00f0(F0)<\u0111(111) \u2014 swapped in the
    // secondary string.
    val sv = Tailoring(
      primaryFrom = "\u00e5\u00e4\u00e6\u0119\u00f6\u00f8\u0151\u0153\u00fc\u0171\u00f0",
      primaryTo = "\ue000\ue001\ue001\ue001\ue002\ue002\ue002\ue002yyd",
      secondaryFrom = "\u00f0\u0111", secondaryTo = "\u0111\u00f0")
    // Danish (CLDR da; nb/no share the core): \u2026 z < \u00e6 << \u00e4 < \u00f8 << \u00f6
    // << \u0151 < \u00e5 (\u2261 aa at tertiary); \u00fc/\u0171 as y; \u00f0 as d. Binary has
    // \u00e4(E4)<\u00e6(E6) and \u00f6(F6)<\u00f8(F8) \u2014 the OPPOSITE of CLDR's within-
    // group order \u2014 so the secondary string swaps each pair (and the
    // same \u0111<<\u00f0 fix as Swedish).
    val da = Tailoring(
      primaryFrom = "\u00e6\u00e4\u00f8\u00f6\u0151\u00e5\u00fc\u0171\u00f0",
      primaryTo = "\ue000\ue000\ue001\ue001\ue001\ue002yyd",
      secondaryFrom = "\u00e4\u00e6\u00f6\u00f8\u00f0\u0111", secondaryTo = "\u00e6\u00e4\u00f8\u00f6\u0111\u00f0",
      preReplace = Some("aa" -> "\u00e5"))
    // Russian (CLDR ru): Cyrillic \u0430-\u044f is contiguous and already in
    // CLDR primary order in code points; the ONE tailoring is \u0451,
    // which binary puts after \u044f (U+0451 > U+044F) but CLDR makes a
    // secondary variant of \u0435 (\u0435 << \u0451). Primary folds \u0451\u2192\u0435; the raw
    // lowered text is the secondary (binary \u0435(435) < \u0451(451) matches
    // CLDR's within-group order).
    val ru = Tailoring(primaryFrom = "\u0451", primaryTo = "\u0435")
    // French (CLDR fr = root order): no primary re-ordering, but the
    // TRUE two-level reading \u2014 whole primary level first, then
    // accents \u2014 needs the struct key ("c\u00f4te" < "cozy": t<z decides at
    // the primary level regardless of the accent). Secondary = the
    // raw lowered text with the acute/grave DUCET fix. This is also
    // what `backwards` (fr_CA's default) reverses.
    val fr = Tailoring(
      primaryFrom = "", primaryTo = "",
      secondaryFrom = AcuteGraveFrom, secondaryTo = AcuteGraveTo,
      reordersPrimary = false)
    Map("sv" -> sv, "da" -> da, "nb" -> da, "no" -> da,
      "ru" -> ru, "fr" -> fr, "fr_CA" -> fr, "tr" -> Turkish,
      "es" -> Spanish, "pl" -> Polish, "cs" -> Czech)
  }

  /** Locales whose strength-1/2 folding the lower+strip mapping models
    * faithfully enough, plus the CLDR-tailored set ([[Tailorings]]:
    * Scandinavian post-z letters, Russian \u0451, French two-level (+
    * fr_CA backwards-by-default), Turkish dotless-i + mid-alphabet
    * letter re-ordering). */
  private val SupportedLocales =
    Set("simple", "en", "en_US", "en_GB", "de", "pt", "it",
      "nl") ++ Tailorings.keySet

  /** Parse + validate a `{locale, strength}` collation document. Unknown
    * locales and strengths ≥ 3 are rejected LOUDLY — mapping them to the
    * binary default would silently return wrong rows. */
  def parse(doc: Map[String, Any]): Spec = {
    val locale = doc.getOrElse("locale",
      throw new IllegalArgumentException(
        "collation: locale is required")).toString
    require(SupportedLocales(locale),
      s"collation: unsupported locale '$locale' (supported: " +
        s"${SupportedLocales.toSeq.sorted.mkString(", ")} — others need " +
        "locale-tailored ICU rules this engine does not model)")
    val strength = doc.get("strength").map {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"collation.strength: $other")
    }.getOrElse(3)
    val numericOrdering = doc.get("numericOrdering") match {
      case Some(b: Boolean) => b
      case Some(other) => throw new IllegalArgumentException(
        s"collation.numericOrdering: $other (true/false)")
      case None => false
    }
    val alternateShifted = doc.get("alternate") match {
      case Some("shifted") => true
      case Some("non-ignorable") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"collation.alternate: '$other' (non-ignorable/shifted)")
    }
    val maxVariable = doc.get("maxVariable") match {
      case Some(v @ ("punct" | "space")) =>
        require(alternateShifted,
          "collation.maxVariable only applies with alternate: " +
            "\"shifted\" (it names which characters shift)")
        v.toString
      case None => "punct"
      case Some(other) => throw new IllegalArgumentException(
        s"collation.maxVariable: '$other' (punct/space)")
    }
    val caseLevel = doc.get("caseLevel") match {
      case Some(b: Boolean) => b
      case Some(other) => throw new IllegalArgumentException(
        s"collation.caseLevel: $other (true/false)")
      case None => false
    }
    // caseLevel inserts a case level ABOVE a case-folding strength; at
    // strength 3 the binary comparison already distinguishes case, so
    // the option would be a silent no-op — reject with guidance
    require(!caseLevel || strength == 1 || strength == 2,
      "collation: caseLevel applies with strength 1 (diacritic-" +
        "insensitive, case-significant) or 2 (case pattern compared " +
        "after the folded text); strength 3 is already case-sensitive " +
        "— omit caseLevel instead")
    // caseFirst reorders the CASE level, so it needs the case level to
    // exist: with caseLevel the key's case-bit string simply relabels
    // ("upper" puts uppercase first); without it, strength 1/2 have no
    // case distinction to reorder and strength 3's binary order is not
    // reorderable — reject with guidance instead of silently ignoring
    val caseFirst = doc.get("caseFirst") match {
      case Some(v @ ("upper" | "lower")) =>
        require(caseLevel,
          s"collation.caseFirst: '$v' needs caseLevel: true — the case " +
            "level is where upper/lower ordering lives in this engine " +
            "(add caseLevel, or omit caseFirst)")
        v.toString
      case Some("off") | None => "off"
      case Some(other) => throw new IllegalArgumentException(
        s"collation.caseFirst: '$other' (upper/lower/off)")
    }
    // strength 3 is the engine's default binary comparison — on its own
    // the collation would be a no-op, so it stays rejected unless
    // numericOrdering or alternate: shifted gives the spec something
    // to do
    require(strength == 1 || strength == 2 ||
        (strength == 3 && (numericOrdering || alternateShifted)),
      s"collation: strength $strength unsupported — 1 (case+diacritic " +
        "insensitive) and 2 (case-insensitive) are mapped; strength 3+ " +
        "is the default binary comparison, omit the collation instead")
    // locales whose tailoring re-orders PRIMARY letters (sv/da/nb/no/
    // ru/tr — not fr, whose tailoring only adds the two-level reading)
    // cannot run at strength 3: the binary comparison would ignore the
    // re-ordering (å after a, not after z) — reject instead of
    // silently sorting wrong
    require(strength != 3 ||
        !Tailorings.get(locale).exists(_.reordersPrimary),
      s"collation: locale '$locale' is CLDR-tailored (letters re-order " +
        "at the primary level) — strength 3's binary comparison cannot " +
        "honor it; use strength 1 or 2")
    // backwards reverses the SECONDARY (accent) level — it needs a
    // separately-keyed secondary, which exists exactly for tailored
    // locales at strength 2. fr_CA's ICU default is backwards; at
    // other strengths no secondary level is keyed, so the default
    // quietly stays off (an EXPLICIT backwards: true still rejects).
    val backwards = doc.get("backwards") match {
      case Some(b: Boolean) =>
        require(!b || (strength == 2 && Tailorings.contains(locale)),
          "collation.backwards reverses the secondary (accent) level, " +
            "which this engine keys separately only for two-level " +
            "locales (" +
            Tailorings.keySet.toSeq.sorted.mkString("/") +
            ") at strength 2 — use one of those, or omit backwards")
        b
      case Some(other) => throw new IllegalArgumentException(
        s"collation.backwards: $other (true/false)")
      case None => locale == "fr_CA" && strength == 2
    }
    val normalization = doc.get("normalization") match {
      case Some(b: Boolean) => b
      case Some(other) => throw new IllegalArgumentException(
        s"collation.normalization: $other (true/false)")
      case None => false
    }
    val known = Set("locale", "strength", "numericOrdering",
      "alternate", "maxVariable", "caseLevel", "caseFirst",
      "backwards", "normalization")
    val extra = doc.keySet -- known
    require(extra.isEmpty,
      s"collation: unsupported options " +
        s"${extra.toSeq.sorted.mkString(", ")}")
    Spec(locale, strength, numericOrdering, alternateShifted,
      maxVariable, caseLevel, caseFirst, backwards, normalization)
  }
}
