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
  * guidance (omit the collation instead), as are unsupported locales:
  * a silently-ignored collation would return WRONG rows.
  *
  * The fold is a deterministic scalar key expression, so collated
  * predicates still push down as data filters and collated sorts ride the
  * normal sort machinery — nothing about the plan shape changes at scale.
  */
object Collation {

  final case class Spec(locale: String, strength: Int,
      numericOrdering: Boolean = false) {
    /** Collation key for a string column under this spec. Strength 3 is
      * the binary comparison (only reachable with numericOrdering, which
      * rewrites digit runs into length-prefixed form so the binary
      * comparison of the KEY is numeric — see
      * [[graft.functions.NumericKey]]). */
    def key(c: Column): Column = {
      val base =
        if (strength == 1) stripDiacritics(lower(c))
        else if (strength == 2) lower(c)
        else c
      if (numericOrdering)
        graft.functions.CollationFunctions.numeric_sort_key(base)
      else base
    }
    /** Driver-side twin of [[key]] for literal query values. */
    def fold(s: String): String = {
      val low =
        if (strength == 3) s else s.toLowerCase(java.util.Locale.ROOT)
      val folded = if (strength == 1) low.map(ch => {
        val i = Accented.indexOf(ch); if (i >= 0) Plain(i) else ch
      }) else low
      if (numericOrdering) graft.functions.NumericKey.key(folded)
      else folded
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

  /** Locales whose strength-1/2 folding the lower+strip mapping models
    * faithfully enough (no locale-specific tailoring like tr dotless-i
    * or sv å/ä/ö-after-z ordering). */
  private val SupportedLocales =
    Set("simple", "en", "en_US", "en_GB", "fr", "de", "es", "pt", "it", "nl")

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
    // strength 3 is the engine's default binary comparison — on its own
    // the collation would be a no-op, so it stays rejected unless
    // numericOrdering gives the spec something to do
    require(strength == 1 || strength == 2 ||
        (strength == 3 && numericOrdering),
      s"collation: strength $strength unsupported — 1 (case+diacritic " +
        "insensitive) and 2 (case-insensitive) are mapped; strength 3+ " +
        "is the default binary comparison, omit the collation instead")
    val known = Set("locale", "strength", "numericOrdering")
    val extra = doc.keySet -- known
    require(extra.isEmpty,
      s"collation: unsupported options " +
        s"${extra.toSeq.sorted.mkString(", ")} (caseLevel and " +
        "alternate have no faithful mapping here and would return " +
        "wrong rows silently)")
    Spec(locale, strength, numericOrdering)
  }
}
