package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Snowball Spanish and Italian stemmers — the `lucene.spanish` /
  * `lucene.italian` analyzers and `$text $language` es/it, closing the
  * analyzer/collation locale gap (collation already claims es/it:
  * [[graft.query.Collation]] SupportedLocales).
  *
  * Both implement the published snowballstem.org algorithm definitions
  * (the canonical stemmers behind Lucene's Spanish/ItalianStemFilter),
  * same provenance and shape contract as [[FrenchSnowball]] /
  * [[GermanSnowball]]: implemented from the algorithm description; each
  * stemmer is a pure static function wrapped by a scalar Catalyst
  * expression whose generated code is ONE static call, so the column
  * path and the driver-side query-term path can never disagree. The
  * reference delegates all analysis to the Atlas server
  * (/root/reference/db/wrapper.go:88-94).
  *
  * Shared RV definition (the Spanish/Italian/Portuguese family): if the
  * second letter is a consonant, RV is the region after the next
  * following vowel; if the first two letters are vowels, after the next
  * consonant; otherwise (consonant-vowel) after the third letter; the
  * word end when the position does not exist.
  */
object SpanishSnowball {

  private val Vowels = "aeiouáéíóúü".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "áéíóúüñ".toSet

  private def deaccent(c: Char): Char = c match {
    case 'á' => 'a'
    case 'é' => 'e'
    case 'í' => 'i'
    case 'ó' => 'o'
    case 'ú' => 'u'
    case other => other
  }

  /** Stem one lowercase Spanish word (non-Spanish-alphabet tokens pass
    * through unchanged, Porter's contract). */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input
    var w = input

    // regions are LEFT positions computed once — suffix removal never
    // moves them ("suffix in R" = suffix start index >= region start)
    val rv = rvPos(w)
    val r1 = rPos(w, 0)
    val r2 = rPos(w, r1)

    // ---- step 0: attached pronoun — longest pronoun inside RV whose
    // preceding gerund/infinitive suffix also lies inside RV; group (a)
    // deletes the pronoun and removes the acute accent of the verb
    // suffix (haciéndola → haciendo), (b) just deletes, (c) yendo must
    // follow a u (the u need not be in RV)
    locally {
      val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
        "los", "nos", "me", "se", "la", "le", "lo").sortBy(-_.length)
      pronouns.find(p => w.endsWith(p) && w.length - p.length >= rv)
        .foreach { p =>
          val head = w.substring(0, w.length - p.length)
          val pa = Set("iéndo", "ándo", "ár", "ér", "ír")
          val all = (pa.toSeq ++ Seq("iendo", "ando", "yendo", "ar",
            "er", "ir")).sortBy(-_.length)
          all.find { s =>
            head.endsWith(s) && head.length - s.length >= rv &&
              (s != "yendo" || (head.length - s.length > 0 &&
                head.charAt(head.length - s.length - 1) == 'u'))
          } match {
            case Some(s) if pa(s) =>
              w = head.substring(0, head.length - s.length) +
                s.map(deaccent)
            case Some(_) => w = head
            case None => ()
          }
        }
    }

    // ---- step 1: standard suffixes — longest match across ALL groups
    // decides the action; a failed region condition then means NO
    // action (snowball `among`)
    var step1Changed = false
    locally {
      val n = w.length
      def start(s: String): Int = n - s.length
      def del(s: String): Unit = {
        w = w.substring(0, start(s)); step1Changed = true
      }
      def rep(s: String, by: String): Unit = {
        w = w.substring(0, start(s)) + by; step1Changed = true
      }
      val g1 = Set("amientos", "imientos", "amiento", "imiento",
        "anzas", "anza", "icos", "icas", "ico", "ica", "ismos", "ismo",
        "ables", "able", "ibles", "ible", "istas", "ista", "osos",
        "osas", "oso", "osa")
      val g2 = Set("adoras", "adores", "aciones", "adora", "ación",
        "ador", "antes", "ante", "ancias", "ancia")
      val suffixes = (g1.toSeq ++ g2.toSeq ++ Seq("logías", "logía",
        "uciones", "ución", "encias", "encia", "amente", "mente",
        "idades", "idad", "ivas", "ivos", "iva", "ivo"))
        .sortBy(-_.length)
      suffixes.find(w.endsWith) match {
        case None => ()
        case Some(suf) =>
          val st = start(suf)
          def inR2: Boolean = st >= r2
          if (g1(suf)) { if (inR2) del(suf) }
          else if (g2(suf)) {
            if (inR2) {
              del(suf)
              if (w.endsWith("ic") && w.length - 2 >= r2)
                w = w.dropRight(2)
            }
          } else suf match {
            case "logía" | "logías" => if (inR2) rep(suf, "log")
            case "ución" | "uciones" => if (inR2) rep(suf, "u")
            case "encia" | "encias" => if (inR2) rep(suf, "ente")
            case "amente" =>
              if (st >= r1) {
                del(suf)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.dropRight(2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.dropRight(2)
                } else if ((w.endsWith("os") || w.endsWith("ic") ||
                    w.endsWith("ad")) && w.length - 2 >= r2)
                  w = w.dropRight(2)
              }
            case "mente" =>
              if (inR2) {
                del(suf)
                if ((w.endsWith("ante") || w.endsWith("able") ||
                    w.endsWith("ible")) && w.length - 4 >= r2)
                  w = w.dropRight(4)
              }
            case "idad" | "idades" =>
              if (inR2) {
                del(suf)
                if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.dropRight(4)
                else if ((w.endsWith("ic") || w.endsWith("iv")) &&
                    w.length - 2 >= r2) w = w.dropRight(2)
              }
            case "iva" | "ivo" | "ivas" | "ivos" =>
              if (inR2) {
                del(suf)
                if (w.endsWith("at") && w.length - 2 >= r2)
                  w = w.dropRight(2)
              }
            case _ => ()
          }
      }
    }

    // ---- steps 2a/2b: verb suffixes, only when step 1 removed nothing;
    // matching is CONFINED to RV (setlimit), and a failed
    // preceded-by-u condition on the chosen longest match does NOT
    // fall back to shorter suffixes
    if (!step1Changed) {
      val suf2a = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen",
        "yas", "yes", "ya", "ye", "yo", "yó").sortBy(-_.length)
      val hit2a = suf2a.find(s =>
        w.endsWith(s) && w.length - s.length >= rv)
      val removed2a = hit2a.exists { s =>
        val st = w.length - s.length
        if (st > 0 && w.charAt(st - 1) == 'u') { // u need not be in RV
          w = w.substring(0, st); true
        } else false
      }
      if (!removed2a) {
        // 2b: the gu-aware group first class, then the long tail
        val gGu = Set("emos", "éis", "en", "es")
        val rest = Seq("aríais", "eríais", "iríais", "ásemos",
          "áramos", "iéramos", "iésemos", "ábamos", "íamos",
          "aríamos", "eríamos", "iríamos", "aremos", "eremos",
          "iremos", "asteis", "isteis", "abais", "arais", "aseis",
          "íais", "ierais", "ieseis", "arían", "arías", "aréis",
          "erían", "erías", "eréis", "irían", "irías", "iréis",
          "ieran", "iesen", "ieron", "iendo", "ieras", "ieses",
          "abas", "adas", "idas", "aras", "ases", "aran", "asen",
          "aron", "ando",
          "aban", "ados", "idos", "amos", "imos", "arán", "arás",
          "aría", "erán", "erás", "ería", "irán", "irás", "iría",
          "iera", "iese", "aste", "iste", "aba", "ada", "ida", "ara",
          "ase", "ían", "ado", "ido", "ías", "áis", "éis",
          "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
          "ís", "ará", "aré", "erá", "eré", "irá", "iré", "ió")
        val all = (gGu.toSeq ++ rest).distinct.sortBy(-_.length)
        all.find(s => w.endsWith(s) && w.length - s.length >= rv)
          .foreach { s =>
            w = w.dropRight(s.length)
            // "if preceded by gu delete the u" (u need not be in RV)
            if (gGu(s) && w.endsWith("gu")) w = w.dropRight(1)
          }
      }
    }

    // ---- step 3: residual vowel, in RV; e/é also absorb a preceding
    // gu's u when that u is in RV
    locally {
      val s3 = Seq("os", "a", "o", "á", "í", "ó", "e", "é")
        .sortBy(-_.length)
      s3.find(s => w.endsWith(s) && w.length - s.length >= rv)
        .foreach { s =>
          w = w.dropRight(s.length)
          if ((s == "e" || s == "é") && w.endsWith("gu") &&
            w.length - 1 >= rv) w = w.dropRight(1)
        }
    }

    // final: remove acute accents
    w.map(deaccent)
  }

  private def rvPos(w: String): Int = {
    val n = w.length
    if (n < 3) return n
    if (!v(w.charAt(1))) {
      var i = 2
      while (i < n && !v(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else if (v(w.charAt(0)) && v(w.charAt(1))) {
      var i = 2
      while (i < n && v(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else math.min(3, n)
  }

  private def rPos(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !v(w.charAt(i))) i += 1
    while (i < n && v(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }
}

/** Snowball Italian stemmer (snowballstem.org/algorithms/italian). */
object ItalianSnowball {

  private val Vowels = "aeiouàèìòù".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "àèìòùáéíóú".toSet

  /** Stem one lowercase Italian word. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input

    // ---- prelude: acute accents → grave; then mark u-after-q and
    // u/i between vowels upper-case (left to right over the LIVE
    // buffer, the French prelude discipline)
    val base = input.map {
      case 'á' => 'à'
      case 'é' => 'è'
      case 'í' => 'ì'
      case 'ó' => 'ò'
      case 'ú' => 'ù'
      case c => c
    }
    val sb = new java.lang.StringBuilder(base.length)
    var i = 0
    while (i < base.length) {
      val c = base.charAt(i)
      val prevV = i > 0 && v(sb.charAt(i - 1))
      val nextV = i + 1 < base.length && v(base.charAt(i + 1))
      val m =
        if ((c == 'u' || c == 'i') && prevV && nextV) c.toUpper
        else if (c == 'u' && i > 0 && sb.charAt(i - 1) == 'q') 'U'
        else c
      sb.append(m)
      i += 1
    }
    var w = sb.toString

    val rv = rvPos(w)
    val r1 = rPos(w, 0)
    val r2 = rPos(w, r1)

    // ---- step 0: attached pronoun after a gerund (deleted) or an
    // infinitive ar/er/ir (pronoun replaced by e: mangiarlo → mangiare)
    locally {
      val pronouns = Seq("gliela", "gliele", "glieli", "glielo",
        "gliene", "sene", "mela", "mele", "meli", "melo", "mene",
        "tela", "tele", "teli", "telo", "tene", "cela", "cele", "celi",
        "celo", "cene", "vela", "vele", "veli", "velo", "vene", "gli",
        "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi")
        .sortBy(-_.length)
      pronouns.find(p => w.endsWith(p) && w.length - p.length >= rv)
        .foreach { p =>
          val head = w.substring(0, w.length - p.length)
          val pa = Set("ando", "endo")
          (pa.toSeq ++ Seq("ar", "er", "ir")).sortBy(-_.length)
            .find(s => head.endsWith(s) &&
              head.length - s.length >= rv) match {
            case Some(s) if pa(s) => w = head
            case Some(_) => w = head + "e"
            case None => ()
          }
        }
    }

    // ---- step 1: standard suffixes (longest match across all groups)
    var step1Changed = false
    locally {
      val n = w.length
      def start(s: String): Int = n - s.length
      def del(s: String): Unit = {
        w = w.substring(0, start(s)); step1Changed = true
      }
      def rep(s: String, by: String): Unit = {
        w = w.substring(0, start(s)) + by; step1Changed = true
      }
      val g1 = Set("anza", "anze", "ico", "ici", "ica", "ice", "iche",
        "ichi", "ismo", "ismi", "abile", "abili", "ibile", "ibili",
        "ista", "iste", "isti", "istà", "istè", "istì", "oso", "osi",
        "osa", "ose", "mente", "atrice", "atrici", "ante", "anti")
      val g2 = Set("azione", "azioni", "atore", "atori")
      val suffixes = (g1.toSeq ++ g2.toSeq ++ Seq("logia", "logie",
        "uzione", "uzioni", "usione", "usioni", "enza", "enze",
        "amento", "amenti", "imento", "imenti", "amente", "ità",
        "ivo", "ivi", "iva", "ive")).sortBy(-_.length)
      suffixes.find(w.endsWith) match {
        case None => ()
        case Some(suf) =>
          val st = start(suf)
          def inR2: Boolean = st >= r2
          if (g1(suf)) { if (inR2) del(suf) }
          else if (g2(suf)) {
            if (inR2) {
              del(suf)
              if (w.endsWith("ic") && w.length - 2 >= r2)
                w = w.dropRight(2)
            }
          } else suf match {
            case "logia" | "logie" => if (inR2) rep(suf, "log")
            case "uzione" | "uzioni" | "usione" | "usioni" =>
              if (inR2) rep(suf, "u")
            case "enza" | "enze" => if (inR2) rep(suf, "ente")
            case "amento" | "amenti" | "imento" | "imenti" =>
              if (st >= rv) del(suf)
            case "amente" =>
              if (st >= r1) {
                del(suf)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.dropRight(2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.dropRight(2)
                } else if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.dropRight(4)
                else if ((w.endsWith("os") || w.endsWith("ic")) &&
                    w.length - 2 >= r2) w = w.dropRight(2)
              }
            case "ità" =>
              if (inR2) {
                del(suf)
                if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.dropRight(4)
                else if ((w.endsWith("ic") || w.endsWith("iv")) &&
                    w.length - 2 >= r2) w = w.dropRight(2)
              }
            case "ivo" | "ivi" | "iva" | "ive" =>
              if (inR2) {
                del(suf)
                if (w.endsWith("at") && w.length - 2 >= r2) {
                  w = w.dropRight(2)
                  if (w.endsWith("ic") && w.length - 2 >= r2)
                    w = w.dropRight(2)
                }
              }
            case _ => ()
          }
      }
    }

    // ---- step 2: verb suffixes in RV, only when step 1 removed nothing
    if (!step1Changed) {
      val suffixes2 = Seq("erebbero", "irebbero", "assero", "assimo",
        "eranno", "erebbe", "eremmo", "ereste", "eresti", "essero",
        "iranno", "irebbe", "iremmo", "ireste", "iresti", "iscano",
        "iscono", "issero", "arono", "avamo", "avano", "avate",
        "eremo", "erete", "erono", "evamo", "evano", "evate", "iremo",
        "irete", "irono", "ivamo", "ivano", "ivate", "ammo", "ando",
        "asse", "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
        "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce",
        "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato",
        "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi",
        "evo", "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva",
        "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")
        .sortBy(-_.length)
      suffixes2.find(s => w.endsWith(s) && w.length - s.length >= rv)
        .foreach(s => w = w.dropRight(s.length))
    }

    // ---- step 3a: final vowel in RV, then a preceding i in RV
    // (crocchio → crocch); 3b: final ch/gh → c/g in RV
    if (w.nonEmpty && "aeioàèìò".contains(w.charAt(w.length - 1)) &&
      w.length - 1 >= rv) {
      w = w.dropRight(1)
      if (w.nonEmpty && w.charAt(w.length - 1) == 'i' &&
        w.length - 1 >= rv) w = w.dropRight(1)
    }
    if ((w.endsWith("ch") || w.endsWith("gh")) && w.length - 2 >= rv)
      w = w.dropRight(1)

    // postlude: unmark
    w.map {
      case 'I' => 'i'
      case 'U' => 'u'
      case c => c
    }
  }

  private def rvPos(w: String): Int = {
    val n = w.length
    if (n < 3) return n
    if (!v(w.charAt(1))) {
      var i = 2
      while (i < n && !v(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else if (v(w.charAt(0)) && v(w.charAt(1))) {
      var i = 2
      while (i < n && v(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else math.min(3, n)
  }

  private def rPos(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !v(w.charAt(i))) i += 1
    while (i < n && v(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }
}

/** Snowball Portuguese stemmer (snowballstem.org/algorithms/portuguese).
  * The prelude marks nasalised vowels as two characters (ã → a~,
  * õ → o~ — '~' acts as a consonant), so the suffix lists carry the
  * marked forms (aça~o, ço~es, ara~o); the postlude restores them. */
object PortugueseSnowball {

  private val Vowels = "aeiouáéíóúâêô".toSet
  private def v(c: Char): Boolean = Vowels(c)
  private val Letters = ('a' to 'z').toSet ++ "áéíóúâêôãõç".toSet

  /** Stem one lowercase Portuguese word. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    if (!input.forall(Letters)) return input

    // prelude: nasal vowels become (vowel, '~') pairs — '~' is a
    // non-vowel, so regions and RV see the nasal as vowel+consonant
    var w = input.replace("ã", "a~").replace("õ", "o~")

    val rv = rvPos(w)
    val r1 = rPos(w, 0)
    val r2 = rPos(w, r1)
    var changed = false

    // ---- step 1: standard suffixes (longest match across all groups)
    locally {
      val n = w.length
      def start(s: String): Int = n - s.length
      def del(s: String): Unit = {
        w = w.substring(0, start(s)); changed = true
      }
      def rep(s: String, by: String): Unit = {
        w = w.substring(0, start(s)) + by; changed = true
      }
      val g1 = Set("amentos", "imentos", "amento", "imento", "adoras",
        "adores", "aço~es", "adora", "aça~o", "ador", "antes", "ante",
        "ância", "ezas", "eza", "icos", "icas", "ico", "ica", "ismos",
        "ismo", "ável", "ível", "istas", "ista", "osos", "osas", "oso",
        "osa")
      val suffixes = (g1.toSeq ++ Seq("logias", "logia", "uço~es",
        "uça~o", "ências", "ência", "amente", "mente", "idades",
        "idade", "ivas", "ivos", "iva", "ivo", "iras", "ira"))
        .sortBy(-_.length)
      suffixes.find(w.endsWith) match {
        case None => ()
        case Some(suf) =>
          val st = start(suf)
          def inR2: Boolean = st >= r2
          if (g1(suf)) { if (inR2) del(suf) }
          else suf match {
            case "logia" | "logias" => if (inR2) rep(suf, "log")
            case "uça~o" | "uço~es" => if (inR2) rep(suf, "u")
            case "ência" | "ências" => if (inR2) rep(suf, "ente")
            case "amente" =>
              if (st >= r1) {
                del(suf)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.dropRight(2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.dropRight(2)
                } else if ((w.endsWith("os") || w.endsWith("ic") ||
                    w.endsWith("ad")) && w.length - 2 >= r2)
                  w = w.dropRight(2)
              }
            case "mente" =>
              if (inR2) {
                del(suf)
                if ((w.endsWith("ante") || w.endsWith("avel") ||
                    w.endsWith("ível")) && w.length - 4 >= r2)
                  w = w.dropRight(4)
              }
            case "idade" | "idades" =>
              if (inR2) {
                del(suf)
                if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.dropRight(4)
                else if ((w.endsWith("ic") || w.endsWith("iv")) &&
                    w.length - 2 >= r2) w = w.dropRight(2)
              }
            case "iva" | "ivo" | "ivas" | "ivos" =>
              if (inR2) {
                del(suf)
                if (w.endsWith("at") && w.length - 2 >= r2)
                  w = w.dropRight(2)
              }
            case "ira" | "iras" =>
              // replace with ir when in RV and preceded by e
              if (st >= rv && st > 0 && w.charAt(st - 1) == 'e')
                rep(suf, "ir")
            case _ => ()
          }
      }
    }

    // ---- step 2: verb suffixes in RV, only when step 1 removed
    // nothing
    if (!changed) {
      val suffixes2 = Seq(
        "aríamos", "eríamos", "iríamos", "ássemos", "êssemos",
        "íssemos", "aríeis", "eríeis", "iríeis", "ásseis", "ésseis",
        "ísseis", "áveis", "áramos", "éramos", "íramos", "ávamos", "aremos",
        "eremos", "iremos", "ariam", "eriam", "iriam", "assem",
        "essem", "issem", "ara~o", "era~o", "ira~o", "arias", "erias",
        "irias", "ardes", "erdes", "irdes", "asses", "esses", "isses",
        "astes", "estes", "istes", "áreis", "areis", "éreis", "ereis",
        "íreis", "ireis", "íamos", "armos", "ermos", "irmos", "aria",
        "eria", "iria", "asse", "esse", "isse", "aste", "este",
        "iste", "arei", "erei", "irei", "aram", "eram", "iram",
        "avam", "arem", "erem", "irem", "ando", "endo", "indo",
        "adas", "idas", "arás", "aras", "erás", "eras", "irás",
        "avas", "ares", "eres", "ires", "íeis", "ados", "idos",
        "ámos", "amos", "emos", "imos", "iras", "ada", "ida", "ará",
        "ara", "erá", "era", "irá", "ava", "iam", "ado", "ido",
        "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
        "er", "ir", "as", "es", "is", "eu", "iu", "ou")
        .sortBy(-_.length)
      suffixes2.find(s => w.endsWith(s) && w.length - s.length >= rv)
        .foreach { s => w = w.dropRight(s.length); changed = true }
    }

    // ---- step 3: i after c, in RV (only when 1 or 2 changed the word)
    if (changed && w.endsWith("i") && w.length - 1 >= rv &&
      w.length > 1 && w.charAt(w.length - 2) == 'c')
      w = w.dropRight(1)

    // ---- step 4 (only when neither 1 nor 2 altered the word):
    // residual suffix
    if (!changed) {
      val s4 = Seq("os", "a", "i", "o", "á", "í", "ó").sortBy(-_.length)
      s4.find(s => w.endsWith(s) && w.length - s.length >= rv)
        .foreach(s => w = w.dropRight(s.length))
    }

    // ---- step 5: final e/é/ê in RV; gu/ci absorb their u/i when that
    // letter is in RV; then ç → c
    locally {
      val s5 = Seq("e", "é", "ê")
      s5.find(s => w.endsWith(s) && w.length - s.length >= rv)
        .foreach { s =>
          w = w.dropRight(1)
          if ((w.endsWith("gu") || w.endsWith("ci")) &&
            w.length - 1 >= rv) w = w.dropRight(1)
        }
      if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    }

    // postlude: restore nasal vowels
    w.replace("a~", "ã").replace("o~", "õ")
  }

  private def rvPos(w: String): Int = {
    val n = w.length
    if (n < 3) return n
    if (!v(w.charAt(1))) {
      var i = 2
      while (i < n && !v(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else if (v(w.charAt(0)) && v(w.charAt(1))) {
      var i = 2
      while (i < n && v(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else math.min(3, n)
  }

  private def rPos(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !v(w.charAt(i))) i += 1
    while (i < n && v(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }
}

/** `spanish_stem(token)` — scalar expression, one static call inside
  * whole-stage codegen (the [[PorterStem]] pattern). */
case class SpanishStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"spanish_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SpanishSnowball.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.SpanishSnowball.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

/** `italian_stem(token)` — scalar expression, one static call inside
  * whole-stage codegen. */
case class ItalianStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"italian_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      ItalianSnowball.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.ItalianSnowball.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

/** `portuguese_stem(token)` — scalar expression, one static call inside
  * whole-stage codegen. */
case class PortugueseStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"portuguese_stem expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PortugueseSnowball.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PortugueseSnowball.stem($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object SnowballRomanceFunctions {
  /** Column-level Spanish Snowball stem of a (lowercase) token column. */
  def spanish_stem(c: Column): Column =
    ColumnBridge.column(SpanishStem(ColumnBridge.expression(c)))

  /** Column-level Italian Snowball stem of a (lowercase) token column. */
  def italian_stem(c: Column): Column =
    ColumnBridge.column(ItalianStem(ColumnBridge.expression(c)))

  /** Column-level Portuguese Snowball stem of a (lowercase) token
    * column. */
  def portuguese_stem(c: Column): Column =
    ColumnBridge.column(PortugueseStem(ColumnBridge.expression(c)))
}
