package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "Alice", "Café"),
    (2L, "alice", "cafe"),
    (3L, "ALICE", "CAFÉ"),
    (4L, "bob", "resume"),
    (5L, "Bob", "Résumé")
  ).toDF("_id", "name", "word")

  private def ids(q: Map[String, Any], spec: Option[Collation.Spec])
      : Seq[Long] =
    df.where(QueryCompiler.compile(q, spec))
      .orderBy("_id").select("_id").as[Long].collect().toSeq

  test("strength 2: case-insensitive equality, $in, $ne, ranges") {
    val s2 = Some(Collation.Spec("en", 2))
    assert(ids(Map("name" -> "ALICE"), s2) == Seq(1, 2, 3))
    assert(ids(Map("name" -> "ALICE"), None) == Seq(3))
    assert(ids(Map("name" -> Map("$in" -> Seq("Alice", "BOB"))), s2) ==
      Seq(1, 2, 3, 4, 5))
    assert(ids(Map("name" -> Map("$ne" -> "alice")), s2) == Seq(4, 5))
    // range compares fold too: "b" <= name under case-fold
    assert(ids(Map("name" -> Map("$gte" -> "B")), s2) == Seq(4, 5))
    // strength 2 still distinguishes diacritics
    assert(ids(Map("word" -> "cafe"), s2) == Seq(2))
  }

  test("strength 1: diacritics fold too") {
    val s1 = Some(Collation.Spec("en", 1))
    assert(ids(Map("word" -> "cafe"), s1) == Seq(1, 2, 3))
    assert(ids(Map("word" -> "RESUME"), s1) == Seq(4, 5))
  }

  test("parse validates locale, strength, and unknown options loudly") {
    assert(Collation.parse(Map("locale" -> "en", "strength" -> 2)) ==
      Collation.Spec("en", 2))
    val eLoc = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "hu", "strength" -> 2))
    }
    assert(eLoc.getMessage.contains("unsupported locale"))
    val eStr = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "en", "strength" -> 3))
    }
    assert(eStr.getMessage.contains("strength"))
    // caseFirst without caseLevel has no case level to reorder —
    // rejected with guidance (with caseLevel it is supported)
    val eOpt = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "en", "strength" -> 2,
        "caseFirst" -> "upper"))
    }
    assert(eOpt.getMessage.contains("caseFirst"))
    assert(Collation.parse(Map("locale" -> "en", "strength" -> 2,
      "caseLevel" -> true, "caseFirst" -> "upper")) ==
      Collation.Spec("en", 2, caseLevel = true, caseFirst = "upper"))
    val eCf = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "en", "strength" -> 2,
        "caseLevel" -> true, "caseFirst" -> "backwards"))
    }
    assert(eCf.getMessage.contains("upper/lower/off"))
    // caseLevel at strength 3 is a silent no-op (binary comparison is
    // already case-sensitive) — rejected with guidance
    val eCl3 = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "en", "strength" -> 3,
        "numericOrdering" -> true, "caseLevel" -> true))
    }
    assert(eCl3.getMessage.contains("caseLevel"))
    // maxVariable names which characters shift — meaningless without
    // alternate: shifted
    val eMv = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "en", "strength" -> 2,
        "maxVariable" -> "punct"))
    }
    assert(eMv.getMessage.contains("maxVariable"))
  }

  test("alternate shifted: whitespace + punctuation are ignorable; " +
      "maxVariable space keeps punctuation significant") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation-shift").toString
    Seq((1L, "re-use"), (2L, "reuse"), (3L, "re use"), (4L, "RE!USE"),
      (5L, "refuse"), (6L, "re-fuse"))
      .toDF("_id", "w").write.parquet(s"$dir/words.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("words")
    def find(q: Map[String, Any], coll: Map[String, Any]): Seq[Long] =
      c.find(q).collation(coll).sort("w", "_id").toDF
        .select("_id").as[Long].collect().toSeq
    // equality: every spelling of "reuse" matches, refuse does not
    assert(find(Map("w" -> "Re,Use"), Map("locale" -> "en",
      "strength" -> 2, "alternate" -> "shifted")) == Seq(1, 2, 3, 4))
    // sort: refuse group first on the stripped key ('f' < 'u'), then
    // all reuse spellings tied → _id order
    assert(find(Map.empty[String, Any], Map("locale" -> "en",
      "strength" -> 2, "alternate" -> "shifted")) ==
      Seq(5, 6, 1, 2, 3, 4))
    // maxVariable space: only whitespace shifts — "re use" still
    // matches, "re-use"/"RE!USE" do not
    assert(find(Map("w" -> "reuse"), Map("locale" -> "en",
      "strength" -> 2, "alternate" -> "shifted",
      "maxVariable" -> "space")) == Seq(2, 3))
    // composes with strength 3 + numericOrdering (binary case, shifted
    // punctuation, numeric digit runs)
    assert(find(Map("w" -> "re-use"), Map("locale" -> "en",
      "alternate" -> "shifted", "numericOrdering" -> true)) ==
      Seq(1, 2, 3))
  }

  test("caseLevel: case pattern compared after the whole primary level") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation-case").toString
    Seq((1L, "Café"), (2L, "cafe"), (3L, "CAFE"), (4L, "Cafe"),
      (5L, "cafés"))
      .toDF("_id", "w").write.parquet(s"$dir/words.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("words")
    def find(q: Map[String, Any], coll: Map[String, Any]): Seq[Long] =
      c.find(q).collation(coll).sort("w", "_id").toDF
        .select("_id").as[Long].collect().toSeq
    // strength 1 + caseLevel: diacritics fold, case is significant —
    // "Cafe" matches Café and Cafe but not cafe/CAFE
    assert(find(Map("w" -> "Cafe"), Map("locale" -> "en",
      "strength" -> 1, "caseLevel" -> true)) == Seq(1, 4))
    // ordering: primary level decides first (cafe* < cafes even though
    // 's' would beat the case level), case breaks primary ties with
    // lowercase first
    assert(find(Map.empty[String, Any], Map("locale" -> "en",
      "strength" -> 1, "caseLevel" -> true)) == Seq(2, 1, 4, 3, 5))
    // strength 2 + caseLevel: diacritics stay significant
    assert(find(Map("w" -> "Cafe"), Map("locale" -> "en",
      "strength" -> 2, "caseLevel" -> true)) == Seq(4))
  }

  test("caseLevel: literal digits in the data never masquerade as " +
      "case bits; non-string $in members match nothing, not crash") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation-case2").toString
    Seq((1L, "a1"), (2L, "A1"), (3L, "ab"))
      .toDF("_id", "w").write.parquet(s"$dir/words.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("words")
    def find(q: Map[String, Any]): Seq[Long] =
      c.find(q).collation(Map("locale" -> "en", "strength" -> 2,
        "caseLevel" -> true)).sort("_id").toDF
        .select("_id").as[Long].collect().toSeq
    // the column-side case pattern flattens non-uppercase FIRST, so the
    // '1' in "a1" is a '0' case bit on both sides — equality holds and
    // the case level still separates "A1"
    assert(find(Map("w" -> "a1")) == Seq(1))
    assert(find(Map("w" -> "A1")) == Seq(2))
    // a non-string $in member under the struct-typed key compares
    // against the raw column (Mongo: it matches no string row) instead
    // of failing analysis
    assert(find(Map("w" -> Map("$in" -> Seq("a1", 7)))) == Seq(1))
  }

  test("caseFirst upper: uppercase sorts before lowercase at the case " +
      "level; equality is unchanged; lower matches the default") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation-cf").toString
    Seq((1L, "cafe"), (2L, "Cafe"), (3L, "CAFE"), (4L, "cafés"))
      .toDF("_id", "w").write.parquet(s"$dir/words.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("words")
    def sorted(cf: String): Seq[Long] =
      c.find(Map.empty[String, Any])
        .collation(Map("locale" -> "en", "strength" -> 2,
          "caseLevel" -> true, "caseFirst" -> cf)).sort("w", "_id")
        .toDF.select("_id").as[Long].collect().toSeq
    // upper-first: CAFE < Cafe < cafe within the equal primary; the
    // primary level still decides first (cafés last either way)
    assert(sorted("upper") == Seq(3, 2, 1, 4))
    assert(sorted("lower") == Seq(1, 2, 3, 4))
    assert(sorted("off") == Seq(1, 2, 3, 4))
    // equality ignores the ordering direction: the case level still
    // separates exact-case groups
    def find(cf: String, q: String): Seq[Long] =
      c.find(Map("w" -> q)).collation(Map("locale" -> "en",
        "strength" -> 2, "caseLevel" -> true, "caseFirst" -> cf))
        .sort("_id").toDF.select("_id").as[Long].collect().toSeq
    assert(find("upper", "Cafe") == Seq(2))
    assert(find("upper", "CAFE") == Seq(3))
  }

  test("caseLevel: astral characters count once in the case pattern " +
      "(driver twin matches the regex's per-code-point semantics)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation-astral").toString
    // U+1D400 MATHEMATICAL BOLD CAPITAL A is \p{Lu} (two UTF-16
    // chars); U+1F600 emoji is uncased (also two chars)
    val bold = new String(Character.toChars(0x1D400))
    val emoji = new String(Character.toChars(0x1F600))
    Seq((1L, s"${emoji}ab"), (2L, s"${emoji}Ab"), (3L, s"${bold}b"))
      .toDF("_id", "w").write.parquet(s"$dir/words.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("words")
    def find(q: Map[String, Any]): Seq[Long] =
      c.find(q).collation(Map("locale" -> "en", "strength" -> 2,
        "caseLevel" -> true)).sort("_id").toDF
        .select("_id").as[Long].collect().toSeq
    // one pattern position per code point on BOTH sides: a per-UTF-16
    // driver twin would emit "00ab"-shaped patterns of length 4 vs the
    // column's 3 and match nothing
    assert(find(Map("w" -> s"${emoji}ab")) == Seq(1))
    assert(find(Map("w" -> s"${emoji}Ab")) == Seq(2))
    // an astral UPPERCASE letter carries a '1' case bit on both sides
    assert(find(Map("w" -> s"${bold}b")) == Seq(3))
  }

  test("caseLevel + numericOrdering: digit runs carry one uncased " +
      "position, so 007 still collates equal to 7") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation-clnum").toString
    Seq((1L, "A07"), (2L, "A7"), (3L, "a7"), (4L, "A8"))
      .toDF("_id", "w").write.parquet(s"$dir/words.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("words")
    def find(q: Map[String, Any]): Seq[Long] =
      c.find(q).collation(Map("locale" -> "en", "strength" -> 2,
        "numericOrdering" -> true, "caseLevel" -> true)).sort("_id")
        .toDF.select("_id").as[Long].collect().toSeq
    // ICU CODAN: the whole digit run is ONE collation element with no
    // case weight — zero-stripped-equal runs must not diverge on case
    // pattern LENGTH ("A07" -> '10' vs '100' was the bug)
    assert(find(Map("w" -> "A7")) == Seq(1, 2))
    assert(find(Map("w" -> "a7")) == Seq(3))
    assert(find(Map("w" -> "A07")) == Seq(1, 2))
    // case level still separates within an equal primary
    val sorted = c.find(Map.empty[String, Any])
      .collation(Map("locale" -> "en", "strength" -> 2,
        "numericOrdering" -> true, "caseLevel" -> true))
      .sort("w", "_id").toDF.select("_id").as[Long].collect().toSeq
    // a7 (lowercase first) < A07 = A7 (_id tie) < A8
    assert(sorted == Seq(3L, 1L, 2L, 4L))
  }

  test("find().collation(): predicate recompiles and sort keys fold") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation").toString
    df.write.parquet(s"$dir/people.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("people")
    val got = c.find(Map("name" -> "ALICE"))
      .collation(Map("locale" -> "en", "strength" -> 2))
      .sort("word", "-_id").toDF
      .select("_id").as[Long].collect().toSeq
    // case-fold matches 1,2,3; sort by folded word asc ("cafe" ties:
    // strength-2 keeps the accent distinction: café > cafe), then _id desc
    assert(got.toSet == Set(1L, 2L, 3L))
    assert(got.head == 2L) // "cafe" sorts before "café" after case-fold
    // sorting under strength 1 makes all three words equal → _id desc ties
    val s1 = c.find(Map("name" -> "ALICE"))
      .collation(Map("locale" -> "en", "strength" -> 1))
      .sort("word", "-_id").toDF.select("_id").as[Long].collect().toSeq
    assert(s1 == Seq(3L, 2L, 1L))
  }

  test("numericOrdering: digit runs compare as numbers") {
    import graft.functions.NumericKey
    // key algebra: lexicographic order of keys IS numeric order of runs
    assert(NumericKey.key("abc") == "abc") // no digits: untouched
    assert(NumericKey.key("item2") < NumericKey.key("item10"))
    assert(NumericKey.key("item10") < NumericKey.key("itemx"))
    assert(NumericKey.key("007") == NumericKey.key("7")) // zeros strip
    assert(NumericKey.key("a1b22c") < NumericKey.key("a1b100c"))
    // the length prefix stays order-isomorphic across its width
    // boundaries (255/256 digits, 65535/65536 digits) and never emits a
    // lone surrogate (a 55k-digit run's length would land in
    // 0xD800–0xDFFF under a single-char encoding and transcode to '?')
    def run(n: Int) = "9" * n
    assert(NumericKey.key(run(255)) < NumericKey.key(run(256)))
    assert(NumericKey.key(run(256)) < NumericKey.key(run(257)))
    assert(NumericKey.key(run(65535)) < NumericKey.key(run(65536)))
    assert(NumericKey.key(run(65536)) < NumericKey.key(run(70000)))
    assert(NumericKey.key(run(0xD800)) < NumericKey.key(run(0xD801)))
    assert(!NumericKey.key(run(0xD800)).exists(c =>
      c >= 0xD800 && c <= 0xDFFF))
    // differently-sized runs keep strict numeric order across widths
    assert(NumericKey.key("a" + run(10) + "b") <
      NumericKey.key("a" + run(300) + "b"))
    // parse: numericOrdering rides any strength; bare strength 3 gains
    // a purpose with it (and still rejects without)
    assert(Collation.parse(Map("locale" -> "en",
      "numericOrdering" -> true)) == Collation.Spec("en", 3, true))
    assert(Collation.parse(Map("locale" -> "en", "strength" -> 2,
      "numericOrdering" -> true)) == Collation.Spec("en", 2, true))
    val e = intercept[IllegalArgumentException](
      Collation.parse(Map("locale" -> "en", "strength" -> 3)))
    assert(e.getMessage.contains("strength"))

    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation3").toString
    Seq((1L, "item2"), (2L, "item10"), (3L, "item1"), (4L, "item007"),
      (5L, "item7"), (6L, "itemx"))
      .toDF("_id", "name").write.parquet(s"$dir/items.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("items")
    val sorted = c.find(Map.empty[String, Any])
      .collation(Map("locale" -> "en", "numericOrdering" -> true))
      .sort("name", "_id").toDF.select("_id").as[Long].collect().toSeq
    // item1 < item2 < item007 = item7 (_id breaks the tie) < item10 <
    // itemx (digits before letters)
    assert(sorted == Seq(3L, 1L, 4L, 5L, 2L, 6L))
    // equality folds through the same key: 07 matches 007 and 7
    val eq = c.find(Map("name" -> "item07"))
      .collation(Map("locale" -> "en", "numericOrdering" -> true))
      .toDF.select("_id").as[Long].collect().toSet
    assert(eq == Set(4L, 5L))
    // composes with strength-2 case folding
    val cased = c.find(Map("name" -> "ITEM2"))
      .collation(Map("locale" -> "en", "strength" -> 2,
        "numericOrdering" -> true))
      .toDF.select("_id").as[Long].collect().toSet
    assert(cased == Set(1L))
  }

  test("collation folds STRING columns only (schema-gated, Mongo rule)") {
    // {numCol: {$in: [5, "x"]}} under a collation must compare numCol
    // binary — collation applies to string-to-string comparisons only.
    // compileFor installs the schema oracle that gates the fold.
    val s2 = Some(Collation.Spec("en", 2))
    def idsFor(q: Map[String, Any]): Seq[Long] =
      QueryCompiler.activeCollation.withValue(s2)(
        df.where(QueryCompiler.compileFor(df, q)))
        .orderBy("_id").select("_id").as[Long].collect().toSeq
    assert(idsFor(Map("_id" -> Map("$in" -> Seq(2L, "x")))) == Seq(2))
    assert(idsFor(Map("_id" -> 3L)) == Seq(3))
    assert(idsFor(Map("_id" -> Map("$gte" -> 4L))) == Seq(4, 5))
    // range ops bracket too: a string literal never compares against a
    // numeric column (and must not coerce/throw under ANSI)
    assert(idsFor(Map("_id" -> Map("$gt" -> "2"))) == Seq())
    assert(idsFor(Map("_id" -> Map("$lte" -> "x"))) == Seq())
    // string fields still fold under the same compile
    assert(idsFor(Map("name" -> "ALICE")) == Seq(1, 2, 3))
    assert(idsFor(Map("name" -> Map("$in" -> Seq("BOB")))) == Seq(4, 5))
  }

  test("tailored sv: å/ä/ö sort as distinct post-z letters; primary " +
      "groups (æ≡ä, ü≡y) match; secondary orders within groups") {
    val sv1 = Collation.Spec("sv", 1)
    val sv2 = Collation.Spec("sv", 2)
    val words = Seq("öga", "zon", "åker", "ära", "arm", "bok", "äpple")
      .toDF("w")
    def sortedBy(spec: Collation.Spec): Seq[String] =
      words.orderBy(spec.key(col("w"))).as[String].collect().toSeq
    // CLDR sv: …z < å < ä < ö (the lower+strip model would bury å/ä
    // under a and ö under o)
    assert(sortedBy(sv1) ==
      Seq("arm", "bok", "zon", "åker", "äpple", "ära", "öga"))
    assert(sortedBy(sv2) ==
      Seq("arm", "bok", "zon", "åker", "äpple", "ära", "öga"))
    // å is a LETTER, not a-with-ring: år ≠ ar even at strength 1
    // (an en-strength-1 fold would equate them)
    def eq1(a: String, b: String): Boolean =
      words.limit(1).select(
        (sv1.key(lit(a)) === sv1.foldLit(b)).as("e"))
        .head().getBoolean(0)
    assert(!eq1("år", "ar"))
    assert(eq1("år", "ÅR")) // case still folds
    // primary-equal groups: æ ≡ ä, ü ≡ y at strength 1
    assert(eq1("ära", "æra") && eq1("myt", "müt"))
    // …and strength 2 separates them in CLDR order (ä << æ, y << ü)
    val pairs = Seq("æra", "ära", "müt", "myt").toDF("w")
    assert(pairs.orderBy(sv2.key(col("w"))).as[String].collect().toSeq ==
      Seq("myt", "müt", "ära", "æra"))
  }

  test("tailored da/nb: æ/ø/å post-z, aa ≡ å at strength ≤ 2, and the " +
      "CLDR within-group secondary order (æ << ä, ø << ö)") {
    val da1 = Collation.Spec("da", 1)
    val da2 = Collation.Spec("da", 2)
    val words = Seq("ål", "æble", "ørn", "zebra", "bord").toDF("w")
    def sortedBy(spec: Collation.Spec): Seq[String] =
      words.orderBy(spec.key(col("w"))).as[String].collect().toSeq
    // CLDR da: …z < æ < ø < å
    assert(sortedBy(da1) == Seq("bord", "zebra", "æble", "ørn", "ål"))
    assert(sortedBy(da2) == Seq("bord", "zebra", "æble", "ørn", "ål"))
    // the aa digraph IS å below the tertiary level
    def eq(spec: Collation.Spec, a: String, b: String): Boolean =
      words.limit(1).select(
        (spec.key(lit(a)) === spec.foldLit(b)).as("e"))
        .head().getBoolean(0)
    assert(eq(da1, "Aalborg", "Ålborg") && eq(da2, "aalborg", "ålborg"))
    // strength 2: æ sorts BEFORE ä and ø BEFORE ö (binary order is the
    // opposite — the secondary swap restores CLDR)
    val sec = Seq("äble", "æble", "ören", "øren").toDF("w")
    assert(sec.orderBy(da2.key(col("w"))).as[String].collect().toSeq ==
      Seq("æble", "äble", "øren", "ören"))
    // nb aliases the same tailoring
    assert(Collation.parse(Map("locale" -> "nb", "strength" -> 1)) ==
      Collation.Spec("nb", 1))
  }

  test("tailored strength-2 $in drops non-string members (struct key " +
      "cannot mix scalar literals; Mongo semantics: they match no " +
      "string row)") {
    val rows = Seq((1L, "Aalborg"), (2L, "Ålborg"), (3L, "ørn"))
      .toDF("_id", "city")
    val spec = Some(Collation.parse(
      Map("locale" -> "da", "strength" -> 2)))
    val got = rows.where(QueryCompiler.compile(
      Map("city" -> Map("$in" -> Seq("ålborg", 5))), spec))
      .select("_id").as[Long].collect().toSeq.sorted
    // aa ≡ å below tertiary, case folds at strength 2; the int member
    // matches nothing and must not break analysis
    assert(got == Seq(1L, 2L))
    // all-non-string member lists match no string row at all
    val none = rows.where(QueryCompiler.compile(
      Map("city" -> Map("$in" -> Seq(5, 7))), spec))
      .count()
    assert(none == 0)
  }

  test("tailored locales reject strength 3 (binary cannot honor the " +
      "re-ordered primaries)") {
    val e = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "sv", "strength" -> 3,
        "numericOrdering" -> true))
    }
    assert(e.getMessage.contains("tailored"))
  }

  test("tailored ru: ё collates as a secondary variant of е (binary " +
      "puts it after я)") {
    val ru1 = Collation.Spec("ru", 1)
    val ru2 = Collation.Spec("ru", 2)
    val words = Seq("ёж", "еж", "ёлка", "елка", "жук", "яблоко")
      .toDF("w")
    def sortedBy(spec: Collation.Spec): Seq[String] =
      words.orderBy(spec.key(col("w")), col("w")).as[String]
        .collect().toSeq
    // strength 2: е << ё inside each primary group; groups in CLDR
    // (= code-point) order е < ж < я — binary would exile ё past я
    assert(sortedBy(ru2) ==
      Seq("еж", "ёж", "елка", "ёлка", "жук", "яблоко"))
    // strength 1: ё ≡ е exactly
    def eq1(a: String, b: String): Boolean =
      words.limit(1).select(
        (ru1.key(lit(a)) === ru1.foldLit(b)).as("e"))
        .head().getBoolean(0)
    assert(eq1("ёж", "еж") && eq1("ЁЛКА", "елка") && !eq1("ёж", "уж"))
  }

  test("tailored tr: dotless-i case fold (I→ı, İ→i) and mid-alphabet " +
      "primary re-ordering (ç/ğ/ı/ö/ş/ü as distinct letters)") {
    val tr1 = Collation.Spec("tr", 1)
    val tr2 = Collation.Spec("tr", 2)
    val words = Seq("cam", "çam", "dere", "Iğdır", "ırmak", "istanbul",
      "İzmir", "su", "şeker", "uzun", "üzüm").toDF("w")
    def sortedBy(spec: Collation.Spec): Seq[String] =
      words.orderBy(spec.key(col("w")), col("w")).as[String]
        .collect().toSeq
    val want = Seq("cam", "çam", "dere", "Iğdır", "ırmak", "istanbul",
      "İzmir", "su", "şeker", "uzun", "üzüm")
    assert(sortedBy(tr1) == want && sortedBy(tr2) == want)
    def eq1(a: String, b: String): Boolean =
      words.limit(1).select(
        (tr1.key(lit(a)) === tr1.foldLit(b)).as("e"))
        .head().getBoolean(0)
    // uppercase I folds to ı (NOT i); uppercase İ folds to i — so
    // IRMAK matches ırmak and İZMİR matches izmir, but NOT across
    assert(eq1("IRMAK", "ırmak") && eq1("İZMİR", "izmir"))
    assert(!eq1("IRMAK", "irmak") && !eq1("ıs", "is"))
    // â is a secondary variant of a: primary-equal, strength 2 orders
    // a << â within the group
    assert(eq1("kâr", "kar"))
    val pair = Seq("kâr", "kar").toDF("w")
    assert(pair.orderBy(tr2.key(col("w"))).as[String].collect().toSeq
      == Seq("kar", "kâr"))
  }

  test("tailored fr: true two-level reading — whole primary level " +
      "first, then accents; DUCET acute << grave") {
    val fr2 = Collation.Spec("fr", 2)
    // the classic: côte sorts between coté and côté at the secondary
    // level, and cozy AFTER all of them (t < z at the primary level —
    // the one-level lower() model would bury ô past z)
    val words = Seq("cozy", "côté", "cote", "coté", "côte").toDF("w")
    assert(words.orderBy(fr2.key(col("w"))).as[String].collect().toSeq
      == Seq("cote", "coté", "côte", "côté", "cozy"))
    // DUCET orders acute before grave (binary is the opposite)
    val accents = Seq("près", "prés").toDF("w")
    assert(accents.orderBy(fr2.key(col("w"))).as[String].collect()
      .toSeq == Seq("prés", "près"))
    // strength 3 + numericOrdering still routes to the generic binary
    // path (fr's tailoring does not re-order primaries)
    val fr3 = Collation.parse(Map("locale" -> "fr", "strength" -> 3,
      "numericOrdering" -> true))
    val nums = Seq("item10", "item2").toDF("w")
    assert(nums.orderBy(fr3.key(col("w"))).as[String].collect().toSeq
      == Seq("item2", "item10"))
  }

  test("backwards: the secondary level compares from the END " +
      "(fr_CA's default); rejected where no secondary level is keyed") {
    val words = Seq("cote", "coté", "côte", "côté").toDF("w")
    val back = Collation.parse(Map("locale" -> "fr_CA",
      "strength" -> 2))
    assert(back.backwards)
    assert(words.orderBy(back.key(col("w"))).as[String].collect().toSeq
      == Seq("cote", "côte", "coté", "côté"))
    // explicit backwards: false restores the forward reading
    val fwd = Collation.parse(Map("locale" -> "fr_CA", "strength" -> 2,
      "backwards" -> false))
    assert(words.orderBy(fwd.key(col("w"))).as[String].collect().toSeq
      == Seq("cote", "coté", "côte", "côté"))
    // foldLit produces the same reversed-secondary struct shape
    val hit = words.where(
      back.key(col("w")) === back.foldLit("CÔTÉ"))
      .as[String].collect().toSeq
    assert(hit == Seq("côté"))
    // en has no separately-keyed secondary level → loud rejection
    val e = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "en", "strength" -> 2,
        "backwards" -> true))
    }
    assert(e.getMessage.contains("backwards"))
    // …and neither does strength 1 (primary only)
    val e1 = intercept[IllegalArgumentException] {
      Collation.parse(Map("locale" -> "fr", "strength" -> 1,
        "backwards" -> true))
    }
    assert(e1.getMessage.contains("backwards"))
    // fr_CA at strength 1 is fine — the backwards DEFAULT only
    // engages where a secondary level exists
    assert(!Collation.parse(Map("locale" -> "fr_CA", "strength" -> 1))
      .backwards)
  }

  test("normalization: true composes NFC first — decomposed input " +
      "collates equal to precomposed") {
    val composed = "café"
    val decomposed = "café" // e + COMBINING ACUTE ACCENT
    assert(composed != decomposed) // genuinely different code points
    val norm = Collation.parse(Map("locale" -> "en", "strength" -> 2,
      "normalization" -> true))
    val plain = Collation.Spec("en", 2)
    val words = Seq(decomposed).toDF("w")
    def matches(spec: Collation.Spec): Boolean =
      words.where(spec.key(col("w")) === spec.foldLit(composed))
        .count() == 1
    assert(matches(norm) && !matches(plain))
    // strength 1 strips the composed accent on both sides
    val norm1 = Collation.parse(Map("locale" -> "en", "strength" -> 1,
      "normalization" -> true))
    assert(words.where(norm1.key(col("w")) === norm1.foldLit("CAFE"))
      .count() == 1)
    // tailored locales normalize too (decomposed å routes to the
    // post-z stand-in)
    val svn = Collation.parse(Map("locale" -> "sv", "strength" -> 1,
      "normalization" -> true))
    val aRing = Seq("åker").toDF("w") // a + COMBINING RING
    assert(aRing.where(svn.key(col("w")) === svn.foldLit("åker"))
      .count() == 1)
  }

  test("tailored es: ñ is a distinct primary letter between n and o " +
      "(the generic strip would fold peña ≡ pena)") {
    val es1 = Collation.Spec("es", 1)
    val es2 = Collation.Spec("es", 2)
    val words = Seq("pena", "peña", "peor", "pan", "pito").toDF("w")
    def sortedBy(spec: Collation.Spec): Seq[String] =
      words.orderBy(spec.key(col("w")), col("w")).as[String]
        .collect().toSeq
    val want = Seq("pan", "pena", "peña", "peor", "pito")
    assert(sortedBy(es1) == want && sortedBy(es2) == want)
    def eq1(a: String, b: String): Boolean =
      words.limit(1).select(
        (es1.key(lit(a)) === es1.foldLit(b)).as("e"))
        .head().getBoolean(0)
    // ñ never equates with n — at ANY strength; case and accents fold
    assert(!eq1("peña", "pena") && eq1("PEÑA", "peña") &&
      eq1("está", "esta"))
  }

  test("tailored pl: ą/ć/ę/ł/ń/ó/ś/ź/ż are distinct primaries in " +
      "place (ł after l, ż last)") {
    val pl1 = Collation.Spec("pl", 1)
    val words = Seq("luz", "łaska", "maj", "za", "źle", "żaba", "mam",
      "mąka").toDF("w")
    val got = words.orderBy(pl1.key(col("w")), col("w")).as[String]
      .collect().toSeq
    // l < ł < m; a < ą; z < ź < ż
    assert(got == Seq("luz", "łaska", "maj", "mam", "mąka", "za",
      "źle", "żaba"))
  }

  test("tailored cs: the ch digraph is ONE letter between h and i; " +
      "č/ř/š/ž primaries after their bases") {
    val cs1 = Collation.Spec("cs", 1)
    val cs2 = Collation.Spec("cs", 2)
    val words = Seq("cena", "čaj", "dita", "hrad", "chata", "irsko",
      "ruka", "řeka", "sen", "šance", "tma").toDF("w")
    def sortedBy(spec: Collation.Spec): Seq[String] =
      words.orderBy(spec.key(col("w")), col("w")).as[String]
        .collect().toSeq
    // binary lower() would sort chata with the c-words; CLDR cs puts
    // it between hrad and irsko
    val want = Seq("cena", "čaj", "dita", "hrad", "chata", "irsko",
      "ruka", "řeka", "sen", "šance", "tma")
    assert(sortedBy(cs1) == want && sortedBy(cs2) == want)
    // ě/ů/í stay secondary (fold to e/u/i at strength 1)
    def eq1(a: String, b: String): Boolean =
      words.limit(1).select(
        (cs1.key(lit(a)) === cs1.foldLit(b)).as("e"))
        .head().getBoolean(0)
    assert(eq1("dělá", "dela") && eq1("dům", "dum") && !eq1("čaj", "caj"))
  }

  test("tailored + numericOrdering: digit runs compare numerically on " +
      "BOTH struct levels (column and literal twins agree)") {
    val sv2n = Collation.parse(Map("locale" -> "sv", "strength" -> 2,
      "numericOrdering" -> true))
    val words = Seq("åker10", "åker2", "zon5", "ÅKER2").toDF("w")
    val got = words.orderBy(sv2n.key(col("w")), col("w")).as[String]
      .collect().toSeq
    // z < å (tailored), and 2 < 10 inside the å group (numeric);
    // ÅKER2/åker2 tie on both levels and fall to the raw tiebreak
    assert(got == Seq("zon5", "ÅKER2", "åker2", "åker10"))
    val hit = words.where(sv2n.key(col("w")) === sv2n.foldLit("Åker002"))
      .as[String].collect().toSeq.sorted
    assert(hit == Seq("ÅKER2", "åker2")) // zeros collate equal
  }

  test("backwards + caseLevel nest: (two-level struct, case bits) — " +
      "foldLit mirrors the full shape") {
    val spec = Collation.parse(Map("locale" -> "fr_CA", "strength" -> 2,
      "caseLevel" -> true, "caseFirst" -> "upper"))
    assert(spec.backwards && spec.caseLevel)
    val words = Seq("Côté", "côté", "coté").toDF("w")
    // primary+secondary equal for the Côté/côté pair; case level
    // orders uppercase first (caseFirst upper); coté differs at the
    // secondary (backwards-reversed) level
    val got = words.orderBy(spec.key(col("w"))).as[String]
      .collect().toSeq
    assert(got == Seq("coté", "Côté", "côté"))
    val hit = words.where(spec.key(col("w")) === spec.foldLit("Côté"))
      .as[String].collect().toSeq
    assert(hit == Seq("Côté"))
  }

  test("sv/da secondary: đ << ð per CLDR (binary is the opposite)") {
    val sv2 = Collation.Spec("sv", 2)
    val da2 = Collation.Spec("da", 2)
    val words = Seq("ður", "đur", "dur").toDF("w")
    for (spec <- Seq(sv2, da2))
      assert(words.orderBy(spec.key(col("w"))).as[String].collect()
        .toSeq == Seq("dur", "đur", "ður"))
  }

  test("pipe(pipeline, collation): $group equality folds string keys " +
      "(min original as the deterministic _id representative)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation3").toString
    df.write.parquet(s"$dir/people.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("people")
    // strength 2: Alice/alice/ALICE are ONE group; Bob/bob another
    val out = c.pipe(
      Seq(Map("$group" -> Map("_id" -> "$name",
        "n" -> Map("$sum" -> 1)))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("ALICE", 3L), ("Bob", 2L)))
    // distinct idiom (no accumulators) folds the same way
    val ids = c.pipe(
      Seq(Map("$group" -> Map("_id" -> "$name"))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id").select("_id").as[String].collect().toSeq
    assert(ids == Seq("ALICE", "Bob"))
    // compound keys fold their string members; non-string members ride
    // along unfolded
    val comp = c.pipe(
      Seq(Map("$group" -> Map(
        "_id" -> Map("nm" -> "$name", "k" -> Map("$mod" ->
          Seq("$_id", 2))),
        "n" -> Map("$sum" -> 1)))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .selectExpr("_id.nm", "_id.k", "n").orderBy("nm", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // odd _ids: Alice(1), ALICE(3), Bob(5) → (ALICE,1,2), (Bob,1,1);
    // even: alice(2), bob(4) → (alice,0,1), (bob,0,1)
    assert(comp == Seq(("ALICE", 1L, 2L), ("Bob", 1L, 1L),
      ("alice", 0L, 1L), ("bob", 0L, 1L)))
    // without a collation the five names stay five groups
    val plain = c.pipe(Seq(Map("$group" -> Map("_id" -> "$name"))))
    assert(plain.count() == 5)
  }

  test("pipe(pipeline, collation): $lookup equality and $sortByCount " +
      "fold string keys") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation4").toString
    df.write.parquet(s"$dir/people.parquet")
    Seq(("ALICE", 100L), ("bob", 200L))
      .toDF("who", "score").write.parquet(s"$dir/scores.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("people")
    // strength 2: every case variant of alice joins the ALICE score row
    val out = c.pipe(
      Seq(Map("$lookup" -> Map("from" -> "scores",
        "localField" -> "name", "foreignField" -> "who",
        "as" -> "sc")),
        Map("$project" -> Map("_id" -> 1,
          "n" -> Map("$size" -> "$sc")))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id").select("n").as[Int].collect().toSeq
    assert(out == Seq(1, 1, 1, 1, 1)) // all five rows matched
    // without collation only exact-case rows match
    val plain = c.pipe(
      Seq(Map("$lookup" -> Map("from" -> "scores",
        "localField" -> "name", "foreignField" -> "who",
        "as" -> "sc")),
        Map("$project" -> Map("_id" -> 1,
          "n" -> Map("$size" -> "$sc")))))
      .orderBy("_id").select("n").as[Int].collect().toSeq
    assert(plain == Seq(0, 0, 1, 1, 0)) // only ALICE(3), bob(4)
    // $sortByCount groups case-insensitively too
    val sbc = c.pipe(
      Seq(Map("$sortByCount" -> "$name")),
      collation = Map("locale" -> "en", "strength" -> 2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sbc == Seq(("ALICE", 3L), ("Bob", 2L)))
  }

  test("collated $lookup: collation-EQUAL array elements collapse to " +
      "one key (matched docs appear once, Mongo's once-per-doc rule)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation5").toString
    // outer with ARRAY localField holding two case-variants of one key
    Seq((1L, Seq("Red", "red")), (2L, Seq("blue")))
      .toDF("_id", "keys").write.parquet(s"$dir/outer.parquet")
    // foreign with ARRAY foreignField holding two case-variants
    Seq((10L, Seq("RED", "Red"), "r"), (20L, Seq("BLUE"), "b"))
      .toDF("fid", "tags", "v").write.parquet(s"$dir/dims.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("d").c("outer")
    val out = c.pipe(
      Seq(Map("$lookup" -> Map("from" -> "dims",
        "localField" -> "keys", "foreignField" -> "tags",
        "as" -> "m")),
        Map("$project" -> Map("_id" -> 1,
          "n" -> Map("$size" -> "$m")))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id").select("n").as[Int].collect().toSeq
    // each outer row matches its dim doc EXACTLY once despite the
    // case-variant duplicates on both array sides
    assert(out == Seq(1, 1))
  }

  test("backwards foldLit matches key for strings with supplementary " +
      "characters (surrogate-safe reverse on both sides)") {
    val back = Collation.parse(Map("locale" -> "fr_CA",
      "strength" -> 2))
    val s = "x😀é" // x + emoji (astral) + é
    val words = Seq(s).toDF("w")
    assert(words.where(back.key(col("w")) === back.foldLit(s))
      .count() == 1)
  }

  test("collated $group rejects a user accumulator named __ck (the " +
      "internal grouping-key alias) instead of silently dropping it") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation6").toString
    df.write.parquet(s"$dir/people.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("d").c("people")
    val e = intercept[IllegalArgumentException] {
      c.pipe(Seq(Map("$group" -> Map("_id" -> "$name",
        "__ck" -> Map("$sum" -> 1)))),
        collation = Map("locale" -> "en", "strength" -> 2)).collect()
    }
    assert(e.getMessage.contains("__ck"))
  }

  test("pipe(pipeline, collation): $setWindowFields/$fill partitions " +
      "and $graphLookup traversal equality fold string keys") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation7").toString
    Seq[(Long, String, Option[Long])]((1L, "ALICE", Some(10L)),
      (2L, "alice", Some(20L)), (3L, "Bob", Some(5L)),
      (4L, "bob", None))
      .toDF("_id", "name", "v").write.parquet(s"$dir/people.parquet")
    // org chart with case-variant manager references
    Seq(("a", "ROOT"), ("b", "A"), ("c", "B"))
      .toDF("emp", "mgr").write.parquet(s"$dir/org.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("d").c("people")
    // $setWindowFields: ALICE/alice are ONE partition at strength 2
    val sums = c.pipe(
      Seq(Map("$setWindowFields" -> Map(
        "partitionBy" -> "$name",
        "output" -> Map("t" -> Map("$sum" -> "$v"))))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id").select("t").as[Long].collect().toSeq
    assert(sums == Seq(30L, 30L, 5L, 5L))
    // $fill locf follows the collated partition too
    val filled = c.pipe(
      Seq(Map("$fill" -> Map(
        "partitionBy" -> "$name", "sortBy" -> Map("_id" -> 1),
        "output" -> Map("v" -> Map("method" -> "locf"))))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id").select("v").as[Option[Long]].collect().toSeq
    // bob(4) inherits Bob(3)'s 5 under the case-folded partition
    assert(filled == Seq(Some(10L), Some(20L), Some(5L), Some(5L)))
    // $graphLookup: traversal matches emp/mgr case-insensitively
    val org = new graft.db.GraftSession(spark, dir).db("d").c("org")
    val chain = org.pipe(
      Seq(Map("$match" -> Map("emp" -> "c")),
        Map("$graphLookup" -> Map(
          "from" -> "org", "startWith" -> "$mgr",
          "connectFromField" -> "mgr", "connectToField" -> "emp",
          "as" -> "up")),
        Map("$project" -> Map("emp" -> 1,
          "n" -> Map("$size" -> "$up")))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .select("n").as[Int].collect().toSeq
    // c → B(≡b) → A(≡a) → ROOT (no emp "root") = 2 ancestors found
    assert(chain == Seq(2))
    // without collation the uppercase refs match nothing
    val plain = org.pipe(
      Seq(Map("$match" -> Map("emp" -> "c")),
        Map("$graphLookup" -> Map(
          "from" -> "org", "startWith" -> "$mgr",
          "connectFromField" -> "mgr", "connectToField" -> "emp",
          "as" -> "up")),
        Map("$project" -> Map("n" -> Map("$size" -> "$up")))))
      .select("n").as[Int].collect().toSeq
    assert(plain == Seq(0))
  }

  test("$merge under an aggregate collation rejects loudly (the " +
      "on-key upsert would need a canonical representative)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation8").toString
    df.write.parquet(s"$dir/people.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("d").c("people")
    val e = intercept[IllegalArgumentException] {
      c.pipe(Seq(Map("$merge" -> Map("into" -> "out"))),
        collation = Map("locale" -> "en", "strength" -> 2))
    }
    assert(e.getMessage.contains("$merge under an aggregate collation"))
  }

  test("collated $graphLookup: a doc reached through collation-equal " +
      "frontier variants appears ONCE; window sortBy folds (rank " +
      "ties); $densify string partitions reject") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation9").toString
    // outer row starts from BOTH case variants of the same key
    Seq((1L, Seq("A", "a"))).toDF("_id", "roots")
      .write.parquet(s"$dir/seed.parquet")
    Seq(("a", "top")).toDF("emp", "mgr")
      .write.parquet(s"$dir/org.parquet")
    val seed = new graft.db.GraftSession(spark, dir).db("d").c("seed")
    val n = seed.pipe(
      Seq(Map("$graphLookup" -> Map(
        "from" -> "org", "startWith" -> "$roots",
        "connectFromField" -> "mgr", "connectToField" -> "emp",
        "as" -> "up")),
        Map("$project" -> Map("n" -> Map("$size" -> "$up")))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .select("n").as[Int].head()
    assert(n == 1) // not 2: both variants fold to one traversal hit
    // window sortBy folds: ALICE/alice tie under strength 2 → same rank
    df.write.parquet(s"$dir/people.parquet")
    val people = new graft.db.GraftSession(spark, dir).db("d").c("people")
    val ranks = people.pipe(
      Seq(Map("$match" -> Map("_id" -> Map("$in" -> Seq(1, 2, 4)))),
        Map("$setWindowFields" -> Map(
          "sortBy" -> Map("name" -> 1),
          "output" -> Map("r" -> Map("$rank" -> Map.empty))))),
      collation = Map("locale" -> "en", "strength" -> 2))
      .orderBy("_id").select("r").as[Long].collect().toSeq
    // Alice(1)/alice(2) tie at rank 1; bob(4) ranks 3 (rank skips)
    assert(ranks == Seq(1L, 1L, 3L))
    // $densify with a string partition under collation rejects loudly
    val e = intercept[IllegalArgumentException] {
      people.pipe(
        Seq(Map("$densify" -> Map("field" -> "_id",
          "partitionByFields" -> Seq("name"),
          "range" -> Map("step" -> 1, "bounds" -> "partition")))),
        collation = Map("locale" -> "en", "strength" -> 2)).collect()
    }
    assert(e.getMessage.contains("$densify"))
  }

  test("pipe(pipeline, collation): $match and $sort fold") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-collation2").toString
    df.write.parquet(s"$dir/people.parquet")
    val c = new graft.db.GraftSession(spark, dir).db("testdb").c("people")
    val out = c.pipe(
      Seq(Map("$match" -> Map("name" -> "ALICE")),
        Map("$sort" -> Seq("word" -> 1, "_id" -> -1)),
        Map("$project" -> Map("_id" -> 1))),
      collation = Map("locale" -> "en", "strength" -> 1))
      .select("_id").as[Long].collect().toSeq
    assert(out == Seq(3L, 2L, 1L))
  }
}
