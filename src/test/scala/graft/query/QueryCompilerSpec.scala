package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 10.0, Seq(1, 2, 3)),
    (2L, "b", 20.0, Seq(2, 3)),
    (3L, "a", 30.0, Seq.empty[Int]),
    (4L, "c", 40.0, Seq(4))).toDF("_id", "cat", "v", "arr")

  private def ids(q: Map[String, Any]): Seq[Long] =
    df.where(QueryCompiler.compile(q)).select("_id").as[Long].collect()
      .toSeq.sorted

  test("empty query matches all") { assert(ids(Map.empty) == Seq(1, 2, 3, 4)) }

  test("equality") { assert(ids(Map("cat" -> "a")) == Seq(1, 3)) }

  test("comparison operators") {
    assert(ids(Map("v" -> Map("$gt" -> 20.0))) == Seq(3, 4))
    assert(ids(Map("v" -> Map("$gte" -> 20.0))) == Seq(2, 3, 4))
    assert(ids(Map("v" -> Map("$lt" -> 20.0))) == Seq(1))
    assert(ids(Map("v" -> Map("$lte" -> 20.0))) == Seq(1, 2))
    assert(ids(Map("v" -> Map("$ne" -> 20.0))) == Seq(1, 3, 4))
    assert(ids(Map("v" -> Map("$gt" -> 10.0, "$lt" -> 40.0))) == Seq(2, 3))
  }

  test("$in / $nin") {
    assert(ids(Map("cat" -> Map("$in" -> Seq("a", "c")))) == Seq(1, 3, 4))
    assert(ids(Map("cat" -> Map("$nin" -> Seq("a", "c")))) == Seq(2))
  }

  test("implicit AND of fields") {
    assert(ids(Map("cat" -> "a", "v" -> Map("$gt" -> 15.0))) == Seq(3))
  }

  test("$and / $or / $nor") {
    assert(ids(Map("$or" -> Seq(Map("cat" -> "b"), Map("v" -> 40.0)))) == Seq(2, 4))
    assert(ids(Map("$and" -> Seq(Map("cat" -> "a"), Map("v" -> 10.0)))) == Seq(1))
    assert(ids(Map("$nor" -> Seq(Map("cat" -> "a"), Map("cat" -> "b")))) == Seq(4))
  }

  test("$not") {
    assert(ids(Map("v" -> Map("$not" -> Map("$gt" -> 20.0)))) == Seq(1, 2))
  }

  test("$exists") {
    val withNull = df.withColumn("maybe",
      when($"_id" === 1, lit("x")).otherwise(lit(null)))
    assert(withNull.where(QueryCompiler.compile(
      Map("maybe" -> Map("$exists" -> true)))).count() == 1)
    assert(withNull.where(QueryCompiler.compile(
      Map("maybe" -> Map("$exists" -> false)))).count() == 3)
  }

  test("$regex / $size / $all / $mod") {
    assert(ids(Map("cat" -> Map("$regex" -> "^[ab]$"))) == Seq(1, 2, 3))
    assert(ids(Map("arr" -> Map("$size" -> 2))) == Seq(2))
    assert(ids(Map("arr" -> Map("$all" -> Seq(2, 3)))) == Seq(1, 2))
    assert(ids(Map("_id" -> Map("$mod" -> Seq(2, 0)))) == Seq(2, 4))
  }

  test("$elemMatch") {
    assert(ids(Map("arr" -> Map("$elemMatch" ->
      Map("$gte" -> 3, "$lt" -> 5)))) == Seq(1, 2, 4))
  }

  test("dotted nested path") {
    val nested = df.withColumn("sub", struct($"v".as("inner")))
    assert(nested.where(QueryCompiler.compile(
      Map("sub.inner" -> Map("$gt" -> 25.0)))).count() == 2)
  }

  test("null equality matches null") {
    val withNull = df.withColumn("maybe",
      when($"_id" === 1, lit("x")).otherwise(lit(null)))
    assert(withNull.where(QueryCompiler.compile(Map("maybe" -> null)))
      .count() == 3)
  }

  test("$bits* predicates accept masks and bit-position arrays") {
    // _id bits: 1=0b001, 2=0b010, 3=0b011, 4=0b100
    assert(ids(Map("_id" -> Map("$bitsAllSet" -> 3))) == Seq(3))
    assert(ids(Map("_id" -> Map("$bitsAllSet" -> Seq(0)))) == Seq(1, 3))
    assert(ids(Map("_id" -> Map("$bitsAnySet" -> Seq(1, 2)))) == Seq(2, 3, 4))
    assert(ids(Map("_id" -> Map("$bitsAllClear" -> 6))) == Seq(1))
    assert(ids(Map("_id" -> Map("$bitsAnyClear" -> 3))) == Seq(1, 2, 4))
    // positions are a SET: duplicates OR together, not sum
    assert(ids(Map("_id" -> Map("$bitsAllSet" -> Seq(0, 0)))) ==
      ids(Map("_id" -> Map("$bitsAllSet" -> Seq(0)))))
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("_id" -> Map("$bitsAllSet" -> Seq(64))))
    }
  }

  test("$type 'date' matches DATE and TIMESTAMP; 'double' matches FLOAT") {
    val typed = df
      .withColumn("d", lit(java.sql.Date.valueOf("2024-01-02")))
      .withColumn("ts", current_timestamp())
      .withColumn("fl", $"v".cast("float"))
    def n(field: String, alias: String): Long =
      typed.where(QueryCompiler.compile(
        Map(field -> Map("$type" -> alias)))).count()
    assert(n("d", "date") == 4 && n("ts", "date") == 4)
    assert(n("fl", "double") == 4)
    assert(n("d", "double") == 0)
  }

  test("$type constant-folds: no typeof in the optimized plan (codegen-safe)") {
    // the earlier typeof(c)==="date" form generated uncompilable Java for
    // date/timestamp operands and silently fell back to interpreted eval
    val typed = df
      .withColumn("d", lit(java.sql.Date.valueOf("2024-01-02")))
      .withColumn("ts", current_timestamp())
    for (field <- Seq("d", "ts"); alias <- Seq("date", "string")) {
      val plan = typed.where(QueryCompiler.compile(
        Map(field -> Map("$type" -> alias)))).queryExecution.optimizedPlan
      assert(!plan.toString.contains("typeof"),
        s"$$type $field/$alias left a runtime typeof in: $plan")
      assert(!plan.toString.toLowerCase.contains("typealiasmatches"),
        s"$$type $field/$alias did not fold: $plan")
    }
  }

  test("$type matches the static column type; 'null' matches null values") {
    assert(ids(Map("cat" -> Map("$type" -> "string"))) == Seq(1, 2, 3, 4))
    assert(ids(Map("v" -> Map("$type" -> "double"))) == Seq(1, 2, 3, 4))
    assert(ids(Map("arr" -> Map("$type" -> "array"))) == Seq(1, 2, 3, 4))
    assert(ids(Map("_id" -> Map("$type" -> "long"))) == Seq(1, 2, 3, 4))
    assert(ids(Map("v" -> Map("$type" -> "string"))) == Seq())
    val withNull = df.withColumn("maybe", when($"_id" === 1, lit("x")))
    assert(withNull.where(QueryCompiler.compile(
      Map("maybe" -> Map("$type" -> "null")))).count() == 3)
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("v" -> Map("$type" -> "objectId")))
    }
  }

  test("$text OR-matches whitespace tokens of the text column") {
    val docs = Seq((1L, "spark shuffles data"), (2L, "duck pond"),
      (3L, "a shuffle appears")).toDF("_id", "text")
    def hits(search: String): Seq[Long] =
      docs.where(QueryCompiler.compile(Map("$text" ->
        Map("$search" -> search)))).select("_id").as[Long]
        .collect().toSeq.sorted
    assert(hits("spark shuffle") == Seq(1, 3)) // whole tokens, no substring
    assert(hits("pond") == Seq(2))
    assert(hits("absent") == Seq())
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$text" -> Map("$search" -> "  ")))
    }
  }

  test("$text $language english: stemming and stop removal both sides") {
    val docs = Seq(
      (1L, "The filtering systems are fast"),
      (2L, "filter the stream"),
      (3L, "filtration plant"),
      (4L, "nothing here")).toDF("_id", "text")
    def hits(search: String): Seq[Long] =
      docs.where(QueryCompiler.compile(Map("$text" ->
        Map("$search" -> search, "$language" -> "english"))))
        .select("_id").as[Long].collect().toSeq.sorted
    // inflected query term matches base and inflected docs, not the
    // different-stem 'filtration'
    assert(hits("filters") == Seq(1, 2))
    // phrase adjacency runs in the stop-removed stemmed stream:
    // "filter the stream" matches "filtering streams" (the unindexed)
    assert(hits("\"filtering streams\"") == Seq(2))
    // a bare stop word is unindexed: matches nothing
    assert(hits("the nonexistenttoken") == Seq())
    // negated stemmed term; negated stop word constrains nothing
    assert(hits("filters -streaming") == Seq(1))
    assert(hits("filters -the") == Seq(1, 2))
    // negated STOP-PHRASE constrains nothing either (a never-indexed
    // phrase must not exclude everything), while a positive stop-only
    // phrase is unindexed and — since phrase legs AND together —
    // empties the result
    assert(hits("filters -\"the\"") == Seq(1, 2))
    assert(hits("filters \"the\"") == Seq())
    // unsupported language and caseSensitive+english reject loudly
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$text" ->
        Map("$search" -> "x", "$language" -> "finnish")))
    }
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$text" -> Map("$search" -> "x",
        "$language" -> "english", "$caseSensitive" -> true)))
    }
  }

  test("$text $language french/german: Snowball stemming, stops, " +
      "iso codes") {
    val docs = Seq(
      (1L, "la continuelle recherche"),
      (2L, "chercher les traitements"),
      (3L, "die möglichkeiten der kindern"),
      (4L, "laufen und wanderung")).toDF("_id", "text")
    def hits(q: Map[String, Any]): Seq[Long] =
      docs.where(QueryCompiler.compile(Map("$text" -> q)))
        .select("_id").as[Long].collect().toSeq.sorted
    // inflected french query meets inflected docs; 'la' is unindexed
    assert(hits(Map("$search" -> "continuellement cherchez",
      "$language" -> "french")) == Seq(1, 2))
    // german phrase adjacency in the stop-removed stream ('der' drops)
    assert(hits(Map("$search" -> "\"mögliche kinder\"",
      "$language" -> "de")) == Seq(3))
    // iso code fr = french
    assert(hits(Map("$search" -> "traitement",
      "$language" -> "fr")) == Seq(2))
  }

  test("$text negation and quoted phrases") {
    val docs = Seq(
      (1L, "spark shuffles data fast"),
      (2L, "spark shuffles data slow"),
      (3L, "shuffles data"),
      (4L, "spark standalone")).toDF("_id", "text")
    def hits(search: String): Seq[Long] =
      docs.where(QueryCompiler.compile(Map("$text" ->
        Map("$search" -> search)))).select("_id").as[Long]
        .collect().toSeq.sorted
    // -term excludes
    assert(hits("spark -slow") == Seq(1, 4))
    // quoted phrase is an exact-substring AND over the OR terms
    assert(hits("spark \"shuffles data\"") == Seq(1, 2))
    // phrase-only search: phrase carries the positive match
    assert(hits("\"shuffles data fast\"") == Seq(1))
    // negated phrase
    assert(hits("spark -\"data slow\"") == Seq(1, 4))
    // only exclusions → no positive predicate → reject
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$text" -> Map("$search" -> "-slow")))
    }
  }

  test("$text $caseSensitive: default folds case, true is exact") {
    val docs = Seq((1L, "Spark Rocks"), (2L, "spark rocks"), (3L, "flink"))
      .toDF("_id", "text")
    def hits(q: Map[String, Any]): Seq[Long] =
      docs.where(QueryCompiler.compile(Map("$text" -> q)))
        .select("_id").as[Long].collect().toSeq.sorted
    assert(hits(Map("$search" -> "SPARK")) == Seq(1, 2))
    assert(hits(Map("$search" -> "spark", "$caseSensitive" -> true)) ==
      Seq(2))
    assert(hits(Map("$search" -> "\"Spark Rocks\"",
      "$caseSensitive" -> true)) == Seq(1))
    // $language accepted and ignored; unknown options reject
    assert(hits(Map("$search" -> "flink", "$language" -> "en")) == Seq(3))
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$text" ->
        Map("$search" -> "x", "$bogus" -> 1)))
    }
  }

  test("unknown operator rejected") {
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("v" -> Map("$near" -> 1)))
    }
  }

  private def geoDocs = Seq(
    (1L, Seq(0.0, 0.0)), (2L, Seq(3.0, 4.0)), (3L, Seq(10.0, 0.0)),
    (4L, Seq(0.5, 0.5)), (5L, Seq(-2.0, -2.0)))
    .toDF("_id", "loc")

  private def geoHits(q: Map[String, Any]): Seq[Long] =
    geoDocs.where(QueryCompiler.compile(q)).select("_id").as[Long]
      .collect().toSeq.sorted

  test("$geoWithin: $center, $box, $polygon, $centerSphere, $geometry") {
    // planar circle radius 5 around origin: ids 1 (d=0), 2 (d=5), 4, 5
    assert(geoHits(Map("loc" -> Map("$geoWithin" ->
      Map("$center" -> Seq(Seq(0.0, 0.0), 5.0))))) == Seq(1, 2, 4, 5))
    // box [(-1,-1), (1,1)]: ids 1, 4
    assert(geoHits(Map("loc" -> Map("$geoWithin" ->
      Map("$box" -> Seq(Seq(-1.0, -1.0), Seq(1.0, 1.0)))))) == Seq(1, 4))
    // triangle around the origin quadrant: contains 1 (on ray) and 4
    assert(geoHits(Map("loc" -> Map("$geoWithin" ->
      Map("$polygon" -> Seq(Seq(-1.0, -1.0), Seq(2.0, -1.0),
        Seq(0.0, 2.0)))))) == Seq(1, 4))
    // spherical cap of 0.02 rad (~127 km): only the origin point and 4
    // (0.5°,0.5° ≈ 0.0123 rad away)
    assert(geoHits(Map("loc" -> Map("$geoWithin" ->
      Map("$centerSphere" -> Seq(Seq(0.0, 0.0), 0.02))))) == Seq(1, 4))
    // GeoJSON polygon with a hole that excludes the origin
    assert(geoHits(Map("loc" -> Map("$geoWithin" -> Map("$geometry" ->
      Map("type" -> "Polygon", "coordinates" -> Seq(
        Seq(Seq(-1.0, -1.0), Seq(2.0, -1.0), Seq(2.0, 2.0), Seq(-1.0, 2.0),
          Seq(-1.0, -1.0)),
        Seq(Seq(-0.1, -0.1), Seq(0.1, -0.1), Seq(0.1, 0.1), Seq(-0.1, 0.1),
          Seq(-0.1, -0.1)))))))) == Seq(4))
  }

  test("$geoIntersects: Polygon with hole, MultiPolygon, rejections") {
    // point ∩ polygon = containment: same square-with-hole as above
    assert(geoHits(Map("loc" -> Map("$geoIntersects" -> Map("$geometry" ->
      Map("type" -> "Polygon", "coordinates" -> Seq(
        Seq(Seq(-1.0, -1.0), Seq(2.0, -1.0), Seq(2.0, 2.0), Seq(-1.0, 2.0),
          Seq(-1.0, -1.0)),
        Seq(Seq(-0.1, -0.1), Seq(0.1, -0.1), Seq(0.1, 0.1), Seq(-0.1, 0.1),
          Seq(-0.1, -0.1)))))))) == Seq(4))
    // MultiPolygon: two disjoint boxes catching ids 4 and 5
    assert(geoHits(Map("loc" -> Map("$geoIntersects" -> Map("$geometry" ->
      Map("type" -> "MultiPolygon", "coordinates" -> Seq(
        Seq(Seq(Seq(0.2, 0.2), Seq(1.0, 0.2), Seq(1.0, 1.0), Seq(0.2, 1.0),
          Seq(0.2, 0.2))),
        Seq(Seq(Seq(-3.0, -3.0), Seq(-1.0, -3.0), Seq(-1.0, -1.0),
          Seq(-3.0, -1.0), Seq(-3.0, -3.0))))))))) == Seq(4, 5))
    // non-areal query geometry and missing $geometry reject
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("loc" -> Map("$geoIntersects" ->
        Map("$geometry" -> Map("type" -> "Point",
          "coordinates" -> Seq(0.0, 0.0))))))
    }
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("loc" -> Map("$geoIntersects" ->
        Map("bogus" -> 1))))
    }
  }

  test("$near/$nearSphere: distance-bound filters, units per form") {
    // legacy planar: within 5 of origin
    assert(geoHits(Map("loc" -> Map("$near" -> Seq(0.0, 0.0),
      "$maxDistance" -> 5.0))) == Seq(1, 2, 4, 5))
    // with $minDistance: excludes the origin point itself
    assert(geoHits(Map("loc" -> Map("$near" -> Seq(0.0, 0.0),
      "$minDistance" -> 0.1, "$maxDistance" -> 5.0))) == Seq(2, 4, 5))
    // legacy $nearSphere: radians
    assert(geoHits(Map("loc" -> Map("$nearSphere" -> Seq(0.0, 0.0),
      "$maxDistance" -> 0.02))) == Seq(1, 4))
    // GeoJSON form: meters
    assert(geoHits(Map("loc" -> Map("$near" -> Map(
      "$geometry" -> Map("type" -> "Point",
        "coordinates" -> Seq(0.0, 0.0)),
      "$maxDistance" -> 130000.0)))) == Seq(1, 4))
    // no bound: matches every row with a location
    assert(geoHits(Map("loc" -> Map("$near" -> Seq(0.0, 0.0)))) ==
      Seq(1, 2, 3, 4, 5))
  }

  test("$near raises under strictMongo (ordering divergence)") {
    spark.conf.set("spark.graft.strictMongo", "true")
    try intercept[IllegalStateException] {
      QueryCompiler.compile(Map("loc" -> Map("$near" -> Seq(0.0, 0.0))))
    } finally spark.conf.unset("spark.graft.strictMongo")
  }

  test("$jsonSchema: types, bounds, pattern, enum, arrays, nesting") {
    val rows = Seq(
      (1L, "alpha", 5, Seq("a", "b"), ("x", 1)),
      (2L, "beta", 50, Seq("a", "a"), ("y", 2)),
      (3L, null.asInstanceOf[String], 7, Seq.empty[String], ("z", 3)))
      .toDF("_id", "name", "n", "tags", "sub")
    def hits(schema: Map[String, Any]): Seq[Long] =
      rows.where(QueryCompiler.compile(Map("$jsonSchema" -> schema)))
        .select("_id").as[Long].collect().toSeq.sorted

    // required: name null on row 3 → absent
    assert(hits(Map("required" -> Seq("name"))) == Seq(1, 2))
    // bounds with draft-4 exclusive modifier
    assert(hits(Map("properties" -> Map("n" ->
      Map("bsonType" -> "int", "minimum" -> 5, "maximum" -> 10)))) ==
      Seq(1, 3))
    assert(hits(Map("properties" -> Map("n" ->
      Map("minimum" -> 5, "exclusiveMinimum" -> true)))) == Seq(2, 3))
    // pattern applies only where present (row 3 passes: name absent)
    assert(hits(Map("properties" -> Map("name" ->
      Map("pattern" -> "^a")))) == Seq(1, 3))
    // pattern + required = Mongo's way to force presence
    assert(hits(Map("required" -> Seq("name"), "properties" ->
      Map("name" -> Map("pattern" -> "^a")))) == Seq(1))
    // enum
    assert(hits(Map("properties" -> Map("name" ->
      Map("enum" -> Seq("alpha", "zeta"))))) == Seq(1, 3))
    // arrays: minItems, uniqueItems, items
    assert(hits(Map("properties" -> Map("tags" ->
      Map("bsonType" -> "array", "minItems" -> 1)))) == Seq(1, 2))
    assert(hits(Map("properties" -> Map("tags" ->
      Map("uniqueItems" -> true)))) == Seq(1, 3))
    assert(hits(Map("properties" -> Map("tags" ->
      Map("items" -> Map("enum" -> Seq("a", "b")))))) == Seq(1, 2, 3))
    // type alternatives + integer alias covers long
    assert(hits(Map("properties" -> Map("_id" ->
      Map("type" -> "integer")))) == Seq(1, 2, 3))
    // nested object properties
    assert(hits(Map("properties" -> Map("sub" ->
      Map("bsonType" -> "object", "required" -> Seq("_1"),
        "properties" -> Map("_2" -> Map("maximum" -> 2)))))) == Seq(1, 2))
    // unsupported keyword rejects
    intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$jsonSchema" ->
        Map("patternProperties" -> Map())))
    }
  }

  test("$where rejects with guidance toward $expr") {
    val err = intercept[IllegalArgumentException] {
      QueryCompiler.compile(Map("$where" -> "this.a > 1"))
    }
    assert(err.getMessage.contains("$expr"))
  }

  test("$comment is accepted and matches everything") {
    assert(geoHits(Map("$comment" -> "why this query exists")) ==
      Seq(1, 2, 3, 4, 5))
  }
}
