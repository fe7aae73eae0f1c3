package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles MongoDB-style query documents to Catalyst `Column` predicates.
  *
  * The reference ships query documents verbatim to the MongoDB server
  * (/root/reference/db/wrapper.go:452-481, generator_simple.go:81); here the
  * engine evaluates them itself, compiled to declarative Column expressions so
  * Catalyst gets predicate pushdown / codegen for free (never row UDFs).
  *
  * Supported surface (superset of what anser itself uses — equality, `$gt`,
  * `$in`, implicit AND, dotted paths; see SURVEY.md §2.2):
  * `$eq $ne $gt $gte $lt $lte $in $nin $exists $regex $size $all $mod $not
  * $and $or $nor $expr $elemMatch $type $bitsAllSet $bitsAnySet
  * $bitsAllClear $bitsAnyClear $geoWithin $near $nearSphere $jsonSchema
  * $comment` and dotted nested paths (bsonutil/helpers.go:7-9 analog).
  *
  * Query documents are plain Scala `Map[String, Any]`; values may be String,
  * Boolean, numeric, java.sql.Timestamp / java.time.Instant / LocalDate,
  * Seq[...] (for `$in`/`$all`), nested Map (operator docs), or `null`.
  */
object QueryCompiler {

  /** Compile a full query document: top-level keys are AND-ed
    * (implicit conjunction, Mongo semantics). Empty doc matches all rows. */
  def compile(query: Map[String, Any]): Column =
    query.map { case (k, v) => clause(k, v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Compile under a `collation` — string equality/range/membership
    * comparisons fold both sides through the collation key (Column
    * construction is eager, so the dynamic scope covers every comparison
    * the document compiles to). */
  def compile(query: Map[String, Any],
      collation: Option[Collation.Spec]): Column =
    activeCollation.withValue(collation)(compile(query))

  /** The collation in effect while a query/pipeline compiles —
    * [[graft.pipeline.PipelineCompiler]] reads it for `$sort`. */
  private[graft] val activeCollation =
    new scala.util.DynamicVariable[Option[Collation.Spec]](None)

  /** Schema oracle for the collation fold: Mongo applies collation only
    * to STRING-to-string comparisons — `{numCol: {$in: [5, "x"]}}` under
    * a collation must not lowercase-cast numCol. Callers that hold the
    * DataFrame install `field -> isString` here; with no oracle the
    * compiler keeps the permissive fold (string literal ⇒ fold), the
    * only option without a schema. */
  private[graft] val activeStringCheck =
    new scala.util.DynamicVariable[Option[String => Boolean]](None)

  /** Compile against `df`'s schema: the collation fold gates on the
    * field's resolved type being StringType. */
  def compileFor(df: org.apache.spark.sql.DataFrame,
      query: Map[String, Any]): Column =
    activeStringCheck.withValue(Some { field =>
      try df.select(field).schema.head.dataType ==
        org.apache.spark.sql.types.StringType
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    })(compile(query))

  private def fieldIsString(field: String): Boolean =
    activeStringCheck.value.forall(_(field))

  /** Mongo type bracketing under a collation: a STRING literal compared
    * to a non-string column can never match (strings only equal
    * strings) — and must not be coerced, which under ANSI mode would
    * throw on non-numeric strings. Only decidable when the schema
    * oracle is installed; scoped to collated compiles so the long-
    * standing binary coercion behavior elsewhere is untouched. */
  private def typeClash(field: String, v: Any): Boolean =
    activeCollation.value.isDefined && v.isInstanceOf[String] &&
      activeStringCheck.value.exists(f => !f(field))

  /** Fold a (column, string-literal) comparison pair through the active
    * collation; non-string literals — and non-string COLUMNS, when a
    * schema oracle is installed — compare binary as always. */
  private def cmpPair(field: String, c: Column, v: Any): (Column, Column) =
    (activeCollation.value, v) match {
      case (Some(sp), s: String) if fieldIsString(field) =>
        (sp.key(c), sp.foldLit(s))
      case _ => (c, toLit(v))
    }

  private def clause(key: String, value: Any): Column = key match {
    case "$and" => subdocs(value, "$and").map(compile).reduce(_ && _)
    case "$or"  => subdocs(value, "$or").map(compile).reduce(_ || _)
    case "$nor" => !subdocs(value, "$nor").map(compile).reduce(_ || _)
    case "$expr" => // aggregation expression as a predicate (Mongo $expr)
      graft.pipeline.PipelineCompiler.expr2col(value).cast("boolean")
    case "$sampleRate" => // keep each row with probability p (per-row
      // Bernoulli, non-deterministic — NOT the hash-stable
      // Sampling.hashSample, which is the reproducible-pipeline form)
      val p = value match {
        case n: Number => n.doubleValue()
        case other =>
          throw new IllegalArgumentException(s"$$sampleRate: $other")
      }
      require(p >= 0.0 && p <= 1.0, s"$$sampleRate out of [0,1]: $p")
      rand() < lit(p)
    case "$text" =>
      // Mongo $text consults a text index; the engine's convention is a
      // `text` column (FIXTURES.md documents schema). Full search-string
      // grammar: bare terms OR-match on whitespace tokens (Mongo's default
      // OR semantics), `"quoted phrases"` must ALL be present as
      // substrings, and `-term` / `-"phrase"` exclusions must ALL be
      // absent. `$caseSensitive` matches Mongo (default false =
      // fold-to-lower on both sides). `$language: "english"/"french"/
      // "german"` (or iso codes en/fr/de) runs the language's analysis
      // chain (stop-word removal + Porter/Snowball stemming, the same
      // machinery as the lucene.* $search analyzers) on BOTH sides, so
      // "filtering" matches "filter" and "continuellement" matches
      // "continuelle"; "none" (and omitted — a DOCUMENTED divergence:
      // Mongo's default is english, but silently stemming every
      // existing unanalyzed query would change long-standing results)
      // keeps exact-token matching; other languages reject loudly.
      // `$diacriticSensitive` is accepted and ignored (no diacritic
      // folding over parquet text; the german chain folds umlauts as
      // part of the published stemmer itself).
      val (search, caseSensitive, lang) = parseTextOptions(value)
      textPredicate(search, caseSensitive, lang)
    case "$comment" => lit(true) // server-log annotation: no predicate
    case "$where" => throw new IllegalArgumentException(
      "$where (JavaScript) is not supported: there is no JS engine in a " +
        "columnar plan; express the predicate with $expr instead")
    case "$jsonSchema" => jsonSchema(value)
    case field  => fieldClause(field, value)
  }

  /** `$jsonSchema` validation queries (draft-4 subset + bson extensions,
    * the keywords real validators use): `bsonType`/`type` (scalar or
    * array of alternatives), `required`, `properties` (recursive),
    * `enum`, `minimum`/`maximum` (+ draft-4 boolean
    * `exclusiveMinimum`/`exclusiveMaximum`), `pattern`,
    * `minLength`/`maxLength`, `minItems`/`maxItems`, `uniqueItems`,
    * `items` (single-schema form, via `forall`). Unsupported keywords
    * reject at compile time rather than silently passing. Property
    * schemas apply only where the field is present (non-null), matching
    * Mongo: `required` is the presence check. */
  private def jsonSchema(v: Any): Column = {
    val schema = v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other =>
        throw new IllegalArgumentException(s"$$jsonSchema: $other")
    }
    objectSchema(schema, f => col(f))
  }

  /** Object-level keywords; `field` resolves a property name to its
    * column (root: `col(f)`; nested: `parent.getField(f)`). */
  private def objectSchema(schema: Map[String, Any],
      field: String => Column): Column = {
    val parts = schema.flatMap {
      case ("bsonType" | "type", t) =>
        // the object level itself: only "object" makes sense here
        require(t == "object",
          s"$$jsonSchema: object level must have type 'object', got $t")
        None
      case ("required", arr) =>
        seqOf(arr, "required").map(f => field(f.toString).isNotNull)
          .reduceOption(_ && _)
      case ("properties", props) =>
        val pm = props match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          case other =>
            throw new IllegalArgumentException(s"properties: $other")
        }
        pm.map { case (f, sub) =>
          val subSchema = sub match {
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            case other => throw new IllegalArgumentException(
              s"properties.$f: $other")
          }
          val fc = field(f)
          fc.isNull || valueSchema(fc, subSchema) // absent fields pass
        }.reduceOption(_ && _)
      case ("title" | "description", _) => None
      case (kw, _) => throw new IllegalArgumentException(
        s"$$jsonSchema: unsupported keyword $kw")
    }
    parts.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Value-level schema keywords applied to one (non-null) column. */
  private def valueSchema(c: Column, schema: Map[String, Any]): Column = {
    def typeAlias(t: String): Column = t match {
      case "number" => typeMatches(c, "int") || typeMatches(c, "long") ||
        typeMatches(c, "double") || typeMatches(c, "decimal")
      case "integer" => typeMatches(c, "int") || typeMatches(c, "long")
      case "boolean" => typeMatches(c, "bool")
      case "null" => c.isNull
      case other => typeMatches(c, other)
    }
    val exclMin = schema.get("exclusiveMinimum").contains(true)
    val exclMax = schema.get("exclusiveMaximum").contains(true)
    val parts = schema.flatMap {
      case ("bsonType" | "type", t) => Some(t match {
        case s: String => typeAlias(s)
        case alts: Seq[_] =>
          alts.map(a => typeAlias(a.toString)).reduce(_ || _)
        case other =>
          throw new IllegalArgumentException(s"bsonType: $other")
      })
      case ("minimum", n) =>
        Some(if (exclMin) c > toLit(n) else c >= toLit(n))
      case ("maximum", n) =>
        Some(if (exclMax) c < toLit(n) else c <= toLit(n))
      case ("exclusiveMinimum" | "exclusiveMaximum", b) =>
        require(b == true || b == false,
          s"$$jsonSchema: draft-4 boolean exclusive bounds, got $b")
        None // modifies minimum/maximum above
      case ("pattern", p) => Some(c.rlike(p.toString))
      case ("minLength", n) => Some(length(c) >= toLit(n))
      case ("maxLength", n) => Some(length(c) <= toLit(n))
      case ("enum", arr) =>
        Some(c.isin(seqOf(arr, "enum").map(toScalaLit): _*))
      case ("minItems", n) => Some(size(c) >= toLit(n))
      case ("maxItems", n) => Some(size(c) <= toLit(n))
      case ("uniqueItems", true) =>
        Some(size(array_distinct(c)) === size(c))
      case ("uniqueItems", _) => None
      case ("items", sub) =>
        val subSchema = sub match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          case other =>
            throw new IllegalArgumentException(s"items: $other")
        }
        Some(forall(c, x => valueSchema(x, subSchema)))
      case ("properties" | "required", _) =>
        // nested object: delegate both keywords in one pass below
        None
      case ("title" | "description", _) => None
      case (kw, _) => throw new IllegalArgumentException(
        s"$$jsonSchema: unsupported keyword $kw")
    }
    val nested =
      if (schema.contains("properties") || schema.contains("required"))
        Some(objectSchema(
          schema.filter { case (k, _) =>
            k == "properties" || k == "required" },
          f => c.getField(f)))
      else None
    (parts ++ nested).reduceOption(_ && _).getOrElse(lit(true))
  }

  private def fieldClause(field: String, value: Any): Column = value match {
    case ops: Map[_, _] if isOperatorDoc(ops) &&
        ops.asInstanceOf[Map[String, Any]].keySet
          .exists(k => k == "$near" || k == "$nearSphere") =>
      // $near's distance bounds are SIBLING keys in the same operator doc,
      // so the whole doc compiles as one unit
      nearClause(field, ops.asInstanceOf[Map[String, Any]])
    case ops: Map[_, _] if isOperatorDoc(ops) =>
      ops.asInstanceOf[Map[String, Any]]
        .map { case (op, v) => operator(field, op, v) }
        .reduce(_ && _)
    case null  => col(field).isNull // Mongo: matches null or missing
    case other =>
      if (typeClash(field, other)) lit(false)
      else { val (ck, vk) = cmpPair(field, col(field), other); ck === vk }
  }

  // string members fold through the active collation; non-strings pass
  // through binary — mirrors Mongo's "collation applies to strings".
  // A non-string COLUMN (schema oracle says so) never folds.
  private def collatedSet(field: String, c: Column, vs0: Seq[Any]): Column = {
    // type bracketing: string members can never match a non-string
    // column — drop them rather than let ANSI coercion throw
    val vs = if (vs0.exists(v => typeClash(field, v)))
      vs0.filterNot(_.isInstanceOf[String]) else vs0
    if (vs.isEmpty) return lit(false)
    activeCollation.value match {
      // struct-shaped keys must also claim ALL-non-string lists: the
      // raw-column fallback's isin would ANSI-cast the string column to
      // the member type and throw, where Mongo simply matches nothing
      case Some(sp) if fieldIsString(field) &&
          (vs.exists(_.isInstanceOf[String]) || sp.structKey) =>
        // foldLit keeps the literal the same SHAPE as the key (a struct
        // under caseLevel); isin passes Columns through lit() untouched.
        // Under caseLevel a non-string $in member cannot share the
        // struct-typed isin (int vs struct would fail analysis, where
        // Mongo semantics are simply "matches no string row") — it
        // compares against the RAW column instead
        if (sp.structKey) {
          // non-string members can never equal a string-typed field
          // (fieldIsString gated this branch) — drop them rather than
          // compare: mixing them into the struct-typed isin (caseLevel
          // OR tailored strength 2) fails analysis, and an ANSI-mode
          // raw-column compare would throw casting the column to the
          // member's type
          val strs = vs.collect { case s: String => s }
          if (strs.isEmpty) lit(false)
          else sp.key(c).isin(strs.map(sp.foldLit): _*)
        } else sp.key(c).isin(vs.map {
          case s: String => sp.foldLit(s)
          case other => toScalaLit(other)
        }: _*)
      case _ => c.isin(vs.map(toScalaLit): _*)
    }
  }

  private def operator(field: String, op: String, v: Any): Column = {
    val c = col(field)
    lazy val (ck, vk) = cmpPair(field, c, v)
    op match {
      case "$eq"  => if (typeClash(field, v)) lit(false) else ck === vk
      // Mongo $ne also matches documents where the field is null/missing.
      case "$ne"  => if (typeClash(field, v)) lit(true) else !(ck <=> vk)
      // range ops bracket like $eq: a string literal never compares
      // against a non-string column (and must not coerce — ANSI mode
      // would throw on non-numeric strings)
      case "$gt"  => if (typeClash(field, v)) lit(false) else ck > vk
      case "$gte" => if (typeClash(field, v)) lit(false) else ck >= vk
      case "$lt"  => if (typeClash(field, v)) lit(false) else ck < vk
      case "$lte" => if (typeClash(field, v)) lit(false) else ck <= vk
      case "$in"  => collatedSet(field, c, seqOf(v, "$in"))
      case "$nin" =>
        !coalesce(collatedSet(field, c, seqOf(v, "$nin")), lit(false))
      case "$exists" => if (v == true) c.isNotNull else c.isNull
      case "$regex"  => c.rlike(v.toString)
      case "$size"   => size(c) === toLit(v)
      case "$all" =>
        seqOf(v, "$all").map(e => array_contains(c, toLit(e))).reduce(_ && _)
      case "$mod" =>
        val Seq(d, r) = seqOf(v, "$mod").map(toLit)
        c % d === r
      case "$not" => v match {
        case m: Map[_, _] => !fieldClause(field, m)
        case _            => !(c === toLit(v))
      }
      case "$elemMatch" => v match {
        case m: Map[_, _] =>
          // element-wise: any array element satisfying the match document
          exists(c, x => elemMatchPredicate(x, m.asInstanceOf[Map[String, Any]]))
        case other => array_contains(c, toLit(other))
      }
      // bitwise predicates: mask is a number or an array of bit positions
      case "$bitsAllSet"   => c.bitwiseAND(bitmask(v)) === bitmask(v)
      case "$bitsAnySet"   => c.bitwiseAND(bitmask(v)) =!= lit(0L)
      case "$bitsAllClear" => c.bitwiseAND(bitmask(v)) === lit(0L)
      case "$bitsAnyClear" => c.bitwiseAND(bitmask(v)) =!= bitmask(v)
      // $type against the (static) Spark type; "null" matches null values
      case "$type" => v match {
        case "null" => c.isNull
        case t: String => c.isNotNull && typeMatches(c, t)
        case other =>
          throw new IllegalArgumentException(s"$$type expects a string: $other")
      }
      case "$geoWithin" => geoWithin(c, v)
      case "$geoIntersects" => geoIntersects(c, v)
      case other =>
        throw new IllegalArgumentException(s"unsupported query operator: $other")
    }
  }

  // ---- geo operators ($geoWithin / $near / $nearSphere) ----------------
  // The reference passes these through to the server like every other
  // query doc (db/wrapper.go:452-481). Point fields are [lon, lat] array
  // columns (dotted `f.coordinates` addresses a GeoJSON Point struct);
  // query geometry is literal, so every predicate folds into codegen.

  private def numD(v: Any, ctx: String): Double = v match {
    case n: Number => n.doubleValue()
    case other =>
      throw new IllegalArgumentException(s"$ctx: expected number, got $other")
  }

  private def point2(v: Any, ctx: String): (Double, Double) = v match {
    case s: Seq[_] if s.size == 2 =>
      (numD(s(0), ctx), numD(s(1), ctx))
    case other =>
      throw new IllegalArgumentException(s"$ctx: expected [x, y], got $other")
  }

  /** `$geoWithin` containment: `$center` (planar circle), `$centerSphere`
    * (great-circle radius in RADIANS, Mongo's unit), `$box`, `$polygon`
    * (planar ray casting), `$geometry` Polygon with holes (rings evaluated
    * in lon/lat coordinate space — a documented planar approximation of
    * Mongo's spherical edges; exact for the rectangles and small regions
    * this operator is typically used with). */
  private[graft] def geoWithin(c: Column, v: Any): Column = {
    import graft.functions.Geo
    val spec = v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other =>
        throw new IllegalArgumentException(s"$$geoWithin: $other")
    }
    require(spec.size == 1, s"$$geoWithin: exactly one shape, got ${spec.keys}")
    val (x, y) = (Geo.lon(c), Geo.lat(c))
    spec.head match {
      case ("$center", arg) =>
        val Seq(ctr, r) = seqOf(arg, "$center")
        val (cx, cy) = point2(ctr, "$center")
        Geo.planarDistance(x, y, cx, cy) <= lit(numD(r, "$center"))
      case ("$centerSphere", arg) =>
        val Seq(ctr, r) = seqOf(arg, "$centerSphere")
        val (clon, clat) = point2(ctr, "$centerSphere")
        Geo.haversineMeters(x, y, clon, clat) <=
          lit(numD(r, "$centerSphere") * Geo.EarthRadiusMeters)
      case ("$box", arg) =>
        val Seq(a, b) = seqOf(arg, "$box")
        val (x1, y1) = point2(a, "$box"); val (x2, y2) = point2(b, "$box")
        x >= math.min(x1, x2) && x <= math.max(x1, x2) &&
          y >= math.min(y1, y2) && y <= math.max(y1, y2)
      case ("$polygon", arg) =>
        val ring = seqOf(arg, "$polygon").map(p => point2(p, "$polygon"))
        Geo.pointInPolygon(x, y, ring)
      case ("$geometry", arg) =>
        val g = arg match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          case other =>
            throw new IllegalArgumentException(s"$$geometry: $other")
        }
        require(g.get("type").contains("Polygon"),
          s"$$geoWithin $$geometry: only Polygon, got ${g.get("type")}")
        val rings = seqOf(g.getOrElse("coordinates",
          throw new IllegalArgumentException("$geometry needs coordinates")),
          "$geometry").map(r =>
            seqOf(r, "$geometry ring").map(p => point2(p, "$geometry")))
        require(rings.nonEmpty, "$geometry: empty coordinates")
        // outer ring minus holes
        rings.tail.foldLeft(Geo.pointInPolygon(x, y, rings.head))(
          (acc, hole) => acc && !Geo.pointInPolygon(x, y, hole))
      case (other, _) => throw new IllegalArgumentException(
        s"$$geoWithin: unsupported shape $other")
    }
  }

  /** `$geoIntersects` for point-typed fields: a point intersects a query
    * Polygon / MultiPolygon iff it lies inside (or on the boundary of) one
    * of its polygons, so the predicate reduces to the same planar ray-cast
    * as `$geoWithin $geometry` (same reference pass-through,
    * /root/reference/db/wrapper.go:452-481; same documented planar
    * approximation of spherical edges). Non-point field geometries are
    * outside the [lon, lat]-column data model and reject at compile time
    * via the geometry-type check below. */
  private[graft] def geoIntersects(c: Column, v: Any): Column = {
    import graft.functions.Geo
    val spec = v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other =>
        throw new IllegalArgumentException(s"$$geoIntersects: $other")
    }
    val g = spec.getOrElse("$geometry",
      throw new IllegalArgumentException("$geoIntersects needs $geometry"))
      match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other =>
          throw new IllegalArgumentException(s"$$geometry: $other")
      }
    val (x, y) = (Geo.lon(c), Geo.lat(c))
    def ringsOf(arg: Any): Seq[Seq[(Double, Double)]] =
      seqOf(arg, "$geometry").map(r =>
        seqOf(r, "$geometry ring").map(p => point2(p, "$geometry")))
    def inPolygon(rings: Seq[Seq[(Double, Double)]]): Column = {
      require(rings.nonEmpty, "$geometry: empty coordinates")
      rings.tail.foldLeft(Geo.pointInPolygon(x, y, rings.head))(
        (acc, hole) => acc && !Geo.pointInPolygon(x, y, hole))
    }
    val coords = g.getOrElse("coordinates",
      throw new IllegalArgumentException("$geometry needs coordinates"))
    g.get("type") match {
      case Some("Polygon") => inPolygon(ringsOf(coords))
      case Some("MultiPolygon") =>
        seqOf(coords, "$geometry").map(p => inPolygon(ringsOf(p)))
          .reduce(_ || _)
      case other => throw new IllegalArgumentException(
        s"$$geoIntersects: only Polygon/MultiPolygon geometry, got $other")
    }
  }

  /** `$near`/`$nearSphere` compiled as the distance-bound FILTER. Mongo
    * additionally returns matches sorted by distance — inexpressible in a
    * predicate; compose with the `$geoNear` pipeline stage (or an explicit
    * sort on the same formula) when ordering matters. Under
    * `spark.graft.strictMongo` the divergence raises instead. Units follow
    * Mongo: legacy `$near` = coordinate units (planar); legacy
    * `$nearSphere` = radians; GeoJSON form of either = meters (spherical). */
  private def nearClause(field: String, ops: Map[String, Any]): Column = {
    import graft.functions.Geo
    org.apache.spark.sql.SparkSession.getActiveSession
      .filter(graft.Strict.strictMongo).foreach { _ =>
        throw new IllegalStateException(
          "[spark.graft.strictMongo] $near/$nearSphere compiles to the " +
            "distance filter WITHOUT Mongo's nearest-first ordering; use " +
            "the $geoNear pipeline stage for ordered results")
      }
    val c = col(field)
    val (x, y) = (Geo.lon(c), Geo.lat(c))
    val sphereOp = ops.contains("$nearSphere")
    val nearV = ops.getOrElse("$near", ops.getOrElse("$nearSphere",
      throw new IllegalStateException("unreachable")))
    val (dist, maxD, minD) = nearV match {
      case s: Seq[_] => // legacy point form; bounds are sibling keys
        val (px, py) = point2(s, "$near")
        val d =
          if (sphereOp) // radians on the unit sphere
            Geo.haversineMeters(x, y, px, py) / Geo.EarthRadiusMeters
          else Geo.planarDistance(x, y, px, py)
        (d, ops.get("$maxDistance"), ops.get("$minDistance"))
      case m: Map[_, _] => // GeoJSON form; bounds nested, meters
        val mm = m.asInstanceOf[Map[String, Any]]
        val geom = mm.getOrElse("$geometry",
          throw new IllegalArgumentException(
            s"$$near: expected $$geometry or [x, y], got $mm")) match {
          case g: Map[_, _] => g.asInstanceOf[Map[String, Any]]
          case other =>
            throw new IllegalArgumentException(s"$$geometry: $other")
        }
        require(geom.get("type").contains("Point"),
          s"$$near $$geometry: only Point, got ${geom.get("type")}")
        val (px, py) = point2(geom("coordinates"), "$near")
        (Geo.haversineMeters(x, y, px, py),
          mm.get("$maxDistance").orElse(ops.get("$maxDistance")),
          mm.get("$minDistance").orElse(ops.get("$minDistance")))
      case other => throw new IllegalArgumentException(
        s"$$near: expected $$geometry doc or [x, y], got $other")
    }
    val bounds = Seq(
      maxD.map(d => dist <= lit(numD(d, "$maxDistance"))),
      minD.map(d => dist >= lit(numD(d, "$minDistance")))).flatten
    val nearPred = bounds.reduceOption(_ && _).getOrElse(c.isNotNull)
    // any residual sibling operators compile through the normal path
    val residual = ops -- Seq("$near", "$nearSphere", "$maxDistance",
      "$minDistance")
    residual.foldLeft(nearPred) { case (acc, (op, v)) =>
      acc && operator(field, op, v)
    }
  }

  /** `$elemMatch` match document applied to one array element `x`: either
    * an operator doc over the element itself (`{$gt: 5}`) or field
    * conditions over a struct element (`{score: {$gt: 5}}`, `{kind: "a"}`).
    * Shared by the query predicate and the `$elemMatch` PROJECTION
    * ([[ProjectionCompiler]]). */
  private[graft] def elemMatchPredicate(x: Column, spec: Map[String, Any])
      : Column = {
    require(spec.nonEmpty, "$elemMatch: empty match document")
    if (isOperatorDoc(spec))
      spec.map { case (op, v) => elemOperator(x, op, v) }.reduce(_ && _)
    else spec.map {
      case (f, m: Map[_, _]) if isOperatorDoc(m) =>
        m.asInstanceOf[Map[String, Any]]
          .map { case (op, v) => elemOperator(x.getField(f), op, v) }
          .reduce(_ && _)
      case (f, v) => x.getField(f) === toLit(v)
    }.reduce(_ && _)
  }

  private def elemOperator(x: Column, op: String, v: Any): Column = op match {
    case "$eq"  => x === toLit(v)
    case "$ne"  => !(x <=> toLit(v))
    case "$gt"  => x > toLit(v)
    case "$gte" => x >= toLit(v)
    case "$lt"  => x < toLit(v)
    case "$lte" => x <= toLit(v)
    case "$in"  => seqOf(v, "$in").map(e => x === toLit(e)).reduce(_ || _)
    case other =>
      throw new IllegalArgumentException(s"unsupported $$elemMatch op: $other")
  }

  private[graft] def isOperatorDoc(m: Map[_, _]): Boolean =
    m.nonEmpty && m.keys.forall { case s: String => s.startsWith("$"); case _ => false }

  private def subdocs(v: Any, ctx: String): Seq[Map[String, Any]] = v match {
    case s: Seq[_] if s.nonEmpty =>
      s.map {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other => throw new IllegalArgumentException(
          s"$ctx expects an array of documents, got: $other")
      }
    case other => throw new IllegalArgumentException(
      s"$ctx expects a non-empty array, got: $other")
  }

  /** Bit mask for `$bits*` predicates: a plain number, or an array of bit
    * positions (Mongo's second form — a SET of positions, so duplicates
    * OR together rather than summing). */
  private def bitmask(v: Any): Column = v match {
    case n: Number => lit(n.longValue())
    case s: Seq[_] => lit(s.map {
      case p: Number =>
        val i = p.intValue()
        require(i >= 0 && i < 64, s"$$bits* position out of range: $i")
        1L << i
      case other => throw new IllegalArgumentException(
        s"$$bits* position must be a number: $other")
    }.foldLeft(0L)(_ | _))
    case other =>
      throw new IllegalArgumentException(s"$$bits* mask: $other")
  }

  /** True when column `c`'s static Spark type corresponds to the Mongo
    * type alias. Resolved against the column's `DataType` at analysis time
    * via [[graft.functions.TypeAliasMatches]] — it constant-folds to a
    * literal, so it is codegen-safe (the earlier `typeof(c) === "date"`
    * form generated uncompilable Java for date/timestamp operands and fell
    * back to interpreted evaluation). Shared by the query `$type` predicate
    * and the expression-level `$type`/`$isNumber` (PipelineCompiler). */
  private[graft] def typeMatches(c: Column, alias: String): Column = {
    graft.functions.TypeAliasMatches.validate(alias)
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.TypeAliasMatches(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), alias))
  }

  private def seqOf(v: Any, ctx: String): Seq[Any] = v match {
    case s: Seq[_] => s
    case other => throw new IllegalArgumentException(
      s"$ctx expects an array, got: $other")
  }

  /** Parsed `$text` search string: bare OR-terms, `"quoted phrases"`
    * (all must be present as substrings), `-term` / `-"phrase"`
    * exclusions (all must be absent). */
  private[graft] final case class TextSearch(
      terms: Seq[String], phrases: Seq[String],
      negTerms: Seq[String], negPhrases: Seq[String])

  private val textTokenRx = """-?"[^"]*"|\S+""".r

  private[graft] def parseTextSearch(search: String): TextSearch = {
    var terms = Vector.empty[String]; var phrases = Vector.empty[String]
    var negT = Vector.empty[String]; var negP = Vector.empty[String]
    textTokenRx.findAllIn(search).foreach { tok =>
      if (tok.startsWith("-\"") && tok.endsWith("\"") && tok.length > 3)
        negP :+= tok.substring(2, tok.length - 1)
      else if (tok.startsWith("\"") && tok.endsWith("\"") && tok.length > 2)
        phrases :+= tok.substring(1, tok.length - 1)
      else if (tok.startsWith("-") && tok.length > 1)
        negT :+= tok.substring(1)
      else if (!tok.startsWith("\"") && tok != "-")
        terms :+= tok
    }
    require(terms.nonEmpty || phrases.nonEmpty,
      s"$$text: no positive terms or phrases in '$search'")
    TextSearch(terms.distinct, phrases.distinct, negT.distinct, negP.distinct)
  }

  /** `$text` match predicate over the `text` column: any bare term, AND
    * all phrases, AND none of the exclusions — Mongo's documented
    * semantics for `$search` strings. Case-insensitive unless
    * `caseSensitive` (Mongo's default): both the text and the search
    * terms fold to lowercase. With `english`, both sides run the
    * english analysis chain (stop removal + Porter stemming —
    * [[graft.ops.TextFunctions.englishTokens]]): a bare stop-word term
    * matches NOTHING (it is never indexed, Mongo's rule) and a negated
    * stop word excludes nothing. */
  /** Parse + validate a `$text` option document (or bare search
    * string) → (search, caseSensitive, english) — the ONE parser both
    * the predicate and the `$match` textScore stash consult, so filter
    * and score analysis can never diverge. */
  private[graft] def parseTextOptions(value: Any)
      : (String, Boolean, String) = value match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val unknown = mm.keySet --
        Set("$search", "$caseSensitive", "$language",
          "$diacriticSensitive")
      require(unknown.isEmpty, s"$$text: unsupported option(s) $unknown")
      val lang = mm.get("$language").map(_.toString
        .toLowerCase(java.util.Locale.ROOT)).getOrElse("none") match {
        case "en" => "english"
        case "fr" => "french"
        case "de" => "german"
        case "es" => "spanish"
        case "it" => "italian"
        case "pt" => "portuguese"
        case "nl" => "dutch"
        case "sv" => "swedish"
        case "da" => "danish"
        case "nb" | "no" => "norwegian"
        case "ru" => "russian"
        case "tr" => "turkish"
        case "cs" => "czech"
        case other => other
      }
      require(Set("none", "english", "french", "german", "spanish",
        "italian", "portuguese", "dutch", "swedish", "danish",
        "norwegian", "russian", "turkish", "czech")(lang),
        s"$$text.$$language: '$lang' unsupported (none/english/french/" +
          "german/spanish/italian/portuguese/dutch/swedish/danish/" +
          "norwegian/russian/turkish/czech — other languages need " +
          "stemmers this engine does not model; Polish stemming is " +
          "dictionary-based (Stempel) and out of scope)")
      val cs = mm.get("$caseSensitive") match {
        case Some(b: Boolean) => b
        case Some(other) => throw new IllegalArgumentException(
          s"$$text.$$caseSensitive: $other")
        case None => false
      }
      require(!(cs && lang != "none"),
        s"$$text: $$caseSensitive cannot combine with $$language " +
          s"'$lang' — stemming folds case by construction")
      (mm.getOrElse("$search", throw new IllegalArgumentException(
        "$text requires $search")).toString, cs, lang)
    case s: String => (s, false, "none")
    case other =>
      throw new IllegalArgumentException(s"$$text: $other")
  }

  private[graft] def textPredicate(search: String,
      caseSensitive: Boolean = false, lang: String = "none"): Column = {
    val ts = parseTextSearch(search)
    val (toksExpr, term, phraseTerms) = textAnalysis(caseSensitive, lang)
    // the analyzed token array is let-bound ONCE per row: every bare
    // term, negation, and phrase references the bound variable — inlining
    // toksExpr would re-run the whole analysis chain (stop filter +
    // Porter stem of every token under `english`) once per clause, the
    // documented HOF re-evaluation trap
    element_at(transform(array(toksExpr), toks => {
      def hit(t: String): Column = term(t) match {
        case Seq() => lit(false) // stop word: unindexed, never matches
        case many => many.map(m => array_contains(toks, m)).reduce(_ && _)
      }
      // a phrase analyzing to NO tokens is unindexed like a bare stop
      // word: it matches nothing positively, and its negation (!false)
      // constrains nothing — both polarities fall out of lit(false)
      def pHit(p: String): Column = phraseTerms(p) match {
        case Seq() => lit(false)
        case terms =>
          graft.ops.TextFunctions.phraseOccurrences(toks, terms, 0) > 0
      }
      val pos = ts.terms.map(hit).reduceOption(_ || _).getOrElse(lit(true))
      val phr = ts.phrases.map(pHit).reduceOption(_ && _)
        .getOrElse(lit(true))
      val neg = (ts.negTerms.map(t => term(t) match {
          case Seq() => lit(true) // negated stop word constrains nothing
          case many =>
            !many.map(m => array_contains(toks, m)).reduce(_ && _)
        }) ++ ts.negPhrases.map(p => !pHit(p)))
        .reduceOption(_ && _).getOrElse(lit(true))
      pos && phr && neg
    }), 1)
  }

  /** (token column, bare-term analyzer, phrase analyzer) for the $text
    * grammar under the selected analysis mode. Phrase hits are
    * ANALYZED-TOKEN adjacency (not raw substring): "a b" matches
    * "x a b y" but not "xa by" — under `english`, adjacency runs in the
    * stop-removed stemmed stream on both sides. */
  private def textAnalysis(caseSensitive: Boolean, lang: String)
      : (Column, String => Seq[String], String => Seq[String]) =
    // one registry for every stemmed language (the $search analyzers
    // resolve the same map) — "none" and unsupported names fall back to
    // the plain case/diacritic fold
    graft.ops.TextFunctions.LanguageAnalyzers.get(s"lucene.$lang")
      .map { case (toks, terms) => (toks(col("text")), terms, terms) }
      .getOrElse {
        val (txt, fold) = textFold(caseSensitive)
        (graft.ops.TextFunctions.tokens(txt),
          (t: String) => Seq(fold(t)),
          (p: String) => fold(p).split("\\s+").filter(_.nonEmpty).toSeq)
      }

  /** Simplified textScore for the `{$meta: "textScore"}` carrier: count
    * of matching bare terms plus matching phrases (documented as simpler
    * than Mongo's tf weighting; `$search` carries full BM25). */
  private[graft] def textScore(search: String,
      caseSensitive: Boolean = false, lang: String = "none"): Column = {
    val ts = parseTextSearch(search)
    val (toksExpr, term, phraseTerms) = textAnalysis(caseSensitive, lang)
    // same one-per-row let-binding and unindexed-matches-nothing rules
    // as [[textPredicate]] — filter and score must agree
    element_at(transform(array(toksExpr), toks => {
      def hit(t: String): Column = term(t) match {
        case Seq() => lit(false)
        case many => many.map(m => array_contains(toks, m)).reduce(_ && _)
      }
      def pHit(p: String): Column = phraseTerms(p) match {
        case Seq() => lit(false)
        case terms =>
          graft.ops.TextFunctions.phraseOccurrences(toks, terms, 0) > 0
      }
      (ts.terms.map(t => hit(t).cast("int")) ++
        ts.phrases.map(p => pHit(p).cast("int")))
        .reduce(_ + _).cast("double")
    }), 1)
  }

  private def textFold(caseSensitive: Boolean): (Column, String => String) =
    if (caseSensitive) (col("text"), identity)
    else (lower(col("text")), _.toLowerCase(java.util.Locale.ROOT))

  /** Literal conversion for supported BSON-ish scalar types. */
  def toLit(v: Any): Column = lit(toScalaLit(v))

  private[graft] def toScalaLit(v: Any): Any = v match {
    case i: java.time.Instant    => java.sql.Timestamp.from(i)
    case d: java.time.LocalDate  => java.sql.Date.valueOf(d)
    case d: java.util.Date if !d.isInstanceOf[java.sql.Timestamp] &&
                              !d.isInstanceOf[java.sql.Date] =>
      new java.sql.Timestamp(d.getTime)
    case other => other
  }
}
