package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Compiles MongoDB-style projection DOCUMENTS (not just inclusion field
  * lists) to a `select` over the input frame.
  *
  * The reference passes any projection doc to the server verbatim
  * (/root/reference/db/wrapper.go:386,463-465); here the engine evaluates
  * the doc itself. Supported forms, per Mongo `find` projection semantics:
  *
  *  - inclusion: `{f: 1, g: true}` — keep `_id` (when present and not
  *    excluded) plus the listed fields;
  *  - exclusion: `{f: 0, g: false}` — keep everything else;
  *  - `$slice`: `{arr: {$slice: n}}` (first n; last n when negative) or
  *    `{arr: {$slice: [skip, limit]}}` (negative skip counts from the
  *    end). A `$slice` on its own behaves like Mongo: every other field is
  *    kept; combined with inclusions only those are kept;
  *  - `$elemMatch`: `{arr: {$elemMatch: <match>}}` — the FIRST array
  *    element satisfying the match as a 1-element array, null when none
  *    (Mongo omits the field; columnar schemas are fixed, so null is the
  *    closest analog). Counts as an inclusion, like Mongo.
  *
  * Mixing inclusions and exclusions (other than `_id: 0`) is rejected,
  * matching the server's error. Everything compiles to Column expressions
  * (`slice`/`filter`), so projections stay inside whole-stage codegen and
  * column pruning still reaches the scan.
  */
object ProjectionCompiler {

  def project(df: DataFrame, doc: Map[String, Any]): DataFrame = {
    require(doc.nonEmpty, "empty projection document")
    val schema = df.schema.fieldNames.toSeq

    var incl = Set.empty[String]
    var excl = Set.empty[String]
    var ops = Map.empty[String, Column] // field -> replacement expression
    var opIsInclusion = false // $elemMatch forces inclusion mode
    // dotted paths in the doc's ITERATION order — Scala's default Map
    // keeps insertion order only up to 4 entries; pass a ListMap when the
    // rebuilt struct's member order matters beyond that (same caveat as
    // $sort documents, see PipelineCompiler's header)
    var dottedIncl = Vector.empty[(String, String)] // top -> rest
    var dottedExcl = Vector.empty[(String, String)]

    doc.foreach {
      case (f, m: Map[_, _]) =>
        val om = m.asInstanceOf[Map[String, Any]]
        om.keys.toList match {
          case List("$slice") if f.contains('.') =>
            // dotted $slice: rewrite just that member inside its top-level
            // struct (withField resolves dotted nested paths)
            val top = f.takeWhile(_ != '.')
            val rest = f.drop(top.length + 1)
            if (ops.contains(top))
              throw new IllegalArgumentException(s"path collision at $top")
            ops += top ->
              col(top).withField(rest, sliceExpr(col(f), om("$slice"))).as(top)
          case List("$slice") =>
            if (ops.contains(f))
              throw new IllegalArgumentException(s"path collision at $f")
            ops += f -> sliceExpr(col(f), om("$slice")).as(f)
          case List("$elemMatch") =>
            // server parity: "Cannot use $elemMatch projection on a nested
            // field"
            require(!f.contains('.'),
              s"$$elemMatch projection on a nested field: $f")
            if (ops.contains(f))
              throw new IllegalArgumentException(s"path collision at $f")
            opIsInclusion = true
            ops += f -> elemMatchExpr(col(f), om("$elemMatch")).as(f)
          case other => throw new IllegalArgumentException(
            s"unsupported projection operator(s) on '$f': ${other.mkString(",")}")
        }
      case (f, v) =>
        val include = v match {
          case b: Boolean => b
          case n: Number  => n.doubleValue() != 0.0
          case other => throw new IllegalArgumentException(
            s"projection value for '$f' must be 0/1/bool/operator doc: $other")
        }
        if (f.contains('.')) {
          val top = f.takeWhile(_ != '.')
          val rest = f.drop(top.length + 1)
          if (include) dottedIncl :+= (top -> rest)
          else dottedExcl :+= (top -> rest)
        }
        else if (include) incl += f else excl += f
    }

    val inclusionMode = incl.nonEmpty || dottedIncl.nonEmpty || opIsInclusion
    val badExcl = excl.filter(_ != "_id") ++ dottedExcl.map(_._1)
    if (inclusionMode && badExcl.nonEmpty)
      throw new IllegalArgumentException(
        s"cannot exclude fields ${badExcl.mkString(",")} in an inclusion projection")
    if (!inclusionMode && incl.isEmpty && excl.isEmpty && ops.isEmpty &&
        dottedExcl.isEmpty)
      throw new IllegalArgumentException("empty projection document")

    // {"a.b": 1}: rebuild `a` as a struct holding only the selected
    // members (recursively); {"a": 1, "a.b": 1} is a path collision, like
    // the server's error. {"a.b": 0}: dropFields on the struct.
    dottedIncl.groupBy(_._1).foreach { case (top, pairs) =>
      if (incl(top) || ops.contains(top))
        throw new IllegalArgumentException(s"path collision at $top")
      ops += top -> inclStruct(top, pairs.map(_._2),
        structTypeAt(df.schema, top)).as(top)
    }
    dottedExcl.groupBy(_._1).foreach { case (top, pairs) =>
      if (ops.contains(top))
        throw new IllegalArgumentException(s"path collision at $top")
      if (!inclusionMode)
        ops += top -> col(top).dropFields(pairs.map(_._2): _*).as(top)
    }

    // retained fields in schema order; unknown projected names are simply
    // absent from the output (Mongo: missing fields project to nothing)
    val retained = schema.filter { f =>
      if (inclusionMode)
        (incl(f) || ops.contains(f) || f == "_id") && !excl(f)
      else !excl(f)
    }
    require(retained.nonEmpty, "projection removes every column")
    df.select(retained.map(f => ops.getOrElse(f, col(f))): _*)
  }

  /** Nested inclusion: rebuild the struct at `prefix` keeping only the
    * `rests` paths, in the UNDERLYING SCHEMA's field order (Mongo inclusion
    * projections preserve document order, not projection-doc order). A
    * parent null projects to a struct of nulls (Mongo omits the parent;
    * fixed columnar schemas make null members the closest analog, same
    * stance as `$elemMatch`). */
  private def inclStruct(prefix: String, rests: Seq[String],
      st: StructType): Column = {
    val tops = rests.map(_.takeWhile(_ != '.')).distinct.toSet
    // schema order; requested members absent from the struct project to
    // nothing (Mongo: missing fields are simply omitted)
    val ordered = st.fieldNames.toSeq.filter(tops)
    require(ordered.nonEmpty,
      s"projection keeps no existing member of $prefix")
    struct(ordered.map { t =>
      val whole = rests.contains(t)
      val subs = rests.filter(_.startsWith(t + ".")).map(_.drop(t.length + 1))
      if (whole && subs.nonEmpty)
        throw new IllegalArgumentException(s"path collision at $prefix.$t")
      if (whole) col(s"$prefix.$t").as(t)
      else st(t).dataType match {
        case child: StructType => inclStruct(s"$prefix.$t", subs, child).as(t)
        case other => throw new IllegalArgumentException(
          s"$prefix.$t is $other, not a document; cannot project into it")
      }
    }: _*)
  }

  /** Resolve the StructType at a top-level column. */
  private def structTypeAt(schema: StructType, top: String): StructType =
    schema.find(_.name == top).map(_.dataType) match {
      case Some(st: StructType) => st
      case Some(other) => throw new IllegalArgumentException(
        s"$top is $other, not a document; cannot project into it")
      case None => throw new IllegalArgumentException(
        s"no column $top to project into")
    }

  /** `$slice: n` / `$slice: [skip, limit]` as a codegen'd slice. */
  private def sliceExpr(c: Column, spec: Any): Column = spec match {
    case n: Number =>
      val k = n.intValue()
      require(k != 0, "$slice: 0 is not a valid count")
      if (k > 0) slice(c, 1, k)
      // last |k|: whole array when shorter than |k| (Mongo semantics)
      else when(size(c) <= -k, c).otherwise(slice(c, k, -k))
    case s: Seq[_] =>
      val nums = s.map {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$$slice array form expects numbers: $other")
      }
      require(nums.length == 2, s"$$slice expects [skip, limit]: $s")
      val Seq(skip, limit) = nums
      require(limit > 0, s"$$slice limit must be positive: $limit")
      if (skip >= 0) slice(c, skip + 1, limit)
      // negative skip counts from the end, clamped to the array start
      else slice(c, greatest(size(c) + lit(skip) + 1, lit(1)), lit(limit))
    case other =>
      throw new IllegalArgumentException(s"$$slice operand: $other")
  }

  /** `$elemMatch` projection: first matching element as a 1-element array,
    * null when nothing matches. */
  private def elemMatchExpr(c: Column, spec: Any): Column = spec match {
    case m: Map[_, _] =>
      val matched = filter(c,
        x => QueryCompiler.elemMatchPredicate(x, m.asInstanceOf[Map[String, Any]]))
      when(size(matched) > 0, slice(matched, 1, 1))
    case other =>
      throw new IllegalArgumentException(s"$$elemMatch operand: $other")
  }
}
