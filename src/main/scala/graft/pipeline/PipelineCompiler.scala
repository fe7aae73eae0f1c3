package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.query.QueryCompiler

/** Compiles MongoDB aggregation pipelines to DataFrame transformations.
  *
  * The reference passes pipelines through to the server opaquely
  * (/root/reference/db/wrapper.go:88-94,522-575 — `Collection.Pipe` with
  * `AllowDiskUse(true)`; spill is free in Spark). Here each stage compiles to
  * the corresponding declarative Spark operator so Catalyst can fuse, push
  * down and reorder: `$match`→where, `$project`→select, `$group`→groupBy.agg,
  * `$sort`→orderBy, `$limit`/`$skip`→limit/offset, `$unwind`→explode,
  * `$count`→count, `$lookup`→left join + collect_list, `$addFields`/`$set`→
  * withColumn, `$unset`→drop, `$sortByCount`, `$replaceRoot`→select(doc.*).
  *
  * Stage order in a `Seq[Map[String, Any]]` pipeline; `$sort` documents use
  * `Seq[(String, Int)]`-style ordering via insertion-ordered maps (pass
  * `scala.collection.immutable.ListMap` or the `$sort` value as
  * `Seq[(String, Any)]`).
  */
object PipelineCompiler {

  type TableResolver = String => DataFrame

  def compile(pipeline: Seq[Map[String, Any]],
      tables: TableResolver = name =>
        throw new IllegalArgumentException(s"$$lookup: unknown table $name"))
      : DataFrame => DataFrame =
    df => fuse(pipeline).foldLeft(df)((acc, st) => stage(acc, st, tables))

  /** Peephole rewrite: `$lookup(as: X)` immediately followed by
    * `$unwind: "$X"` is semantically an inner join — compile it to one,
    * skipping the collect_list → explode round-trip (array build + extra
    * shuffle). The classic Mongo idiom costs ~10× the join at scale. */
  private def fuse(pipeline: Seq[Map[String, Any]]): Seq[Map[String, Any]] =
    pipeline match {
      case lookup +: unwind +: rest
        if lookup.keySet == Set("$lookup") && unwind.keySet == Set("$unwind") &&
          (unwind("$unwind") match {
            case s: String =>
              s == "$" + lookup("$lookup").asInstanceOf[Map[String, Any]]("as")
            case _ => false
          }) =>
        Map("$__lookupUnwind" -> lookup("$lookup")) +: fuse(rest)
      case head +: rest => head +: fuse(rest)
      case empty => empty
    }

  private def stage(df: DataFrame, st: Map[String, Any],
      tables: TableResolver): DataFrame = {
    require(st.size == 1, s"pipeline stage must have exactly one key: $st")
    val (name, spec) = st.head
    name match {
      case "$match" => df.where(QueryCompiler.compile(doc(spec)))

      case "$project" =>
        val fields = doc(spec)
        val (includes, excludes) = fields.partition { case (_, v) =>
          v != 0 && v != false }
        if (includes.isEmpty) df.drop(excludes.keys.toSeq: _*)
        else {
          val cols = includes.toSeq.map {
            case (as, 1) => col(as).as(as)
            case (as, true) => col(as).as(as)
            case (as, e) => expr2col(e).as(as)
          }
          df.select(cols: _*)
        }

      case "$addFields" | "$set" =>
        doc(spec).foldLeft(df) { case (d, (as, e)) =>
          d.withColumn(as, expr2col(e)) }

      case "$unset" => spec match {
        case s: String => df.drop(s)
        case s: Seq[_] => df.drop(s.map(_.toString): _*)
        case other => throw new IllegalArgumentException(s"$$unset: $other")
      }

      case "$group" =>
        val fields = doc(spec)
        val idSpec = fields.getOrElse("_id",
          throw new IllegalArgumentException("$group requires _id"))
        val aggs = (fields - "_id").toSeq.map { case (as, accDoc) =>
          accumulator(doc(accDoc)).as(as) }
        idSpec match {
          case null => // global aggregation, _id: null
            require(aggs.nonEmpty, "$group {_id: null} needs an accumulator")
            df.agg(aggs.head, aggs.tail: _*)
          case ref: String if ref.startsWith("$") =>
            // _id-only $group is Mongo's distinct idiom — no accumulators
            if (aggs.isEmpty) df.select(col(ref.drop(1)).as("_id")).distinct()
            else df.groupBy(col(ref.drop(1)).as("_id"))
              .agg(aggs.head, aggs.tail: _*)
          case m: Map[_, _] => // compound key {k: "$f", ...} → struct _id
            val keys = m.asInstanceOf[Map[String, Any]].toSeq.map {
              case (k, v) => expr2col(v).as(k) }
            if (aggs.isEmpty)
              df.select(struct(keys: _*).as("_id")).distinct()
            else df.groupBy(struct(keys: _*).as("_id"))
              .agg(aggs.head, aggs.tail: _*)
          case other =>
            throw new IllegalArgumentException(s"$$group _id: $other")
        }

      case "$sort" =>
        val keys: Seq[(String, Any)] = spec match {
          case s: Seq[_] => s.map { case (k: String, v) => (k, v) }
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq
          case other => throw new IllegalArgumentException(s"$$sort: $other")
        }
        df.orderBy(keys.map {
          case (k, 1) => col(k).asc
          case (k, -1) => col(k).desc
          case (k, v) => throw new IllegalArgumentException(s"$$sort $k: $v")
        }: _*)

      case "$limit" => df.limit(int(spec))
      case "$skip"  => df.offset(int(spec))
      case "$count" => df.agg(count(lit(1)).as(spec.toString))

      case "$unwind" =>
        val path = spec match {
          case s: String => s
          case m: Map[_, _] =>
            m.asInstanceOf[Map[String, Any]]("path").toString
          case other => throw new IllegalArgumentException(s"$$unwind: $other")
        }
        require(path.startsWith("$"), s"$$unwind path must start with $$: $path")
        val f = path.drop(1)
        // Mongo $unwind drops rows with empty/null arrays (explode, not
        // explode_outer), matching server semantics.
        df.withColumn(f, explode(col(f)))

      case "$lookup" =>
        val d = doc(spec)
        val from = tables(d("from").toString)
        val local = d("localField").toString
        val foreign = d("foreignField").toString
        val as = d("as").toString
        // left join + re-group preserving all left columns; joined docs
        // collected as an array of structs (Mongo $lookup shape).
        val leftCols = df.columns.toSeq
        val fStruct = struct(from.columns.map(from(_)).toSeq: _*)
        val grouped = from.groupBy(col(foreign).as("__lk"))
          .agg(collect_list(fStruct).as(as))
        df.join(grouped, df(local) === grouped("__lk"), "left_outer")
          .drop("__lk")
          .withColumn(as, coalesce(col(as), array()))

      case "$__lookupUnwind" => // fused $lookup + $unwind = inner join
        val d = doc(spec)
        val from = tables(d("from").toString)
        val foreign = d("foreignField").toString
        val as = d("as").toString
        val fStruct = struct(from.columns.map(from(_)).toSeq: _*)
        val right = from.select(col(foreign).as("__lk"), fStruct.as(as))
        df.join(right, df(d("localField").toString) === right("__lk"), "inner")
          .drop("__lk")

      case "$sortByCount" =>
        val ref = spec.toString
        require(ref.startsWith("$"), s"$$sortByCount: $ref")
        df.groupBy(col(ref.drop(1)).as("_id")).agg(count(lit(1)).as("count"))
          .orderBy(col("count").desc, col("_id").asc)

      case "$replaceRoot" =>
        val ref = doc(spec)("newRoot").toString
        require(ref.startsWith("$"), s"$$replaceRoot: $ref")
        df.select(col(ref.drop(1) + ".*"))

      case "$bucket" =>
        // group rows into explicit boundary buckets: _id = lower bound of
        // the bucket, rows outside the boundaries go to `default`
        val d = doc(spec)
        val groupExpr = expr2col(d("groupBy"))
        val bounds = d("boundaries") match {
          case s: Seq[_] => s.map {
            case n: Number => n.doubleValue()
            case other => throw new IllegalArgumentException(s"$$bucket: $other")
          }
          case other => throw new IllegalArgumentException(s"$$bucket: $other")
        }
        require(bounds.size >= 2, "$bucket needs >= 2 boundaries")
        val defaultId = d.get("default").map(v => lit(
          graft.query.QueryCompiler.toScalaLit(v)))
        // Mongo allows a non-numeric default bucket id; Spark columns are
        // typed, so a string default makes the whole _id column string
        val stringy = d.get("default").exists(_.isInstanceOf[String])
        def idLit(lo: Double): Column =
          if (stringy) lit(lo).cast("string") else lit(lo)
        val bucketCol = bounds.sliding(2).zipWithIndex.foldRight(
          defaultId.getOrElse(lit(null))) { case ((Seq(lo, hi), _), els) =>
          when(groupExpr >= lo && groupExpr < hi, idLit(lo)).otherwise(els)
        }
        val aggs = (d - "groupBy" - "boundaries" - "default").toSeq
          .map { case (as, accDoc) => accumulator(doc(accDoc)).as(as) }
        val withCount =
          if (aggs.isEmpty) Seq(count(lit(1)).as("count")) else aggs
        df.groupBy(bucketCol.as("_id"))
          .agg(withCount.head, withCount.tail: _*)

      case "$sample" =>
        // Mongo $sample is random; here seeded (deterministic) rand so
        // pipelines stay reproducible: order by rand(seed), take size.
        val d = doc(spec)
        val n = int(d.getOrElse("size",
          throw new IllegalArgumentException("$sample requires size")))
        val seed = d.get("seed").map(s => int(s).toLong).getOrElse(42L)
        df.orderBy(rand(seed)).limit(n)

      case "$out" =>
        throw new IllegalArgumentException(
          "$out is a sink; use Backup / DataFrame.write")

      case other =>
        throw new IllegalArgumentException(s"unsupported pipeline stage: $other")
    }
  }

  private def doc(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw new IllegalArgumentException(s"expected document: $other")
  }

  private def int(v: Any): Int = v match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(s"expected int: $other")
  }

  /** Group accumulators: {$sum: expr} etc. */
  private def accumulator(acc: Map[String, Any]): Column = {
    require(acc.size == 1, s"accumulator must have one key: $acc")
    val (op, e) = acc.head
    op match {
      case "$sum" => e match {
        case n: Number if n.doubleValue() == 1.0 => count(lit(1))
        case _ => sum(expr2col(e))
      }
      case "$avg"      => avg(expr2col(e))
      case "$min"      => min(expr2col(e))
      case "$max"      => max(expr2col(e))
      case "$first"    => first(expr2col(e), ignoreNulls = false)
      case "$last"     => last(expr2col(e), ignoreNulls = false)
      case "$push"     => collect_list(expr2col(e))
      case "$addToSet" => array_sort(array_distinct(collect_list(expr2col(e))))
      case "$count"    => count(lit(1))
      case "$stdDevPop"  => stddev_pop(expr2col(e))
      case "$stdDevSamp" => stddev_samp(expr2col(e))
      case other =>
        throw new IllegalArgumentException(s"unsupported accumulator: $other")
    }
  }

  /** Mongo aggregation expression subset → Column: `"$field"` refs,
    * literals, and operator expressions. */
  def expr2col(e: Any): Column = e match {
    case s: String if s.startsWith("$$") => lit(s) // variable refs unsupported
    case s: String if s.startsWith("$") => col(s.drop(1))
    case m: Map[_, _] if m.nonEmpty &&
        !m.asInstanceOf[Map[String, Any]].keys.exists(_.startsWith("$")) =>
      // embedded document literal (no $-operators) builds a subdocument —
      // Mongo's {a: {b: "$f"}} shape → a struct column
      struct(m.asInstanceOf[Map[String, Any]].toSeq.map {
        case (k, v) => expr2col(v).as(k) }: _*)
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      require(mm.size == 1, s"operator expression must have one key: $mm")
      val (op, args) = mm.head
      def seq: Seq[Column] = args match {
        case s: Seq[_] => s.map(expr2col)
        case single    => Seq(expr2col(single))
      }
      op match {
        case "$add"      => seq.reduce(_ + _)
        case "$subtract" => val Seq(a, b) = seq; a - b
        case "$multiply" => seq.reduce(_ * _)
        case "$divide"   => val Seq(a, b) = seq; a / b
        case "$mod"      => val Seq(a, b) = seq; a % b
        case "$abs"      => abs(seq.head)
        case "$ceil"     => ceil(seq.head)
        case "$floor"    => floor(seq.head)
        case "$round"    => args match {
          case s: Seq[_] => round(expr2col(s.head),
            s(1).asInstanceOf[Number].intValue())
          case single => round(expr2col(single))
        }
        case "$concat"   => concat(seq: _*)
        case "$toLower"  => lower(seq.head)
        case "$toUpper"  => upper(seq.head)
        case "$strLenCP" => length(seq.head)
        case "$substrCP" => // Mongo is 0-indexed, Spark substr 1-indexed
          val Seq(s, i, n) = seq; s.substr(i + lit(1), n)
        case "$split" => args match { // delimiter is a literal string
          case Seq(sE, d: String) =>
            split(expr2col(sE), java.util.regex.Pattern.quote(d))
          case other => throw new IllegalArgumentException(s"$$split: $other")
        }
        case "$year"       => year(seq.head)
        case "$month"      => month(seq.head)
        case "$dayOfMonth" => dayofmonth(seq.head)
        case "$hour"       => hour(seq.head)
        case "$dateTrunc" =>
          val mm = doc(args)
          date_trunc(mm("unit").toString, expr2col(mm("date")))
        case "$dateToString" =>
          val mm = doc(args)
          // Mongo %Y-%m-%d style -> java pattern
          val fmt = mm.getOrElse("format", "%Y-%m-%d").toString
            .replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
            .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
          date_format(expr2col(mm("date")), fmt)
        case "$switch" =>
          val mm = doc(args)
          val branches = mm("branches") match {
            case s: Seq[_] => s.map(b => doc(b))
            case other => throw new IllegalArgumentException(s"$$switch: $other")
          }
          val default = mm.get("default").map(expr2col)
            .getOrElse(lit(null))
          branches.foldRight(default) { (b, els) =>
            when(expr2col(b("case")), expr2col(b("then"))).otherwise(els)
          }
        case "$toString" => seq.head.cast("string")
        case "$toInt"    => seq.head.cast("int")
        case "$toLong"   => seq.head.cast("long")
        case "$toDouble" => seq.head.cast("double")
        case "$trim" => args match {
          case m2: Map[_, _] => trim(expr2col(doc(m2)("input")))
          case _ => trim(seq.head)
        }
        case "$cond" => args match {
          case s: Seq[_] => val Seq(i, t, f) = s.map(expr2col)
            when(i, t).otherwise(f)
          case m2: Map[_, _] =>
            val mm2 = m2.asInstanceOf[Map[String, Any]]
            when(expr2col(mm2("if")), expr2col(mm2("then")))
              .otherwise(expr2col(mm2("else")))
          case other => throw new IllegalArgumentException(s"$$cond: $other")
        }
        case "$ifNull"   => coalesce(seq: _*)
        case "$literal"  => lit(QueryCompiler.toScalaLit(args))
        case "$eq"  => val Seq(a, b) = seq; a === b
        case "$ne"  => val Seq(a, b) = seq; a =!= b
        case "$gt"  => val Seq(a, b) = seq; a > b
        case "$gte" => val Seq(a, b) = seq; a >= b
        case "$lt"  => val Seq(a, b) = seq; a < b
        case "$lte" => val Seq(a, b) = seq; a <= b
        case "$and" => seq.reduce(_ && _)
        case "$or"  => seq.reduce(_ || _)
        case "$not" => !seq.head
        case "$size" => size(seq.head)
        case "$arrayElemAt" => val Seq(a, i) = seq; element_at(a, i + lit(1))
        case other =>
          throw new IllegalArgumentException(s"unsupported expression: $other")
      }
    case other => lit(QueryCompiler.toScalaLit(other))
  }
}
