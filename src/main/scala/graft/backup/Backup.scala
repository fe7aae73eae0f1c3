package graft.backup

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.db.GraftQuery
import graft.query.QueryCompiler

/** Collection export — reference /root/reference/backup/backup.go:39-200:
  * stream every matching document to an archive plus an index/metadata
  * sidecar. Spark-first shape: `read → where → sort → limit →
  * write.parquet` (distributed, no driver streaming loop) plus a JSON
  * sidecar carrying schema + row count (the index-metadata analog,
  * backup.go:176-200).
  */
final case class BackupOptions(
    query: Map[String, Any] = Map.empty,
    sortKeys: Seq[String] = Nil,
    limit: Int = 0,
    metadataOnly: Boolean = false) // IndexesOnly analog (backup.go:47)

object Backup {

  /** Build the export frame (also usable standalone for verification). */
  def exportFrame(df: DataFrame, opts: BackupOptions): DataFrame = {
    var d = df.where(QueryCompiler.compile(opts.query))
    if (opts.sortKeys.nonEmpty) d = d.orderBy(GraftQuery.parseSort(opts.sortKeys): _*)
    if (opts.limit > 0) d = d.limit(opts.limit)
    d
  }

  /** Export to `target` (parquet dir) + `<target>.meta.json` sidecar.
    *
    * Sidecar shape mirrors the reference's index-metadata document
    * (backup.go:176-200 writes `{options, indexes, uuid}` per collection):
    * `indexes` carries the export's sort keys as mongo-style index docs
    * (the reference's `getIndexData`, backup.go:152-174), and the Spark
    * analog of index statistics — per-column min/max/null_count gathered in
    * ONE aggregate over the exported frame (the same stats parquet keeps
    * per row-group; an engine restoring this backup can use them for
    * pruning without reading footers). */
  def collection(spark: SparkSession, df: DataFrame, target: String,
      opts: BackupOptions = BackupOptions()): Long = {
    val frame = exportFrame(df, opts)
    val n =
      if (opts.metadataOnly) frame.count()
      else { frame.write.mode("overwrite").parquet(target);
             spark.read.parquet(target).count() }
    val meta = s"""{"rows": $n, "schema": ${frame.schema.json},
      | "options": {}, "uuid": "",
      | "indexes": ${indexJson(opts)},
      | "columns": ${columnStatsJson(frame)}}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target + ".meta.json"), meta)
    n
  }

  /** Export to JSON-Lines (+ the same metadata sidecar) — the interchange
    * format of training-data pipelines (one JSON document per line,
    * splittable, tool-agnostic). Same distributed write path as the
    * parquet export — each partition streams its lines, no driver
    * collection; `compression` (e.g. "gzip") trades CPU for bytes on the
    * wire. The sidecar keeps schema + count + per-column stats, so a
    * consumer can validate a transfer without parsing every line. */
  def collectionJsonl(spark: SparkSession, df: DataFrame, target: String,
      opts: BackupOptions = BackupOptions(),
      compression: Option[String] = None): Long = {
    val frame = exportFrame(df, opts)
    val n =
      if (opts.metadataOnly) frame.count()
      else {
        val w = frame.write.mode("overwrite")
        compression.foreach(c => w.option("compression", c))
        w.json(target)
        spark.read.schema(frame.schema).json(target).count()
      }
    val meta = s"""{"rows": $n, "schema": ${frame.schema.json},
      | "options": {"format": "jsonl"}, "uuid": "",
      | "indexes": ${indexJson(opts)},
      | "columns": ${columnStatsJson(frame)}}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target + ".meta.json"), meta)
    n
  }

  /** Mongo-style index documents for the export's sort keys: `_id_`-style
    * default plus one entry per sort key with its direction. */
  private[backup] def indexJson(opts: BackupOptions): String = {
    val docs = opts.sortKeys.map { k =>
      val (name, dir) =
        if (k.startsWith("-")) (k.drop(1), -1) else (k.stripPrefix("+"), 1)
      s"""{"name": "${name}_$dir", "key": {"$name": $dir}}"""
    }
    docs.mkString("[", ", ", "]")
  }

  /** Per-column min/max/null_count over the exported frame, computed in a
    * single map-side-combining aggregate (one pass, no per-column jobs).
    * Complex-typed columns report null_count only. */
  private[backup] def columnStatsJson(frame: DataFrame): String = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val fields = frame.schema.fields
    val atomic = fields.filter(f => f.dataType match {
      case _: NumericType | StringType | DateType | TimestampType |
           BooleanType => true
      case _ => false
    }).map(_.name).toSet
    val aggs = fields.flatMap { f =>
      val nulls = sum(when(col(f.name).isNull, 1L).otherwise(0L))
        .as(s"${f.name}__nulls")
      if (atomic(f.name))
        Seq(nulls, min(col(f.name)).cast("string").as(s"${f.name}__min"),
          max(col(f.name)).cast("string").as(s"${f.name}__max"))
      else Seq(nulls)
    }
    val row = frame.agg(aggs.head, aggs.tail: _*).collect().head
    def js(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
      case other => other.toString
    }
    fields.map { f =>
      val base = s""""null_count": ${row.getAs[Any](s"${f.name}__nulls")}"""
      val stats = if (atomic(f.name))
        base + s""", "min": ${js(row.getAs[Any](s"${f.name}__min"))},""" +
          s""" "max": ${js(row.getAs[Any](s"${f.name}__max"))}"""
      else base
      s"""{"name": "${f.name}", $stats}"""
    }.mkString("[", ", ", "]")
  }
}
