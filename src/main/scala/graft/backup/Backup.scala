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

  /** Export to `target` (parquet dir) + `<target>.meta.json` sidecar. */
  def collection(spark: SparkSession, df: DataFrame, target: String,
      opts: BackupOptions = BackupOptions()): Long = {
    val frame = exportFrame(df, opts)
    val n =
      if (opts.metadataOnly) frame.count()
      else { frame.write.mode("overwrite").parquet(target);
             spark.read.parquet(target).count() }
    val meta = s"""{"rows": $n, "schema": ${frame.schema.json}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target + ".meta.json"), meta)
    n
  }
}
