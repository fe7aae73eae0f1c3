package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Parquet source loader with nanosecond-timestamp normalization.
  *
  * Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet columns outright
  * (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong` is
  * set, and then exposes them as raw nanosecond longs. This loader inspects
  * the parquet footer, finds nanos-timestamp columns, and converts them to
  * proper `TimestampType` at microsecond precision (floor division — the
  * same truncation DuckDB applies when it reads ns parquet), so the rest of
  * the engine sees ordinary timestamps.
  *
  * At 100 TB scale this is a metadata-only operation: one footer read on the
  * driver plus a codegen'd `timestamp_micros(c div 1000)` projection that
  * fuses into the scan stage (no extra shuffle or pass).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, s"$dir/$name.parquet")

  def load(spark: SparkSession, path: String): DataFrame = {
    // runtime-settable legacy conf; required before the scan is planned
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nanosCols = nanosTimestampColumns(spark, path)
    val df = spark.read.parquet(path)
    nanosCols.foldLeft(df) { (d, c) =>
      // integer `div`, not `/`: a double roundtrip would lose precision on
      // ~1.7e18 nanosecond values (53-bit mantissa)
      d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000L")))
    }
  }

  /** Cheap approximate row count from parquet footer metadata (no data
    * scan) — the EstimatedDocumentCount analog
    * (/root/reference/backup/backup.go:91): exact for static files, costs
    * one footer read per file. */
  def estimatedRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val files: Seq[Path] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).toSeq
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      else Seq(p)
    // footer reads parallelize on the driver's fork-join pool: one table at
    // 100 TB is ~10⁵ files, and each read is an independent small IO —
    // sequential would serialize ~10⁵ round-trips
    val par = new scala.collection.parallel.immutable.ParVector(files.toVector)
    par.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally r.close()
    }.sum
  }

  /** Top-level INT64 TIMESTAMP(NANOS) columns, from the first footer. */
  private def nanosTimestampColumns(spark: SparkSession, path: String)
      : Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val file: Path =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .getOrElse(return Nil)
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
        case f if f.isPrimitive &&
            (f.getLogicalTypeAnnotation match {
              case t: TimestampLogicalTypeAnnotation =>
                t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
              case _ => false
            }) => f.getName
      }.toSeq
    } finally reader.close()
  }
}
