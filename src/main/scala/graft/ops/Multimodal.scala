package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per partition in batches.
  *
  * The Spark-side machinery here is real and tested — schema, partitioning,
  * batch shape, deterministic outputs. The actual codec work (JPEG decode,
  * resampling, frame extraction) is STUBBED with deterministic fakes
  * (`DecodeStub`): this container has no image/audio libraries, so the stub
  * derives pixel/sample features from a stable hash of the bytes. Swapping
  * in a real decoder is a drop-in replacement of `DecodeStub` — the
  * dataflow (mapPartitions over batches, Iterator-in/Iterator-out, no
  * driver collection) is exactly what a JNI/FFI decoder needs at 100 TB.
  */
object Multimodal {

  /** Typed metadata struct carried beside the opaque payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", MediaMetaType)))

  /** Wrap a (id, string payload) frame into the media schema — payload
    * bytes become the opaque binary column; metadata is synthesized
    * deterministically. Stands in for a real binary-file source. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(payloadCol)) % 640).cast("int").as("width"),
        (length(col(payloadCol)) % 480).cast("int").as("height"),
        (length(col(payloadCol)) % 16 + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** STUB decoder: a real implementation would parse `content` with an
    * image/audio codec. The fake derives `dim` feature doubles from a
    * stable byte hash — deterministic, so the plumbing is testable
    * end-to-end. */
  object DecodeStub extends Serializable {
    def features(content: Array[Byte], dim: Int): Array[Double] = {
      // ??? <- real codec goes here; deterministic fake below
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(if (content == null) Array.emptyByteArray else content)
      Array.tabulate(dim) { i =>
        val b = java.util.Arrays.copyOfRange(md, (i * 4) % 12, (i * 4) % 12 + 4)
        (java.nio.ByteBuffer.wrap(b).getInt.toLong & 0xffffffffL).toDouble /
          4294967295.0
      }
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** Feature extraction: batched per-partition decode — the Scala analog
    * of a Pandas-UDF `mapInPandas` stage. Iterator-in/iterator-out, so
    * Spark streams batches through without materializing a partition. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      rows.grouped(64).flatMap { batch => // batch shape: 64 rows per call
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, DecodeStub.features(bytes, dim).toSeq)
        }
      }
    }(enc)
  }

  /** Deterministic frame sampling plan: choose `n` frame indices evenly
    * from meta.n_frames (the decode of those frames is the stubbed part).
    * Pure Column math — runs at the scan. */
  def sampleFrameIndices(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"), col("meta.n_frames").as("n_frames"))
      .withColumn("frame_idx",
        when(col("n_frames") >= n,
          transform(sequence(lit(0), lit(n - 1)),
            i => (i * col("n_frames") / n).cast("int")))
          .otherwise(sequence(lit(0), col("n_frames") - 1).cast("array<int>")))

  /** "Resize" stub: recompute metadata for a target box, preserving aspect
    * ratio via integer math; the pixel work is the stubbed decode. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("resized_meta",
      struct(
        col("meta.format").as("format"),
        least(col("meta.width"), lit(maxW)).as("width"),
        least(col("meta.height"), lit(maxH)).as("height"),
        col("meta.n_frames").as("n_frames")))
}
