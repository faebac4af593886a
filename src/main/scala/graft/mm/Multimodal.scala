package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline extensions.
  *
  * Image/audio/video travel as opaque `binary` columns plus a typed
  * metadata struct; decode / feature-extract / frame-sample are the
  * operators a real pipeline runs over them. This container ships no
  * codec libraries, so the decode step is a clearly-marked deterministic
  * fake — the Spark-side contract (schema, batch shape, partitioning,
  * per-partition init) is the real thing and is what gets tested.
  *
  * At 100 TB the binary payloads dominate row size: keep them out of
  * shuffles (extract features first, join features not media), and size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs still
  * fits executor memory.
  */
object Multimodal {

  /** Wrap a text table as a media table: opaque bytes + typed metadata.
    * (A real pipeline reads the bytes from object storage; deriving them
    * from the `text` column keeps the plumbing identical and testable.) */
  def asMedia(docs: DataFrame): DataFrame = {
    val media = col("text").cast("binary")
    docs.select(col("doc_id"), media.as("media"),
      struct(
        length(media).as("n_bytes"),
        lit("text/plain").as("mime"),
        col("source").as("origin")).as("meta"))
  }

  /** Fixed-stride byte windows over the payload — the frame-sampling
    * shape for video (stride = seconds between keyframes) expressed as a
    * pure codegen'd expression; empty when the payload is shorter than
    * one frame. */
  def frameSample(media: Column, frameLen: Int, stride: Int): Column =
    when(length(media) >= frameLen,
      transform(sequence(lit(0), floor((length(media) - frameLen) / stride).cast("int")),
        i => media.substr(i * stride + 1, lit(frameLen))))
      .otherwise(array().cast("array<binary>"))

  /** Byte-domain decimation "resize" — the thumbnail operator (every
    * stride-th byte of the payload, at most `target` of them, emitted
    * as a lowercase hex string) expressed as a pure codegen'd
    * expression: stride = max(1, ⌊n/target⌋), so any payload collapses
    * to ≤ target bytes. A real image resize happens inside the codec
    * ([[decodeFeatures]]'s per-partition shape); this is the
    * payload-side decimation a pipeline uses for cheap dedup keys and
    * previews without decoding — and it keeps blobs OUT of shuffles
    * (ship the ≤ target-byte thumb, not the media). */
  def resizeHex(media: Column, target: Int = 16): Column = {
    val n = length(media)
    val stride = greatest(lit(1), floor(n / lit(target)).cast("int"))
    val lastIdx = least(lit(target - 1), floor((n - lit(1)) / stride).cast("int"))
    when(n > 0,
      array_join(
        transform(sequence(lit(0), lastIdx),
          i => lower(hex(media.substr(i * stride + 1, lit(1))))), ""))
      .otherwise(lit(""))
  }

  /** One extracted feature row per media item. `feat` is the stub
    * "embedding" (see [[decodeFeatures]]). */
  case class MediaFeature(doc_id: Long, n_bytes: Int, n_frames: Int, feat: Array[Double])

  /** Imperative per-partition decode — the shape a codec integration
    * takes (library handle initialized once per partition, rows decoded
    * in a batch loop). STUB: the real `decode(bytes)` would call an
    * image/audio library; here it is a deterministic fake (mean/min/max
    * byte statistics per frame) so the distributed plumbing is testable
    * without codecs. */
  def decodeFeatures(media: DataFrame, frameLen: Int = 64, stride: Int = 48): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real integration: val codec = Codec.open() — once per partition
        rows.map { case (id, bytes) =>
          val frames = fakeDecode(bytes, frameLen, stride)
          MediaFeature(id, bytes.length, frames.length, frames.flatten)
        }
      }
  }

  /** STUB decode: per frame emit (mean, min, max) of the byte values —
    * stands in for a codec's pixel/sample decode. Deterministic. */
  private[mm] def fakeDecode(bytes: Array[Byte], frameLen: Int, stride: Int): Array[Array[Double]] = {
    if (bytes.length < frameLen) return Array.empty
    (0 to (bytes.length - frameLen) / stride).toArray.map { i =>
      val f = bytes.slice(i * stride, i * stride + frameLen).map(_ & 0xff)
      Array(f.sum.toDouble / f.length, f.min.toDouble, f.max.toDouble)
    }
  }
}
