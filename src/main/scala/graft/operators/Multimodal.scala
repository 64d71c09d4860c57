package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video travel as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extraction
  * runs per-partition in batches.
  *
  * The Spark-side plumbing here — schema, batch shape, partition sizing —
  * is real and tested; the actual media decode is STUBBED (no image/audio
  * libraries in this environment) behind [[MediaDecoder]], which a
  * deployment replaces with a JNI/FFmpeg/ImageIO-backed implementation.
  *
  * Scale notes:
  *  - binary payloads dominate row size → cap
  *    `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  *    executor memory, and NEVER collect this column.
  *  - metadata-only transforms (filter by width, group by format) must not
  *    deserialize the blob: keep meta in its own struct column so column
  *    pruning drops the binary at the scan.
  *  - decode is a narrow mapPartitions: no shuffle; batching amortizes
  *    per-call model/codec setup exactly like a pandas-UDF batch would.
  */
object Multimodal {

  /** One media row: the blob + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      feature: Array[Float])

  /** The pluggable decode step. Implementations MUST be deterministic per
    * blob (retries re-decode).
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** STUB decoder: deterministic fake features derived from the blob bytes
    * (first 8 bytes folded into a 4-dim "embedding"). Replace with a real
    * codec in deployment; everything around it — schema, batching,
    * partitioning — is the production shape.
    */
  object StubDecoder extends MediaDecoder {
    override def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val seed = r.media.take(8).foldLeft(1469598103934665603L)((h, b) =>
          (h ^ (b & 0xFF)) * 1099511628211L)
        val feats = Array.tabulate(4)(i =>
          (((seed >>> (i * 16)) & 0xFFFF).toFloat / 65535.0f))
        MediaFeatures(r.media_id, r.format, r.n_bytes, feats)
      }
  }

  /** Attach a binary "media" payload to a text table — the ingest shape for
    * a corpus whose blobs arrive inline (e.g. WARC/base64 payloads). In
    * production the blob column comes straight from the source; this
    * adapter exists so the pipeline is exercisable on the text fixtures.
    */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      to_binary(col(payloadCol), lit("utf-8")).as("media"),
      lit("text/plain").as("format"),
      lit(0).as("width"),
      lit(0).as("height"),
      // octet_length of the string is already its UTF-8 byte length — no
      // second to_binary conversion.
      octet_length(col(payloadCol)).cast(LongType).as("n_bytes"))

  /** Decode/feature-extract over partition batches (narrow, no shuffle). */
  def extractFeatures(media: Dataset[MediaRow], decoder: MediaDecoder)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(decoder.decodeBatch _)
  }

  /** Metadata-only projection — must prune the blob column at the scan
    * (verify with .explain: ReadSchema excludes `media`).
    */
  def mediaMetadata(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("format"), col("width"), col("height"), col("n_bytes"))

  // ------------------------------------------------------------ transforms

  /** Pluggable blob→blob media transform (resize, transcode, crop...).
    * Same batch shape as decode: per-partition, deterministic, narrow.
    */
  trait MediaTransform extends Serializable {
    def transformBatch(rows: Iterator[MediaRow]): Iterator[MediaRow]
  }

  /** STUB resize: production swaps in an image codec; here the byte payload
    * is deterministically truncated in proportion to the area change and
    * the metadata is updated — the plumbing (metadata consistency, batch
    * shape, narrow execution) is the real contract.
    */
  final case class StubResize(targetW: Int, targetH: Int) extends MediaTransform {
    override def transformBatch(rows: Iterator[MediaRow]): Iterator[MediaRow] =
      rows.map { r =>
        val srcArea = math.max(1L, r.width.toLong * r.height.toLong)
        val frac = math.min(1.0, (targetW.toLong * targetH).toDouble / srcArea)
        val resized = r.media.take(math.max(1, (r.media.length * frac).toInt))
        // n_bytes from the ACTUAL payload (an empty blob stays 0 bytes) —
        // metadata must never disagree with the blob.
        r.copy(media = resized, width = targetW, height = targetH,
          n_bytes = resized.length.toLong)
      }
  }

  def transformMedia(media: Dataset[MediaRow], t: MediaTransform)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(t.transformBatch _)
  }

  /** Frame sampling for video-shaped payloads: emit every `stride`-th
    * fixed-size chunk of the blob as its own frame row (one-to-many,
    * flatMap — still narrow). STUB chunking stands in for a container
    * demuxer; the (media_id, frame_idx) output grain is the real contract.
    */
  final case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
      (implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    media.flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => FrameRow(r.media_id, i, chunk) }
    }
  }
}
