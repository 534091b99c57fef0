package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed in batched
  * `mapPartitions` passes (the Scala analogue of `mapInPandas` batch UDFs —
  * one vectorizable batch loop per partition, heavyweight decoder state
  * initialized once per partition, not per row).
  *
  * The decode path is REAL: payloads are actual BMP (image), PCM16 WAV
  * (audio) and GRFV frame-container (video) bytes, and [[decodeFeatures]]
  * parses headers + pixel/sample data via [[MediaCodec]] — dimensions,
  * durations and content digests come from the BYTES, never from row
  * metadata. No image/audio libraries exist in this offline container, so
  * the formats are the header-simple classics; a JPEG/MP4 codec slots into
  * the same decodeBatch signature without touching the Spark plumbing.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the input_hint treatment of
    * media — `binary` column, never decoded strings).
    */
  final case class MediaRow(
      media_id: Long,
      doc_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int, // decoded from payload header
      height: Int,
      duration_ms: Long, // decoded: samples/rate (audio), 1 fps × frames (video)
      content_sum: Long, // decoded pixel/sample digest
      frames_sampled: Int)

  val AudioSampleRate = 8000

  /** Deterministic synthetic media table derived from a documents table —
    * REAL payload bytes (BMP/WAV/GRFV), parameterized by plain doc_id
    * arithmetic so a SQL oracle can recompute every decoded value:
    *   kind       = doc_id % 3 → image | audio | video
    *   image      : w = 2 + doc_id%7, h = 2 + doc_id%5,
    *                pixel byte i = (doc_id*31 + i) % 256
    *   audio      : n = 16 + doc_id%50 samples,
    *                sample i = (doc_id*131 + i*17) % 65536 − 32768
    *   video      : frames = 1 + doc_id%5 of the image BMP with per-frame
    *                pixel byte i = (doc_id*31 + f*7 + i) % 256
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (2 + id % 7).toInt
      val h = (2 + id % 5).toInt
      (id % 3) match {
        case 0 =>
          val bytes = MediaCodec.encodeBmp(w, h, i => ((id * 31 + i) % 256).toInt)
          MediaRow(id, id, "image", bytes, w, h, 0L)
        case 1 =>
          val n = (16 + id % 50).toInt
          val bytes = MediaCodec.encodeWav(AudioSampleRate, n,
            i => (((id * 131 + i.toLong * 17) % 65536) - 32768).toInt)
          MediaRow(id, id, "audio", bytes, 0, 0, n.toLong * 1000 / AudioSampleRate)
        case _ =>
          val frames = (1 + id % 5).toInt
          val payload = MediaCodec.encodeVideo((0 until frames).map(f =>
            MediaCodec.encodeBmp(w, h, i => ((id * 31 + f * 7 + i) % 256).toInt)))
          MediaRow(id, id, "video", payload, w, h, frames * 1000L)
      }
    }
  }

  /** The batched decode pass: partition-local batches of `batchSize`,
    * decoder state initialized once per partition. This is the shape that
    * keeps GPU/native decoders fed at scale. `frameStep` samples every
    * k-th video frame (skipped frames are seeked over, not decoded).
    */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64,
                     frameStep: Int = 1): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.grouped(batchSize).flatMap(b => decodeBatch(b, frameStep))
    }
  }

  /** One batch through the decoder — the seam a vectorized/native codec
    * replaces (per-row loop today; the batch boundary is the contract).
    */
  private def decodeBatch(rows: Seq[MediaRow], frameStep: Int): Seq[MediaFeatures] =
    rows.map(decodeOne(_, frameStep))

  private def decodeOne(r: MediaRow, frameStep: Int): MediaFeatures = r.kind match {
    case "image" =>
      val d = MediaCodec.decodeBmp(r.bytes)
      MediaFeatures(r.media_id, r.doc_id, r.kind, r.bytes.length,
        d.width, d.height, 0L, d.pixelSum, 1)
    case "audio" =>
      val d = MediaCodec.decodeWav(r.bytes)
      MediaFeatures(r.media_id, r.doc_id, r.kind, r.bytes.length,
        0, 0, d.nSamples.toLong * 1000 / d.sampleRate, d.sampleSum, 1)
    case _ =>
      val d = MediaCodec.decodeVideo(r.bytes, frameStep)
      // duration comes from the CONTAINER's total frame count (1 fps), not
      // from how many frames this pass sampled
      MediaFeatures(r.media_id, r.doc_id, r.kind, r.bytes.length,
        d.width, d.height, d.totalFrames * 1000L, d.pixelSum, d.frames)
  }

  /** Video frame sampling: one row per sampled frame index — an explode on
    * the decode result, no extra shuffle.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().filter(col("kind") === "video")
      .select(col("media_id"), col("doc_id"),
        explode(sequence(lit(0), col("frames_sampled") - 1)).as("frame_idx"))
}
