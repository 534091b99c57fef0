package graft.ml

import graft.util.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed in batched
  * `mapPartitions` passes (the Scala analogue of `mapInPandas` batch UDFs —
  * one vectorizable batch loop per partition, heavyweight decoder state
  * initialized once per partition, not per row).
  *
  * The actual codec work is STUBBED — no image/audio libraries exist in
  * this container — behind [[StubCodec]], a deterministic fake that derives
  * "decoded" features from the payload bytes. The Spark-side contract
  * (schema, batching, partitioning, per-partition init) is real and tested;
  * swapping StubCodec for a JNI/FFM decoder changes no plumbing.
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
      feature: Seq[Float], // STUB: deterministic fake embedding
      frames_sampled: Int)

  /** STUB decoder: deterministic fake features from payload bytes. A real
    * deployment replaces `decodeBatch` with the codec call; signature and
    * batch shape stay identical.
    */
  object StubCodec {
    val FeatureDim = 8

    /** Batched decode — one call per batch of rows, mirroring a vectorized
      * (Arrow-batch) UDF's shape.
      */
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val h0 = Hashing.murmur3_64(r.bytes, 0xfeedL)
      val feature = (0 until FeatureDim).map(i => (Hashing.fmix64(h0 + i) % 1000L) / 1000.0f)
      val frames = r.kind match {
        case "video" => math.max(1, (r.duration_ms / 1000L).toInt) // 1 fps sample
        case _ => 1
      }
      MediaFeatures(r.media_id, r.doc_id, r.kind, r.bytes.length, feature, frames)
    }
  }

  /** Deterministic synthetic media table derived from a documents table
    * (payload bytes = hash-expanded from the doc text): lets the plumbing
    * run against driver testdata without external files.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)].map { case (id, text) =>
      val h = Hashing.murmur3_64(text, 0x3edL)
      val kind = Seq("image", "audio", "video")(Hashing.bounded(h, 3))
      val n = 64 + Hashing.bounded(Hashing.fmix64(h), 192)
      val bytes = Array.tabulate[Byte](n)(i => (Hashing.fmix64(h + i) & 0xff).toByte)
      MediaRow(id, id, kind, bytes,
        640 + Hashing.bounded(h >> 7, 1280), 400 + Hashing.bounded(h >> 11, 800),
        1000L * (1 + Hashing.bounded(h >> 13, 30)))
    }
  }

  /** The batched decode pass: partition-local batches of `batchSize`,
    * decoder "initialized" once per partition. This is the shape that keeps
    * GPU/native decoders fed at scale.
    */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.grouped(batchSize).flatMap(batch => StubCodec.decodeBatch(batch))
    }
  }

  /** Video frame sampling: one row per sampled frame index — an explode on
    * the decode result, no extra shuffle.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().filter(col("kind") === "video")
      .select(col("media_id"), col("doc_id"),
        explode(sequence(lit(0), col("frames_sampled") - 1)).as("frame_idx"))
}
