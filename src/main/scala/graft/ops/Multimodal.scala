package graft.ops

import graft.core.Xxh64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata, exactly like the reference's
  * media payloads (pdf bytes, models.py:140; MediaItem metadata,
  * models.py:331-340).
  *
  * The DECODE KERNELS ARE STUBS — this container has no image/audio codecs,
  * so `decodeStub` synthesizes deterministic pixel/sample features from the
  * byte content (clearly marked below). Everything around the kernel is the
  * real Spark shape and is tested: the schema, the per-partition batched
  * map (`mapPartitions` — the JVM analogue of `mapInPandas` batch plumbing),
  * the salted repartition for decode-cost skew, and the feature schema that
  * downstream operators (dedup, ANN) consume.
  */
object Multimodal {

  /** A media blob row: content-addressed binary + provenance. */
  final case class MediaBlob(
      doc_id: String,
      media_ref: String,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      content_hash: Long)

  /** Decoded-media features (what a real codec would produce). */
  final case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      kind: String,
      content_hash: Long,
      width: Int,
      height: Int,
      duration_ms: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Deterministic fake blob for a media_ref (test/bench corpus: the bytes
    * are a hash chain over the ref, so content-hash dedup is exercisable).
    */
  def syntheticBlob(docId: String, ref: String, kind: String): MediaBlob = {
    val n = 64 + (Xxh64.hashString(ref) & 0xff).toInt
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      bytes(i) = (Xxh64.hashLong(Xxh64.hashString(ref), i.toLong) & 0xff).toByte
      i += 1
    }
    MediaBlob(docId, ref, kind, bytes, Xxh64.hashBytes(bytes, 42L))
  }

  /** ===== STUB KERNEL =====
    * A real implementation decodes `bytes` with an image/audio codec. This
    * container ships none, so features are derived deterministically from
    * the byte content — the Spark-side contract (shape, determinism, cost
    * model) is identical.
    */
  def decodeStub(b: MediaBlob): MediaFeatures = {
    val h = b.content_hash
    val width = 16 + (math.abs(h) % 2048).toInt
    val height = 16 + (math.abs(h >> 11) % 2048).toInt
    val durationMs = if (b.kind == "image") 0 else 1000 + (math.abs(h >> 22) % 600000).toInt
    val nFrames = if (b.kind == "video") durationMs / 40 else if (b.kind == "image") 1 else 0
    val feature = new Array[Float](16)
    var i = 0
    while (i < 16) {
      feature(i) = ((Xxh64.hashLong(h, i.toLong) % 1000L) / 1000.0f)
      i += 1
    }
    MediaFeatures(b.doc_id, b.media_ref, b.kind, b.content_hash,
      width, height, durationMs, nFrames, feature)
  }

  /** Decode a blob Dataset to features with per-partition batching (the
    * `mapInPandas`-shaped plumbing: one kernel init per partition, rows
    * streamed through it). Salt-repartition first so a few huge videos
    * cannot skew one task.
    */
  def decode(blobs: Dataset[MediaBlob], saltBuckets: Int = 16): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs
      .repartition(blobs.sparkSession.sessionState.conf.numShufflePartitions,
        pmod(col("content_hash"), lit(saltBuckets)))
      .mapPartitions { it =>
        // kernel init happens once per partition here (a real codec would
        // allocate decoder state); rows then stream through
        it.map(decodeStub)
      }
  }

  /** Frame sampling plan for videos: every `everyMs` ms, as (blob, frame_no,
    * ts_ms) rows — the explode happens on metadata only; real frame bytes
    * would be produced by the kernel at extraction time.
    */
  def sampleFrames(features: DataFrame, everyMs: Int = 1000): DataFrame =
    features.where(col("kind") === "video")
      .select(col("doc_id"), col("media_ref"), col("content_hash"),
        explode(sequence(lit(0), (col("duration_ms") / everyMs).cast("int")))
          .as("frame_no"))
      .withColumn("ts_ms", col("frame_no") * everyMs)

  /** Resize plan: clamp longest side to `maxSide` preserving aspect ratio —
    * pure column arithmetic over the metadata (the kernel would apply it).
    */
  def resizePlan(features: DataFrame, maxSide: Int = 512): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("scale", scale)
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
  }

  /** Exact media dedup by content hash (the blob never shuffles — only the
    * 64-bit hash + ids move).
    */
  def dedupByContent(blobs: DataFrame): DataFrame =
    blobs.groupBy(col("content_hash"))
      .agg(min(col("media_ref")).as("canonical_ref"), count(lit(1)).as("n_copies"))
}
