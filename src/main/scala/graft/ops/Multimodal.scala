package graft.ops

import graft.core.Xxh64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata, exactly like the reference's
  * media payloads (pdf bytes, models.py:140; MediaItem metadata,
  * models.py:331-340).
  *
  * Decode is REAL for images (PNG/JPEG/BMP/GIF via the JDK's javax.imageio,
  * headless) and WAV audio (javax.sound.sampled): true dimensions/duration
  * plus content-based features (4×4 grayscale pool / 16-bin RMS profile).
  * VIDEO remains a deterministic stub — the JDK ships no video codec and
  * this container has no external ones; corrupt/unknown payloads also fall
  * back to the stub rather than failing the pipeline. The Spark shape is
  * identical either way: per-partition batched map (`mapPartitions` — the
  * JVM analogue of `mapInPandas` batch plumbing), salted repartition for
  * decode-cost skew, one feature schema downstream (dedup, ANN).
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

  /** Deterministic REAL PNG blob: pixel (x,y) is a pure function of the ref
    * hash — same ref, same bytes, decodable by any PNG codec. */
  def syntheticPngBlob(docId: String, ref: String, w: Int, h: Int): MediaBlob = {
    val seed = Xxh64.hashString(ref)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = Xxh64.hashLong(seed, (y.toLong << 20) | x.toLong)
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    MediaBlob(docId, ref, "image", bytes, Xxh64.hashBytes(bytes, 42L))
  }

  /** Deterministic REAL WAV blob: a sine of ref-derived frequency. */
  def syntheticWavBlob(docId: String, ref: String, ms: Int,
                       rate: Int = 8000): MediaBlob = {
    val freq = 200 + (math.abs(Xxh64.hashString(ref)) % 600).toInt
    val n = rate * ms / 1000
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val bytes = bos.toByteArray
    MediaBlob(docId, ref, "audio", bytes, Xxh64.hashBytes(bytes, 42L))
  }

  /** ===== STUB KERNEL (video + fallback) =====
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

  // ===== REAL KERNELS (JDK codecs — no external dependency) =================
  // javax.imageio decodes PNG/JPEG/BMP/GIF and javax.sound.sampled decodes
  // WAV entirely inside the headless JDK. Video stays stubbed (the JDK ships
  // no video codec); unknown/corrupt payloads fall back to the deterministic
  // stub so the pipeline never fails on a bad blob.

  locally { System.setProperty("java.awt.headless", "true") }

  /** 16-dim image descriptor: 4×4 average-pooled grayscale thumbnail in
    * [0, 1] — content-based, so embedding near-dup works on real images. */
  private def grayThumb(img: java.awt.image.BufferedImage, side: Int): Array[Float] = {
    val f = new Array[Float](side * side)
    val counts = new Array[Int](side * side)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = math.min(side - 1, y * side / h)
      var x = 0
      while (x < w) {
        val cx = math.min(side - 1, x * side / w)
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        f(cy * side + cx) += lum / 255.0f
        counts(cy * side + cx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < f.length) { if (counts(i) > 0) f(i) /= counts(i); i += 1 }
    f
  }

  /** 16-bin RMS energy profile over 16-bit little-endian PCM. */
  private def rmsProfile(pcm: Array[Byte], bins: Int): Array[Float] = {
    val nSamples = pcm.length / 2
    val f = new Array[Float](bins)
    if (nSamples == 0) return f
    val counts = new Array[Int](bins)
    var s = 0
    while (s < nSamples) {
      val v = ((pcm(2 * s + 1) << 8) | (pcm(2 * s) & 0xff)).toShort / 32768.0
      val b = math.min(bins - 1, s * bins / nSamples)
      f(b) += (v * v).toFloat
      counts(b) += 1
      s += 1
    }
    var i = 0
    while (i < bins) {
      if (counts(i) > 0) f(i) = math.sqrt(f(i) / counts(i)).toFloat
      i += 1
    }
    f
  }

  /** REAL decode: JDK codecs for images (PNG/JPEG/BMP/GIF) and WAV audio;
    * stub fallback for video, unknown formats, and corrupt payloads. */
  def decodeReal(b: MediaBlob): MediaFeatures =
    try b.kind match {
      case "image" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.bytes))
        if (img == null) decodeStub(b)
        else MediaFeatures(b.doc_id, b.media_ref, b.kind, b.content_hash,
          img.getWidth, img.getHeight, 0, 1, grayThumb(img, 4))
      case "audio" =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.bytes))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val durationMs = (frames * 1000.0 / fmt.getSampleRate).toInt
          val pcm = ais.readAllBytes()
          MediaFeatures(b.doc_id, b.media_ref, b.kind, b.content_hash,
            0, 0, durationMs, 0, rmsProfile(pcm, 16))
        } finally ais.close()
      case _ => decodeStub(b)
    } catch { case _: Exception => decodeStub(b) }

  /** REAL resize: longest side clamped to `maxSide`, aspect preserved,
    * bilinear, re-encoded as PNG. Returns (bytes, width, height). */
  def resizeImage(bytes: Array[Byte], maxSide: Int): Option[(Array[Byte], Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return None
    val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
    val ow = math.max(1, math.ceil(img.getWidth * scale).toInt)
    val oh = math.max(1, math.ceil(img.getHeight * scale).toInt)
    val out = new java.awt.image.BufferedImage(ow, oh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, ow, oh, null)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some((bos.toByteArray, ow, oh))
  }

  /** Decode a blob Dataset to features with per-partition batching (the
    * `mapInPandas`-shaped plumbing: one kernel init per partition, rows
    * streamed through it). Salt-repartition first so a few huge videos
    * cannot skew one task. The kernel is [[decodeReal]] — JDK codecs with
    * deterministic-stub fallback.
    */
  def decode(blobs: Dataset[MediaBlob], saltBuckets: Int = 16): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs
      .repartition(blobs.sparkSession.sessionState.conf.numShufflePartitions,
        pmod(col("content_hash"), lit(saltBuckets)))
      .mapPartitions { it =>
        // kernel init happens once per partition here (decoder state, codec
        // registry); rows then stream through
        it.map(decodeReal)
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
