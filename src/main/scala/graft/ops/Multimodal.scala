package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in BATCHED per-partition passes (the JVM analogue of
  * `mapInPandas` batch processing — same schema/partitioning/batch-shape
  * concerns, Scala iterator instead of Arrow/pandas).
  *
  * Decode is REAL for the codecs the JDK ships (`javax.imageio`:
  * PNG/JPEG/GIF/BMP; `javax.sound.sampled`: WAV/AIFF headers) — dimensions,
  * mean luminance, sample rate, duration. Payloads no JDK codec accepts
  * (e.g. the text stand-in bytes of the synthetic corpus, or codecs needing
  * native libs — webp, video) fall back to `decodeStub`, which derives
  * deterministic pseudo-metadata from the bytes so the pipeline shape stays
  * testable; swap the fallback for a native codec on a cluster that has
  * one. */
object Multimodal {

  // ImageIO's default stream cache is a temp FILE per image read/write
  // (FileCacheImageInputStream/-OutputStream): with it on, every decoded
  // doc pays 2-4 disk-backed round-trips in /tmp, all tasks contending on
  // one disk. These payloads are tiny in-memory byte arrays — the memory
  // cache is strictly better and bit-identical. Once per JVM at object
  // init (executors initialize this object with the task closure).
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, mean_byte: Double)

  /** Real decode where the JDK can (image first, then audio header), stub
    * fallback otherwise. */
  def decodeMedia(docId: Long, bytes: Array[Byte]): MediaMeta =
    decodeImage(docId, bytes)
      .orElse(decodeAudioMeta(docId, bytes))
      .getOrElse(decodeStub(docId, bytes))

  /** `javax.imageio` decode: real width/height + mean luminance (0..255),
    * format from the matching reader. None when no JDK reader accepts. */
  def decodeImage(docId: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = reader.read(0)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            // integer Rec.601-ish luminance
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        val mean = sum.toDouble / (img.getWidth.toLong * img.getHeight)
        Some(MediaMeta(docId, bytes.length, fmt, img.getWidth, img.getHeight,
          math.round(mean * 100).toDouble / 100))
      } finally reader.dispose()
    } catch { case _: Exception => None } finally if (in != null) in.close()
  }

  /** `javax.sound.sampled` header parse: WAV/AIFF/AU. width = sample rate in
    * Hz, height = channels, mean_byte = duration in ms (header-only — no
    * full PCM decode needed for metadata). */
  def decodeAudioMeta(docId: Long, bytes: Array[Byte]): Option[MediaMeta] =
    try {
      val in = new java.io.ByteArrayInputStream(bytes)
      val fileFormat = javax.sound.sampled.AudioSystem.getAudioFileFormat(in)
      val af = fileFormat.getFormat
      val frames = fileFormat.getFrameLength
      val durMs =
        if (frames > 0 && af.getFrameRate > 0) frames * 1000.0 / af.getFrameRate else 0.0
      Some(MediaMeta(docId, bytes.length,
        fileFormat.getType.getExtension.toLowerCase(java.util.Locale.ROOT),
        af.getSampleRate.toInt, af.getChannels, math.round(durMs * 100).toDouble / 100))
    } catch { case _: Exception => None }

  /** Pure-JVM image resize (Graphics2D bilinear) back to PNG bytes — the
    * batched "transform" stage of an image-curation pipeline. */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** ===== FALLBACK ===== deterministic pseudo-decode for payloads no JDK
    * codec accepts: dimensions and a "feature" derived from the bytes, so
    * the pipeline stays end-to-end runnable on the text stand-in corpus. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val h = graft.kg.Synth.splitmix64(docId)
    val fmt = Array("jpeg", "png", "webp").apply(((((h >>> 3) % 3) + 3) % 3).toInt)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    MediaMeta(docId, bytes.length, fmt,
      64 + (((h >>> 8) % 512) + 512).toInt % 512,
      64 + (((h >>> 20) % 512) + 512).toInt % 512,
      math.round(mean * 100).toDouble / 100)
  }

  /** Attach a binary payload column (here: UTF-8 of the text standing in for
    * media bytes) — the input-shaping step a real ingest would do. */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Batched decode over partitions: explicit repartition (decode is the
    * expensive stage — spread it), then one iterator pass per partition. */
  def decodeMeta(docs: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .repartition(p, col("doc_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeMedia(id, bytes) })
  }

  /** Deterministic synthetic PNG (seeded pixels) — gives the REAL
    * decode/resize path genuine codec work without external data. */
  def synthPng(docId: Long, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var seed = graft.kg.Synth.splitmix64(docId)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        seed = graft.kg.Synth.splitmix64(seed + 1)
        img.setRGB(x, y, (seed & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV (16-bit mono PCM, seeded samples) — real
    * `javax.sound.sampled` codec work for the audio decode path. */
  def synthWav(docId: Long, nSamples: Int = 800, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var seed = graft.kg.Synth.splitmix64(docId)
    var i = 0
    while (i < nSamples) {
      seed = graft.kg.Synth.splitmix64(seed + 1)
      val v = (seed & 0xffffL).toInt - 32768
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic per-doc media payload standing in for fetched bytes:
    * PNG (doc_id % 3 == 0), WAV (== 1), raw text bytes (== 2 — exercises the
    * documented stub fallback). */
  def synthPayload(docId: Long, text: String): Array[Byte] = (docId % 3) match {
    case 0 => synthPng(docId)
    case 1 => synthWav(docId)
    case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Media-decode stage over REAL codec payloads: synthesize the per-doc
    * payload (PNG / WAV / raw text), batch-decode per partition. Exercises
    * all three decode paths — `javax.imageio`, the sampled-audio header
    * parse, and the stub fallback — unlike [[decodeMeta]], whose text
    * payloads only ever reach the fallback. */
  def mediaDecodePipeline(docs: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    docs.select(col("doc_id"), col("text"))
      .repartition(p, col("doc_id"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => decodeMedia(id, synthPayload(id, text)) })
  }

  // ------------------------------------------------------------- video-ish
  /** Deterministic synthetic "video": length-prefixed concatenated PNG
    * frames ([4-byte big-endian length][png bytes])* — a stand-in container
    * with REAL per-frame codec work. */
  def synthVideo(docId: Long, nFrames: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    var f = 0
    while (f < nFrames) {
      val png = synthPng(docId * 1000 + f, w, h)
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    bos.toByteArray
  }

  /** Frame sampling: decode every `every`-th frame of a length-prefixed
    * frame container (frame 0, every, 2·every, …) — the standard
    * keyframe-ish subsampling step of a video-curation pipeline. Frames that
    * are skipped are NOT decoded (the container is walked by length prefix),
    * which is the point of sampling. */
  def sampleFrames(docId: Long, container: Array[Byte], every: Int): Seq[MediaMeta] = {
    require(every >= 1)
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(container))
    val out = scala.collection.mutable.ArrayBuffer.empty[MediaMeta]
    var idx = 0
    var ok = true
    while (ok && in.available() >= 4) {
      val len = in.readInt()
      // corrupt/truncated container (negative or overlong prefix): stop and
      // return the frames decoded so far instead of killing the task —
      // fetched bytes are untrusted input
      if (len < 0 || len > in.available()) ok = false
      else {
        if (idx % every == 0) {
          val frame = new Array[Byte](len)
          in.readFully(frame)
          out += decodeMedia(docId, frame).copy(n_bytes = len)
        } else {
          in.skipBytes(len)
        }
        idx += 1
      }
    }
    out.toSeq
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, format: String,
                      width: Int, height: Int, mean_byte: Double)

  /** Distributed frame-sampling stage: synthesize a per-doc frame container
    * (standing in for fetched video bytes), sample every `every`-th frame,
    * decode each sampled frame for metadata/features. */
  def frameSamplePipeline(docs: DataFrame, nFrames: Int = 8, every: Int = 3): Dataset[FrameRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    docs.select(col("doc_id"))
      .repartition(p, col("doc_id"))
      .as[Long]
      .mapPartitions(_.flatMap { id =>
        sampleFrames(id, synthVideo(id, nFrames), every).zipWithIndex.map { case (m, i) =>
          FrameRow(id, i * every, m.format, m.width, m.height, m.mean_byte)
        }
      })
  }

  case class ImageRow(doc_id: Long, format: String, width: Int, height: Int,
                      mean_byte: Double, r_width: Int, r_height: Int, r_mean: Double)

  /** Full image-curation stage on REAL codecs: synthesize a deterministic
    * PNG per doc (standing in for fetched bytes), decode (javax.imageio),
    * bilinear-resize to a thumbnail, decode again — the batched per-partition
    * shape of a production decode/transform pass. */
  def imagePipeline(docs: DataFrame, thumbW: Int = 16, thumbH: Int = 12): Dataset[ImageRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    docs.select(col("doc_id"))
      .repartition(p, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val png = synthPng(id)
        val m = decodeMedia(id, png)
        val thumb = resizePng(png, thumbW, thumbH).get
        val tm = decodeMedia(id, thumb)
        ImageRow(id, m.format, m.width, m.height, m.mean_byte,
          tm.width, tm.height, tm.mean_byte)
      })
  }

  /** Pure-column metadata path (no decode needed): byte length + magic-number
    * sniffing pattern — stays entirely in codegen. */
  def payloadMeta(docs: DataFrame): DataFrame =
    withPayload(docs).select(col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      substring(base64(col("payload")), 1, 8).as("magic_b64"))
}
