package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Multimodal decode: REAL JDK codecs (javax.imageio, javax.sound.sampled)
  * with the deterministic stub as fallback for non-media payloads. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("decodeImage reads a real PNG: dimensions, format, luminance") {
    val png = Multimodal.synthPng(7L, w = 32, h = 24)
    // PNG magic bytes prove a real encoder ran
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val m = Multimodal.decodeImage(7L, png).get
    assert(m.format === "png")
    assert(m.width === 32 && m.height === 24)
    assert(m.mean_byte > 0 && m.mean_byte < 255)
    // decode is deterministic
    assert(Multimodal.decodeImage(7L, Multimodal.synthPng(7L, 32, 24)).get === m)
  }

  test("decodeAudioMeta parses a real WAV header") {
    import javax.sound.sampled._
    val sampleRate = 8000f
    val pcm = new Array[Byte](8000 * 2) // 1 second of 16-bit mono silence
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 8000)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val m = Multimodal.decodeAudioMeta(1L, bos.toByteArray).get
    assert(m.format === "wav")
    assert(m.width === 8000)      // sample rate
    assert(m.height === 1)        // channels
    assert(m.mean_byte === 1000.0) // duration ms
  }

  test("decodeMedia falls back to the deterministic stub for non-media bytes") {
    val textBytes = "just some text".getBytes("UTF-8")
    val m = Multimodal.decodeMedia(5L, textBytes)
    assert(m === Multimodal.decodeStub(5L, textBytes))
    assert(Set("jpeg", "png", "webp").contains(m.format))
  }

  test("resizePng produces a decodable thumbnail") {
    val png = Multimodal.synthPng(3L, 32, 24)
    val thumb = Multimodal.resizePng(png, 16, 12).get
    val m = Multimodal.decodeImage(3L, thumb).get
    assert(m.width === 16 && m.height === 12)
    // non-image bytes resize to None, not an exception
    assert(Multimodal.resizePng("nope".getBytes, 4, 4) === None)
  }

  test("frame sampling decodes only every k-th frame of a container") {
    val video = Multimodal.synthVideo(9L, nFrames = 8)
    val sampled = Multimodal.sampleFrames(9L, video, every = 3)
    assert(sampled.length === 3) // frames 0, 3, 6
    assert(sampled.forall(m => m.format == "png" && m.width == 16 && m.height == 12))
    // sampled frame 0 decodes identically to the standalone frame PNG
    val direct = Multimodal.decodeImage(9L, Multimodal.synthPng(9L * 1000, 16, 12)).get
    assert(sampled.head.mean_byte === direct.mean_byte)
    // every=1 decodes all frames
    assert(Multimodal.sampleFrames(9L, video, every = 1).length === 8)
    // distributed stage is deterministic
    import spark.implicits._
    val docs = (1L to 10L).toDF("doc_id")
    def run() = Multimodal.frameSamplePipeline(docs, nFrames = 6, every = 2)
      .collect().sortBy(r => (r.doc_id, r.frame_idx)).toSeq
    val a = run()
    assert(a.length === 30) // 10 docs x frames {0,2,4}
    assert(a.map(_.frame_idx).distinct.sorted === Seq(0, 2, 4))
    assert(a === run())
  }

  test("imagePipeline decodes and thumbnails distributed, deterministically") {
    import spark.implicits._
    val docs = (1L to 20L).toDF("doc_id")
    def run() = Multimodal.imagePipeline(docs).collect().sortBy(_.doc_id)
    val a = run()
    assert(a.length === 20)
    assert(a.forall(r => r.format == "png" && r.width == 32 && r.height == 24
      && r.r_width == 16 && r.r_height == 12))
    // thumbnail luminance tracks the original (bilinear downsample of the
    // same pixels): means within a loose band of each other
    assert(a.forall(r => math.abs(r.mean_byte - r.r_mean) < 40))
    assert(a.toSeq === run().toSeq)
  }

  test("frame sampling tolerates truncated/corrupt containers") {
    val video = Multimodal.synthVideo(4L, nFrames = 4)
    // truncate mid-frame: keep everything except the last 10 bytes
    val truncated = video.take(video.length - 10)
    val sampled = Multimodal.sampleFrames(4L, truncated, every = 1)
    assert(sampled.length === 3, "complete frames decode; the torn last frame is skipped")
    // garbage prefix (negative length) stops cleanly
    val garbage = Array[Byte](-1, -1, -1, -1, 1, 2, 3)
    assert(Multimodal.sampleFrames(4L, garbage, every = 1) === Seq.empty)
    assert(Multimodal.sampleFrames(4L, Array.emptyByteArray, every = 1) === Seq.empty)
  }
}
