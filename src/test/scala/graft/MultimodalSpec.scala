package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.model.Model.MediaRecord
import graft.pipeline.DataOps

/** The multimodal decode path with REAL image bytes: the registry
  * queries only ever see the synthetic corpus's text payloads (which
  * fall back to the deterministic stub the oracle mirrors), so this
  * suite is what proves the `javax.imageio` branch decodes actual
  * pixels — exact dimensions from an embedded PNG and JPEG, real
  * bilinear resampling in the thumb path, and stub determinism for
  * non-image payloads, all through the same `mapPartitions` the
  * queries execute. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Encode a w×h gradient raster with the JDK writer. */
  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK has no $format writer")
    out.toByteArray
  }

  private val png320x200 = imageBytes(320, 200, "png")
  private val jpg100x400 = imageBytes(100, 400, "jpg")
  private val textBytes = "not an image at all".getBytes("UTF-8")

  test("mediaFeatures decodes a real embedded PNG to its exact dimensions") {
    val ds = Seq(
      MediaRecord(1L, "image/png", png320x200),
      MediaRecord(2L, "image/jpeg", jpg100x400),
      MediaRecord(3L, "image/png", textBytes),
      MediaRecord(4L, "audio/wav", png320x200)).toDS()
    val got = DataOps.mediaFeatures(ds).collect()
      .map(f => f.doc_id -> f).toMap
    // real decode: geometry from actual pixels, frames = 1
    assert(got(1L).width == 320L && got(1L).height == 200L)
    assert(got(1L).frames == 1L)
    assert(got(1L).n_bytes == png320x200.length.toLong)
    assert(got(2L).width == 100L && got(2L).height == 400L)
    // image mime but undecodable bytes → deterministic stub, not a crash
    assert(got(3L).width >= 64L && got(3L).width < 961L)
    // non-image mime never decodes, even when the bytes WOULD parse
    assert(!(got(4L).width == 320L && got(4L).height == 200L))
  }

  /** Encode 16-bit little-endian mono PCM at `rate` Hz as a real WAV. */
  private def wavBytes(rate: Float, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(i * 0.05) * 12000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("mediaFeatures decodes a real WAV to its exact audio geometry") {
    val ds = Seq(
      MediaRecord(1L, "audio/wav", wavBytes(16000f, 1600)),
      MediaRecord(2L, "audio/wav", textBytes),
      MediaRecord(3L, "image/png", wavBytes(8000f, 100))).toDS()
    val got = DataOps.mediaFeatures(ds).collect()
      .map(f => f.doc_id -> f).toMap
    // width = sample rate, height = channels, frames = PCM frames
    assert(got(1L).width == 16000L && got(1L).height == 1L)
    assert(got(1L).frames == 1600L)
    // undecodable audio bytes fall back to the stub, not a crash
    assert(got(2L).frames == 1L)
    // a WAV under an image mime is NOT image-decoded (stub range)
    assert(got(3L).width >= 64L && got(3L).width < 961L)
  }

  test("stub geometry is deterministic and matches the oracle arithmetic") {
    val ds = Seq(MediaRecord(9L, "video/mp4", textBytes)).toDS()
    val f = DataOps.mediaFeatures(ds).collect().head
    // mirror of the oracle's MD5-hex arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(textBytes).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    assert(f.width == 64L + h % 897L)
    assert(f.height == 64L + (h / 1000L) % 897L)
    assert(f.frames == 1L + h % 240L)
  }

  test("mediaThumbs really resamples decodable pixels into the box fit") {
    val ds = Seq(
      MediaRecord(1L, "image/png", png320x200),
      MediaRecord(2L, "image/jpeg", jpg100x400),
      MediaRecord(3L, "image/png", textBytes)).toDS()
    val got = DataOps.mediaThumbs(ds).collect()
      .map(t => t.doc_id -> t).toMap
    // landscape: 320×200 → 256×160 (exact integer box fit of real dims)
    assert(got(1L).width == 320L && got(1L).height == 200L)
    assert(got(1L).thumb_w == 256L && got(1L).thumb_h == 160L)
    // portrait: 100×400 → 64×256
    assert(got(2L).thumb_w == 64L && got(2L).thumb_h == 256L)
    // stub path still emits the same box-fit math over stub dims
    val (sw, sh) = (got(3L).width, got(3L).height)
    val want =
      if (sw >= sh) (256L, math.max(1L, sh * 256L / sw))
      else (math.max(1L, sw * 256L / sh), 256L)
    assert((got(3L).thumb_w, got(3L).thumb_h) == want)
  }

  test("the registry queries stay on the stub path over the synthetic corpus") {
    // no synthetic payload may accidentally decode as an image — the
    // oracle mirrors the stub arithmetic for every row
    val sf = "/root/testdata/sf0.001"
    val feats = DataOps.multimodal(spark, sf)
    val md = feats.where(
      org.apache.spark.sql.functions.col("frames") === 1L).count()
    assert(feats.count() > 0 && md > 0)
    val stubOnly = feats.where(
      "width < 64 or width > 960 or height < 64 or height > 960").count()
    assert(stubOnly == 0L, "a synthetic payload escaped the stub range")
  }
}
