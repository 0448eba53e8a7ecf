package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO}
import org.apache.spark.sql.functions._
import graft.ext.{JdkCodec, Multimodal}

/** End-to-end REAL decode through the Spark multimodal operators:
  * genuine PNG / WAV / animated-GIF payloads synthesized with JDK
  * encoders, decoded partition-wise by [[graft.ext.JdkCodec]], with
  * exact pixel/sample assertions (PNG and PCM are lossless; GIF test
  * frames use palette colors so quantization is identity).
  */
class JdkCodecSpec extends SparkSpec {
  import spark.implicits._

  // ── payload synthesis (JDK encoders only) ─────────────────────────

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256 << 16) | (y % 256 << 8) | (x % 256))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(nSamples: Int, hz: Float = 16000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2) // 16-bit LE mono
    for (i <- 0 until nSamples) {
      val v = (math.sin(i * 0.05) * 12000).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(hz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Animated GIF: one solid primary color per frame (palette-exact). */
  private def gifBytes(nFrames: Int, w: Int = 10, h: Int = 6): Array[Byte] = {
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff, 0xff00ff)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, colors(f % colors.length))
      writer.writeToSequence(new IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  private def mediaDf = Seq(
    (1L, "image", "png", pngBytes(20, 12)),
    (2L, "audio", "wav", wavBytes(800)),
    (3L, "video", "gif", gifBytes(6))
  ).toDF("media_id", "kind", "format", "bytes")

  test("PNG → decodeImages: exact dimensions and pixel bytes") {
    val got = Multimodal.decodeImages(mediaDf, JdkCodec).collect()
    assert(got.length === 1)
    val img = got.head
    assert((img.width, img.height, img.channels) === ((20, 12, 3)))
    // spot-check exact RGB round-trip (PNG is lossless)
    def at(x: Int, y: Int) = {
      val i = (y * 20 + x) * 3
      (img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff, img.pixels(i + 2) & 0xff)
    }
    assert(at(0, 0) === (((0 * 7 + 0 * 13) % 256, 0, 0)))
    assert(at(5, 3) === (((5 * 7 + 3 * 13) % 256, 3, 5)))
  }

  test("WAV → decodeAudio: exact sample count, rate, and PCM values") {
    val got = Multimodal.decodeAudioClips(mediaDf, JdkCodec).collect()
    assert(got.length === 1)
    val clip = got.head
    assert(clip.sample_rate === 16000)
    assert(clip.n_samples === 800)
    // PCM16 is lossless: sample i == sin(i*0.05)*12000 / 32768
    (0 until 800 by 97).foreach { i =>
      val want = (math.sin(i * 0.05) * 12000).toShort / 32768.0f
      assert(math.abs(clip.samples(i) - want) < 1e-7, s"sample $i")
    }
  }

  test("animated GIF → sampleFrames: every-2nd-frame sampling, exact colors") {
    val got = Multimodal.sampleFrames(mediaDf, everyNth = 2, JdkCodec)
      .collect().sortBy(_.frame_no)
    assert(got.map(_.frame_no).toSeq === Seq(0, 2, 4))
    got.foreach { f => assert((f.width, f.height) === ((10, 6))) }
    // frame 2 is solid blue in the palette
    val f2 = got.find(_.frame_no == 2).get
    assert((f2.pixels(0) & 0xff, f2.pixels(1) & 0xff, f2.pixels(2) & 0xff)
      === ((0, 0, 255)))
  }

  test("features over real decodes: finite, fixed-dim, deterministic") {
    val a = Multimodal.features(mediaDf, dim = 16, JdkCodec).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    val b = Multimodal.features(mediaDf, dim = 16, JdkCodec).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(a === b)
    assert(a.keySet === Set(1L, 2L, 3L))
    assert(a.values.forall(e => e.length == 16 && e.forall(v => !v.isNaN)))
  }

  test("resize on a real PNG: nearest-neighbor picks source pixels") {
    val resized = Multimodal.resize(
      Multimodal.decodeImages(mediaDf, JdkCodec), w = 5, h = 3).collect().head
    assert((resized.width, resized.height) === ((5, 3)))
    // target (0,0) samples source (0,0)
    assert((resized.pixels(0) & 0xff) === (0 * 7 + 0 * 13) % 256)
  }
}
