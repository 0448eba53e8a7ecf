package graft.ext

import java.io.ByteArrayInputStream
import graft.ext.Multimodal._

/** REAL media codec built only on JDK facilities (zero external
  * dependencies, headless-safe):
  *
  *  - images: `javax.imageio.ImageIO` — PNG, JPEG, BMP, GIF, WBMP;
  *  - audio: `javax.sound.sampled.AudioSystem` — WAV/AIFF/AU
  *    containers with PCM payloads, normalized to float ∈ [−1, 1);
  *  - frames: multi-frame containers ImageIO can demux (animated
  *    GIF), sampled every Nth frame.
  *
  * This replaces [[Multimodal.StubCodec]] for every format the JDK
  * ships a decoder for; MP4/H.264-class video still needs a
  * JavaCV/JNI-backed implementation of the same [[MediaCodec]] seam
  * at deploy time (this container has no native codec libraries).
  * One instance serves a whole partition (see [[MediaCodec]]).
  */
object JdkCodec extends MediaCodec {

  private def toRgb(img: java.awt.image.BufferedImage)
      : (Int, Int, Array[Byte]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    // ONE bulk getRGB per image, row-strided into a reused buffer: the
    // per-pixel getRGB(x, y) form performs a color-model conversion
    // call per pixel — ~an order of magnitude slower on the map-side
    // decode hot path, where for a 12MP image that was ~12M calls.
    // Values are identical (same default-ARGB conversion), which the
    // byte-exact codec specs pin.
    val px = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0
    var i = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        px(i) = ((rgb >> 16) & 0xff).toByte
        px(i + 1) = ((rgb >> 8) & 0xff).toByte
        px(i + 2) = (rgb & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  def decodeImage(id: Long, format: String, bytes: Array[Byte]): DecodedImage = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"media $id: no JDK decoder for payload (format=$format)")
    val (w, h, px) = toRgb(img)
    DecodedImage(id, w, h, 3, px)
  }

  def decodeAudio(id: Long, format: String, bytes: Array[Byte]): AudioClip = {
    val in = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16,
        s"media $id: only 16-bit signed PCM supported, got $fmt")
      val raw = in.readAllBytes()
      val channels = fmt.getChannels
      val big = fmt.isBigEndian
      val nFrames = raw.length / (2 * channels)
      // mono mixdown: mean of channels per frame
      val samples = new Array[Float](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < channels) {
          val o = (f * channels + c) * 2
          val s =
            if (big) ((raw(o) << 8) | (raw(o + 1) & 0xff)).toShort
            else ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
          acc += s / 32768.0f
          c += 1
        }
        samples(f) = acc / channels
        f += 1
      }
      AudioClip(id, fmt.getSampleRate.toInt, nFrames, samples)
    } finally in.close()
  }

  def frames(id: Long, format: String, bytes: Array[Byte],
      everyNth: Int): Iterator[Frame] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val iis = javax.imageio.ImageIO
      .createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"media $id: no JDK demuxer for payload (format=$format)")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        // decoded EAGERLY so reader + input stream (which may back
        // onto a disk-cache temp file) close deterministically here,
        // not whenever a lazy iterator happens to drain; sampled
        // frames per clip are bounded small
        (0 until n by everyNth).map { f =>
          val (w, h, px) = toRgb(reader.read(f))
          Frame(id, f, w, h, px)
        }.iterator
      } finally reader.dispose()
    } finally iis.close()
  }
}
