package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.ContainerDemux

/** ContainerDemux against byte-exact synthesized containers (the
  * JdkCodecSpec treatment for the two formats the JDK can't decode):
  * an ISO-BMFF tree built box by box per ISO/IEC 14496-12, and an MP3
  * frame stream built header by header per ISO/IEC 11172-3 —
  * assertions are exact parsed values, not smoke checks.
  */
class ContainerDemuxSpec extends AnyFunSuite {

  // ── byte builders ─────────────────────────────────────────────────

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0),                  // creation, modification
      be32(timescale), be32(duration),
      be32(0x00010000L), // rate 1.0
      Array.fill[Byte](2 + 2 + 8 + 36 + 24 + 4)(0)) // vol..next_track

  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array[Byte](0, 0, 0, 7),
      be32(0), be32(0), be32(1), be32(0), be32(0), // times, id, dur
      Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0), // reserved..matrix
      be32(w.toLong << 16), be32(h.toLong << 16))  // 16.16 fixed

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
      handler.getBytes("ISO-8859-1"), Array.fill[Byte](12 + 1)(0))

  private def stts(entries: (Long, Long)*): Array[Byte] =
    box("stts", Array[Byte](0, 0, 0, 0), be32(entries.length.toLong),
      entries.toArray.flatMap { case (c, d) => be32(c) ++ be32(d) })

  private def trak(handler: String, w: Int, h: Int,
      sttsEntries: (Long, Long)*): Array[Byte] =
    box("trak", tkhdV0(w, h),
      box("mdia", hdlr(handler),
        box("minf", box("stbl", stts(sttsEntries: _*)))))

  /** One Layer-III frame. MPEG1 44.1 kHz 128 kbps no-padding =
    * 144*128000/44100 = 417 bytes; header 0xFF 0xFB 0x90 0x00.
    */
  private def mp3Frame(bitrateIdx: Int, len: Int): Array[Byte] = {
    val hdr = Array[Byte](0xff.toByte, 0xfb.toByte,
      ((bitrateIdx << 4) | 0x00).toByte, 0x00)
    hdr ++ Array.fill[Byte](len - 4)(0x55)
  }

  // ── MP4 ───────────────────────────────────────────────────────────

  test("mp4: ftyp brand, mvhd duration, per-track handlers, tkhd geometry, stts frames") {
    val bytes =
      box("ftyp", "isom".getBytes, be32(512), "isomavc1".getBytes) ++
        box("moov",
          mvhdV0(timescale = 1000, duration = 7500), // 7.5 s
          trak("vide", 640, 360, (120L, 1001L), (60L, 1001L)),
          trak("soun", 0, 0, (300L, 1024L))) ++
        box("mdat", Array.fill[Byte](32)(9))
    val m = ContainerDemux.mp4Info(7L, bytes).get
    assert(m.container == "mp4" && m.brand == "isom")
    assert(m.duration_ms == 7500L)
    assert(m.n_tracks == 2 && m.n_video_tracks == 1 && m.n_audio_tracks == 1)
    assert(m.width == 640 && m.height == 360)
    assert(m.n_frames == 180L) // Σ stts counts of the video track
  }

  test("mp4: 64-bit largesize box and v1 mvhd parse") {
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0),
      Array.fill[Byte](8 + 8)(0),          // 64-bit times
      be32(90000),                          // timescale
      be32(0), be32(270000),                // 64-bit duration = 3 s
      be32(0x00010000L), Array.fill[Byte](78)(0))
    val moov = box("moov", mvhdV1)
    // wrap mdat as a size==1 largesize box
    val payload = Array.fill[Byte](16)(1)
    val large = be32(1) ++ "mdat".getBytes ++
      be32(0) ++ be32(16L + payload.length) ++ payload
    val m = ContainerDemux.mp4Info(1L, moov ++ large).get
    assert(m.duration_ms == 3000L)
  }

  test("mp4: non-BMFF and truncated payloads return None, never throw") {
    assert(ContainerDemux.mp4Info(1L, "not a movie at all".getBytes).isEmpty)
    assert(ContainerDemux.mp4Info(1L, Array[Byte](0, 0)).isEmpty)
    val good = box("moov", mvhdV0(1000, 1000))
    assert(ContainerDemux.mp4Info(1L, good.dropRight(5)).isEmpty)
  }

  test("mp4: largesize near Long.MaxValue cannot overflow the bounds walk") {
    // size0==1 with a u64 size s.t. offset + size wraps negative: a
    // `o + size > to` guard passes and the walk indexes with garbage
    // offsets (threw ArrayIndexOutOfBoundsException before the
    // overflow-proof `size > to - o` comparison)
    val ftyp = box("ftyp", "isom".getBytes, be32(512))
    for (big <- Seq(Long.MaxValue - 2, Long.MaxValue, Long.MinValue + 8)) {
      val hostile = be32(1) ++ "moov".getBytes ++
        be32((big >>> 32) & 0xffffffffL) ++ be32(big & 0xffffffffL) ++
        Array.fill[Byte](64)(0)
      val m = ContainerDemux.mp4Info(1L, ftyp ++ hostile)
      // parse stops cleanly at the garbled box; the valid ftyp prefix
      // may still yield brand-only metadata — the contract is no throw
      assert(m.forall(_.duration_ms == 0L))
    }
  }

  // ── MP3 ───────────────────────────────────────────────────────────

  test("mp3: frame walk — count, duration, sample rate, mean bitrate") {
    // 10 frames of MPEG1 L3 128 kbps @44.1 kHz (417 bytes each)
    val bytes = Array.fill(10)(mp3Frame(9, 417)).flatten
    val m = ContainerDemux.mp3Info(3L, bytes).get
    assert(m.container == "mp3" && m.brand == "MPEG1")
    assert(m.n_frames == 10L)
    assert(m.sample_rate == 44100)
    assert(m.bit_rate_kbps == 128)
    // 10 * 1152 / 44100 s = 261.2 ms
    assert(m.duration_ms == 261L)
  }

  test("mp3: ID3v2 tag skipped; VBR mean bitrate is the frame mean") {
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, 0, 20) ++ Array.fill[Byte](20)(0x41)
    // 128 kbps (idx 9, 417 B) then 192 kbps (idx 11, 144*192000/44100=626 B)
    val bytes = id3 ++ mp3Frame(9, 417) ++ mp3Frame(11, 626)
    val m = ContainerDemux.mp3Info(4L, bytes).get
    assert(m.n_frames == 2L)
    assert(m.bit_rate_kbps == 160) // (128 + 192) / 2
  }

  test("mp3: ID3v2.4 footer flag adds 10 bytes to the tag skip") {
    // flags byte 0x10 = footer present: 10-byte header + 20-byte body
    // + 10-byte "3DI" footer, none of it counted in the syncsafe size
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0x10) ++
      Array[Byte](0, 0, 0, 20) ++ Array.fill[Byte](20)(0x41) ++
      "3DI".getBytes ++ Array[Byte](4, 0, 0x10) ++ Array[Byte](0, 0, 0, 20)
    val m = ContainerDemux.mp3Info(6L, id3 ++ mp3Frame(9, 417))
    assert(m.exists(_.n_frames == 1L), m)
  }

  test("mp3: pre-v2.4 tag with the (reserved) footer bit set skips no audio") {
    // v2.3 has no footer; a nonconforming tag with bit 4 set must not
    // make the scan jump 10 bytes past the tag into mid-frame
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0x10) ++
      Array[Byte](0, 0, 0, 20) ++ Array.fill[Byte](20)(0x41)
    val m = ContainerDemux.mp3Info(7L, id3 ++ mp3Frame(9, 417))
    assert(m.exists(_.n_frames == 1L), m)
  }

  test("mp3: trailing garbage tolerated, leading garbage rejected") {
    val ok = mp3Frame(9, 417) ++ "trailing junk".getBytes
    assert(ContainerDemux.mp3Info(5L, ok).get.n_frames == 1L)
    assert(ContainerDemux.mp3Info(5L, "junk first".getBytes).isEmpty)
    assert(ContainerDemux.mp3Info(5L, Array.emptyByteArray).isEmpty)
  }

  test("fuzz: arbitrary and mutated payloads never throw, only None/Some") {
    // deterministic corruption sweep: random bytes, and valid
    // containers with every single byte position flipped — the
    // truncation/garble paths a 100 TB media crawl will definitely hit
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { i =>
      val garbage = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte)
      ContainerDemux.mp4Info(i.toLong, garbage): Unit
      ContainerDemux.mp3Info(i.toLong, garbage): Unit
    }
    val validMp4 =
      box("ftyp", "isom".getBytes, be32(512)) ++
        box("moov", mvhdV0(1000, 5000), trak("vide", 64, 48, (10L, 100L)))
    val validMp3 = Array.fill(3)(mp3Frame(9, 417)).flatten
    validMp4.indices.foreach { i =>
      val m = validMp4.clone(); m(i) = (m(i) ^ 0xff).toByte
      ContainerDemux.mp4Info(1L, m): Unit // must not throw
    }
    validMp3.indices.foreach { i =>
      val m = validMp3.clone(); m(i) = (m(i) ^ 0xff).toByte
      ContainerDemux.mp3Info(1L, m): Unit
    }
    // truncation sweep on the valid containers
    (0 until validMp4.length by 7).foreach(n =>
      ContainerDemux.mp4Info(1L, validMp4.take(n)): Unit)
    (0 until validMp3.length by 7).foreach(n =>
      ContainerDemux.mp3Info(1L, validMp3.take(n)): Unit)
  }

  test("demux routes by format and rejects unowned formats") {
    val mp4 = box("moov", mvhdV0(1000, 2000))
    assert(ContainerDemux.demux(1L, "mp4", mp4).get.duration_ms == 2000L)
    assert(ContainerDemux.demux(1L, "mp3", mp3Frame(9, 417)).isDefined)
    assert(ContainerDemux.demux(1L, "jpeg", mp4).isEmpty)
    // format says mp4, payload is not: sniff rejects
    assert(ContainerDemux.demux(1L, "mp4", "plain text".getBytes).isEmpty)
  }
}
