package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media ride through the engine as opaque `binary` columns
  * plus typed metadata; decode / feature-extraction / resize /
  * frame-sampling run partition-wise so one codec instance serves a
  * whole partition (the JVM-side analogue of a batched Pandas UDF).
  *
  * Scale design (100 TB posture):
  *  - bytes never enter a shuffle: every operator here is map-side
  *    (`mapPartitions`), so media moves at most once (scan → derive);
  *  - derived features are small typed columns — downstream joins and
  *    aggregations shuffle features/metadata, not payloads;
  *  - partition sizing is byte-driven: media tables should be written
  *    with row-group-sized files and read with
  *    `spark.sql.files.maxPartitionBytes` tuned so a partition of
  *    decoded frames fits executor memory.
  *
  * Codecs: [[graft.ext.JdkCodec]] is a REAL decoder for every format
  * the JDK ships support for — PNG/JPEG/BMP/GIF images, PCM WAV
  * audio, animated-GIF frame demux — exercised end to end in
  * JdkCodecSpec with exact pixel/sample assertions.
  * [[graft.ext.ContainerDemux]] is a REAL header-only parser for the
  * two formats the JDK cannot decode — MP4-family video (ISO-BMFF box
  * walk) and MP3 (frame-header scan) — serving the [[containerMeta]]
  * metadata path with no stub involved. [[StubCodec]] remains only
  * for PIXEL/SAMPLE synthesis of payloads with no JDK decoder (the
  * driver corpus' text-byte stand-ins, MP4 frame decode):
  * deterministic byte-hash synthesis that keeps the plumbing
  * testable. A JavaCV/JNI-backed [[MediaCodec]] slots into the same
  * seam at deploy time for native-format decode.
  */
object Multimodal {

  // ── typed media model ─────────────────────────────────────────────

  final case class MediaRow(
      media_id: Long,
      kind: String,     // image | audio | video
      format: String,   // e.g. jpeg, png, pcm16, mp4
      bytes: Array[Byte])

  final case class DecodedImage(
      media_id: Long, width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  final case class AudioClip(
      media_id: Long, sample_rate: Int, n_samples: Int,
      samples: Array[Float])

  final case class Frame(
      media_id: Long, frame_no: Int, width: Int, height: Int,
      pixels: Array[Byte])

  final case class MediaFeature(
      media_id: Long, kind: String, embedding: Array[Float])

  // ── codec seam ────────────────────────────────────────────────────

  /** One instance is created per partition (not per row): real codecs
    * hold native buffers/handles worth reusing across a batch.
    */
  trait MediaCodec extends Serializable {
    def decodeImage(id: Long, format: String, bytes: Array[Byte]): DecodedImage
    def decodeAudio(id: Long, format: String, bytes: Array[Byte]): AudioClip
    def frames(id: Long, format: String, bytes: Array[Byte],
        everyNth: Int): Iterator[Frame]
  }

  /** STUB — deterministic fake decode (no media libs in this
    * container). Dimensions and payloads are synthesized from a 60-bit
    * md5 of (seed byte ++ payload), so outputs are reproducible,
    * size-plausible, and content-sensitive (different bytes → different
    * "pixels") — and, because the hash matches DuckDB's
    * `CAST(('0x'||substr(md5(chr(seed)||payload),1,15)) AS BIGINT)`
    * (the [[Dedup.md5Hash60]] convention), every synthesized
    * dimension, sample code, and pixel byte replays exactly in ANSI
    * SQL: the multimodal queries get hash-checked driver oracles
    * instead of rows-only counts.
    */
  object StubCodec extends MediaCodec {
    // first 15 hex chars of md5(seed byte ++ payload) = top 60 bits,
    // non-negative — the shared [[graft.functions.Md5Hash60]] convention
    private def h60(bytes: Array[Byte], seed: Int): Long =
      graft.functions.Md5Hash60.of(Array(seed.toByte), bytes)
    // shared synthesis: dims and pixel bytes are pure integer
    // arithmetic over a non-negative 60-bit h (shift/xor/mod only, so
    // the oracle can replay them without signed-shift ambiguity)
    private def synthImage(id: Long, h: Long): DecodedImage = {
      val w = 16 + (h % 49).toInt          // 16..64
      val ht = 16 + ((h >> 8) % 49).toInt
      val px = Array.tabulate[Byte](w * ht * 3)(i =>
        ((h >> (i % 56)) ^ i).toByte)
      DecodedImage(id, w, ht, 3, px)
    }
    def decodeImage(id: Long, format: String, bytes: Array[Byte]): DecodedImage =
      synthImage(id, h60(bytes, 1))
    def decodeAudio(id: Long, format: String, bytes: Array[Byte]): AudioClip = {
      val h = h60(bytes, 2)
      val n = 256 + (h % 769).toInt
      val s = Array.tabulate(n)(i =>
        (((h >> (i % 56)) & 0xff) / 127.5f) - 1.0f)
      AudioClip(id, 16000, n, s)
    }
    def frames(id: Long, format: String, bytes: Array[Byte],
        everyNth: Int): Iterator[Frame] = {
      // same guard as JdkCodec.frames: direct callers get the clear
      // message, not a Range step error / silent empty iterator
      require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
      val h = h60(bytes, 3)
      val nFrames = 8 + (h % 25).toInt
      (0 until nFrames by everyNth).iterator.map { f =>
        // per-frame variation by integer mixing (not re-hashing
        // bytes++f): stays SQL-replayable and < 2^60 (f << 17 < 2^23)
        val img = synthImage(id, h ^ (f.toLong << 17))
        Frame(id, f, img.width, img.height, img.pixels)
      }
    }
  }

  // ── partition-wise operators ──────────────────────────────────────

  private def asMedia(df: DataFrame): Dataset[MediaRow] =
    df.select(col("media_id").cast("long"), col("kind"), col("format"),
        col("bytes"))
      .as[MediaRow](Encoders.product[MediaRow])

  /** binary → decoded image rows (map-side; codec reused per partition). */
  def decodeImages(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[DecodedImage] =
    asMedia(media.filter(col("kind") === "image")).mapPartitions { it =>
      it.map(m => codec.decodeImage(m.media_id, m.format, m.bytes))
    }(Encoders.product[DecodedImage])

  /** binary → decoded audio rows (map-side; codec reused per partition). */
  def decodeAudioClips(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[AudioClip] =
    asMedia(media.filter(col("kind") === "audio")).mapPartitions { it =>
      it.map(m => codec.decodeAudio(m.media_id, m.format, m.bytes))
    }(Encoders.product[AudioClip])

  /** Nearest-neighbor resize on decoded pixel buffers. */
  def resize(images: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] =
    images.mapPartitions { it =>
      it.map { img =>
        val px = Array.tabulate[Byte](w * h * img.channels) { i =>
          val c = i % img.channels
          val x = (i / img.channels) % w
          val y = i / (img.channels * w)
          val sx = x * img.width / w
          val sy = y * img.height / h
          img.pixels((sy * img.width + sx) * img.channels + c)
        }
        DecodedImage(img.media_id, w, h, img.channels, px)
      }
    }(Encoders.product[DecodedImage])

  final case class MediaStat(
      media_id: Long, kind: String, n_raw: Int, raw_checksum: Long)

  /** Integer payload statistics from the decoded media: raw element
    * count and an exact unsigned checksum (pixel bytes for visual
    * kinds, 8-bit sample codes for audio — recovered exactly from the
    * float samples, since (code/127.5f − 1) round-trips within half a
    * code step). Map-side like every operator here. The all-integer
    * contract is what makes q80 a hash-checked driver oracle: float
    * mean-pooling ([[features]]) cannot be replayed bit-exactly by a
    * double-arithmetic SQL engine, but counts and byte sums can.
    */
  def payloadStats(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[MediaStat] =
    asMedia(media).mapPartitions { it =>
      // flatMap + Try: corrupt media (or a kind the codec cannot own —
      // a real ImageIO cannot decode an mp4 payload routed through the
      // image branch) degrades to an ABSENT row, never a task failure —
      // the containerMeta posture. StubCodec never throws, so the
      // oracle-gated queries see identical rows.
      it.flatMap { m =>
        scala.util.Try(m.kind match {
          case "audio" =>
            val clip = codec.decodeAudio(m.media_id, m.format, m.bytes)
            var sum = 0L; var i = 0
            while (i < clip.samples.length) {
              sum += math.round((clip.samples(i) + 1.0) * 127.5)
              i += 1
            }
            MediaStat(m.media_id, m.kind, clip.n_samples, sum)
          case _ =>
            val img = codec.decodeImage(m.media_id, m.format, m.bytes)
            var sum = 0L; var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
            MediaStat(m.media_id, m.kind, img.pixels.length, sum)
        }).toOption
      }
    }(Encoders.product[MediaStat])

  /** Fixed-dim feature vector per media item: images mean-pool pixel
    * blocks, audio mean-pools sample windows — derived column is tiny,
    * so everything downstream (ANN join, dedup) shuffles floats, never
    * payload bytes.
    */
  def features(media: DataFrame, dim: Int = 16,
      codec: MediaCodec = StubCodec): Dataset[MediaFeature] =
    asMedia(media).mapPartitions { it =>
      it.flatMap { m =>
        scala.util.Try {
        val raw: Array[Float] = m.kind match {
          case "audio" => codec.decodeAudio(m.media_id, m.format, m.bytes).samples
          case _ =>
            val img = codec.decodeImage(m.media_id, m.format, m.bytes)
            img.pixels.map(b => (b & 0xff) / 255.0f)
        }
        // an empty decoded payload (e.g. a WAV with a zero-length data
        // chunk) yields the zero embedding — hi = max(lo+1, …) would
        // otherwise force a read of raw(0) and fail the task
        val emb =
          if (raw.isEmpty) new Array[Float](dim)
          else Array.tabulate(dim) { j =>
            // Long block bounds: j * raw.length overflows Int for
            // ~140M-element media (a 48MP image, a long WAV) and wraps
            // to a negative index
            val lo = (j.toLong * raw.length / dim).toInt
            val hi = math.max(lo + 1, ((j + 1).toLong * raw.length / dim).toInt)
            var s = 0.0f; var i = lo
            while (i < hi) { s += raw(i); i += 1 }
            s / (hi - lo)
          }
        MediaFeature(m.media_id, m.kind, emb)
        }.toOption // Try: same degrade-to-absent posture as payloadStats
      }
    }(Encoders.product[MediaFeature])

  /** Decodeless container metadata for MP4-family video and MP3 audio
    * via [[ContainerDemux]] — the REAL parser is the only path here
    * (no stub): duration, track counts, geometry, frame/bitrate stats
    * straight off the container headers, map-side like every operator
    * in this module. Rows whose payload fails the sniff (or whose
    * format neither parser owns) are dropped — corrupt media degrades
    * to absent metadata, never a task failure.
    */
  def containerMeta(media: DataFrame)
      : Dataset[ContainerDemux.ContainerMeta] =
    asMedia(media).mapPartitions { it =>
      it.flatMap(m => ContainerDemux.demux(m.media_id, m.format, m.bytes))
    }(Encoders.product[ContainerDemux.ContainerMeta])

  /** Video → sampled frames (1:N flatMap, still map-side). */
  def sampleFrames(media: DataFrame, everyNth: Int = 5,
      codec: MediaCodec = StubCodec): Dataset[Frame] = {
    // driver-side, before any task launches: a bad stride would
    // otherwise surface per-row inside executors — as an obscure
    // "step cannot be 0" Range error (stride 0) or, worse, silently
    // zero frames (negative stride) depending on the codec
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    asMedia(media.filter(col("kind") === "video")).mapPartitions { it =>
      it.flatMap(m => codec.frames(m.media_id, m.format, m.bytes, everyNth))
    }(Encoders.product[Frame])
  }

  /** Synthesize a media table from any (id, text) corpus — UTF-8 bytes
    * as stand-in payloads; kind/format assigned round-robin. Lets the
    * multimodal path run against the driver's `documents` testdata.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      element_at(lit(Array("jpeg", "pcm16", "mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("bytes"))
}
