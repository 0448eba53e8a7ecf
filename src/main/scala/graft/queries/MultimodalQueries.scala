package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal plumbing over the `documents` corpus (payload bytes are
  * the UTF-8 text — see Multimodal.mediaFromDocuments). Decode is the
  * StubCodec (deterministic fake); everything around it — binary
  * columns, partition-wise batch decode, typed outputs, map-side-only
  * movement of payloads — is the real engine path.
  *
  * StubCodec synthesis is 60-bit-md5-based integer arithmetic, so the
  * decode/resize/frame-demux outputs replay exactly in the DuckDB
  * oracle (hash-checked driver rows, not rows-only counts): each
  * oracle recomputes `h = CAST(('0x'||substr(md5(chr(seed)||text),1,
  * 15)) AS BIGINT)` and replays the same shift/xor/mod synthesis over
  * a generate_series. Float paths (mean-pool embeddings, audio sample
  * values) stay spec-checked — MultimodalSpec — because float
  * accumulation order is not replayable bit-exactly in SQL; the
  * queries below expose the integer contracts (counts, dims, byte
  * checksums) instead.
  */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q80_media_features",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(
          Tables.load(s, dir, "documents"))
        Multimodal.payloadStats(media).toDF()
          .orderBy(col("media_id"))
      },
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                 CAST(('0x'||substr(md5(chr(1)||text),1,15)) AS BIGINT) AS h1,
                 CAST(('0x'||substr(md5(chr(2)||text),1,15)) AS BIGINT) AS h2
          FROM documents),
        sized AS (
          SELECT media_id, kind,
                 CASE WHEN kind = 'audio' THEN 256 + (h2 % 769)
                      ELSE (16 + (h1 % 49)) * (16 + ((h1 >> 8) % 49)) * 3
                 END AS n_raw,
                 CASE WHEN kind = 'audio' THEN h2 ELSE h1 END AS h
          FROM m),
        vals AS (
          SELECT media_id, kind, n_raw,
                 CASE WHEN kind = 'audio' THEN (h >> (i % 56)) & 255
                      ELSE xor(h >> (i % 56), i) & 255 END AS v
          FROM sized, generate_series(0, 12287) AS g(i)
          WHERE i < n_raw)
        SELECT media_id, kind, CAST(n_raw AS INT) AS n_raw,
               CAST(SUM(v) AS BIGINT) AS raw_checksum
        FROM vals
        GROUP BY media_id, kind, n_raw
        ORDER BY media_id"""),
      headline = true),

    QueryDef(
      "q81_video_frames",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(
          Tables.load(s, dir, "documents"))
        Multimodal.sampleFrames(media, everyNth = 5).toDF()
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(col("width").cast("bigint")).as("total_width"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id AS media_id,
                 CAST(('0x'||substr(md5(chr(3)||text),1,15)) AS BIGINT) AS h3
          FROM documents WHERE doc_id % 3 = 2),
        nf AS (SELECT media_id, h3, 8 + (h3 % 25) AS n_total FROM v),
        fr AS (
          SELECT media_id, xor(h3, i << 17) AS hf
          FROM nf, generate_series(0, 30, 5) AS g(i)
          WHERE i < n_total)
        SELECT media_id, COUNT(*) AS n_frames,
               CAST(SUM(16 + (hf % 49)) AS BIGINT) AS total_width
        FROM fr GROUP BY media_id ORDER BY media_id""")),

    QueryDef(
      "q82_image_resize",
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(
          Tables.load(s, dir, "documents"))
        val resized = Multimodal.resize(
          Multimodal.decodeImages(media), w = 8, h = 8)
        resized.map(i => (i.media_id, i.width, i.height, i.channels,
            i.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))))
          .toDF("media_id", "width", "height", "channels", "pix_sum")
          .orderBy(col("media_id"))
      },
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id,
                 CAST(('0x'||substr(md5(chr(1)||text),1,15)) AS BIGINT) AS h
          FROM documents WHERE doc_id % 3 = 0),
        dims AS (
          SELECT media_id, h, 16 + (h % 49) AS w, 16 + ((h >> 8) % 49) AS ht
          FROM m),
        src AS (
          SELECT media_id, h,
                 (((i // 24) * ht // 8) * w
                   + ((i // 3) % 8) * w // 8) * 3 + (i % 3) AS si
          FROM dims, generate_series(0, 191) AS g(i))
        SELECT media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
               CAST(3 AS INT) AS channels,
               CAST(SUM(xor(h >> (si % 56), si) & 255) AS BIGINT) AS pix_sum
        FROM src GROUP BY media_id ORDER BY media_id"""))
  )
}
