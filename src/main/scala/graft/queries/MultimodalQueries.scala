package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal plumbing over the `documents` corpus (payload bytes are
  * the UTF-8 text — see Multimodal.mediaFromDocuments). Decode is the
  * StubCodec (deterministic fake); everything around it — binary
  * columns, partition-wise batch decode, typed outputs, map-side-only
  * movement of payloads — is the real engine path. Non-SQL-expressible
  * → rows-only driver check; shapes/determinism asserted in ScalaTest.
  */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q80_media_features",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(
          Tables.load(s, dir, "documents"))
        Multimodal.features(media, dim = 16).toDF()
          .select(col("media_id"), col("kind"),
            round(aggregate(col("embedding"), lit(0.0d),
              (acc, x) => acc + x * x), 6).as("sq_norm"))
          .orderBy(col("media_id"))
      },
      None,
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
      None),

    QueryDef(
      "q82_image_resize",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(
          Tables.load(s, dir, "documents"))
        val resized = Multimodal.resize(
          Multimodal.decodeImages(media), w = 8, h = 8).toDF()
        resized.select(col("media_id"), col("width"), col("height"),
            xxhash64(col("pixels")).as("pixel_hash"))
          .orderBy(col("media_id"))
      },
      None)
  )
}
