package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a small text payload standing in for an image"),
    (2L, "another payload with different bytes entirely"),
    (3L, "video-ish payload for the frame sampler to chew on"),
    (4L, "audio payload with some more words in it here"),
    (5L, "fifth payload rounds out the tiny corpus"),
    (6L, "sixth payload so every kind appears twice")).toDF("doc_id", "text")
  private val media = Multimodal.mediaFromDocuments(docs)

  test("media table: binary payload + kind/format metadata, all three kinds") {
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    val row = media.filter(col("media_id") === 1L).head()
    assert(row.getAs[Array[Byte]]("bytes") !== null)
  }

  test("decode + features: deterministic, fixed-dim, partition-count invariant") {
    val f1 = Multimodal.features(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    val f2 = Multimodal.features(media.repartition(5), dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(f1 === f2)                       // map-side op ⇒ layout-independent
    assert(f1.values.forall(_.size === 16)) // fixed batch shape
    assert(f1(1L) !== f1(2L))               // content-sensitive
  }

  test("resize: exact target dims, deterministic pixels") {
    val imgs = Multimodal.decodeImages(media)
    val resized = Multimodal.resize(imgs, 8, 8).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(i => i.width === 8 && i.height === 8
      && i.pixels.length === 8 * 8 * i.channels))
    val again = Multimodal.resize(Multimodal.decodeImages(media), 8, 8)
      .collect().map(i => i.media_id -> i.pixels.toSeq).toMap
    assert(resized.map(i => i.media_id -> i.pixels.toSeq).toMap === again)
  }

  test("frame sampling: 1:N flatMap honours stride") {
    val every1 = Multimodal.sampleFrames(media, everyNth = 1).collect()
      .groupBy(_.media_id).view.mapValues(_.length).toMap
    val every5 = Multimodal.sampleFrames(media, everyNth = 5).collect()
      .groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(every1.nonEmpty)
    every5.foreach { case (id, n) =>
      assert(n === (every1(id) + 4) / 5, s"media $id")
    }
  }

  test("frame sampling: bad stride fails fast on the driver, not per-row in tasks") {
    // without the guard, everyNth=0 surfaces as an obscure "step
    // cannot be 0" Range error inside executor tasks (StubCodec), and
    // a negative stride silently yields zero frames
    val e = intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(media, everyNth = 0)
    }
    assert(e.getMessage.contains("everyNth"), e.getMessage)
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(media, everyNth = -1)
    }: Unit
  }
}

class ApproxAggSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact; approx median within p40–p60") {
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = lineitem.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      count_distinct(col("l_partkey")).as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("amed"),
      expr("percentile(l_extendedprice, 0.4)").as("p40"),
      expr("percentile(l_extendedprice, 0.6)").as("p60")).head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
    assert(r.getDouble(2) >= r.getDouble(3) && r.getDouble(2) <= r.getDouble(4))
  }
}
