package graft

import org.apache.spark.sql.functions._
import graft.ext.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: empirical rates track weights; deterministic for a seed") {
    val dim = Seq(("a", 1.0), ("b", 3.0), ("c", 6.0)).toDF("k", "w")
    val s1 = Sampling.weightedSample(dim, "w", 6000, seed = 7)
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum === 6000L)
    assert(math.abs(s1("c").toDouble / 6000 - 0.6) < 0.05, s1)
    assert(math.abs(s1("b").toDouble / 6000 - 0.3) < 0.05, s1)
    val s2 = Sampling.weightedSample(dim, "w", 6000, seed = 7)
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
  }

  test("weightedSample: every draw matches exactly one dim row (contiguous ranges)") {
    // weights chosen so fl(Σw)−w ≠ previous Σw in fp — with __lo
    // derived by subtraction these ranges gap/overlap; lag-built
    // ranges stay exactly contiguous so the join is 1:1 on draws
    val dim = Seq(("a", 0.1), ("b", 0.2), ("c", 0.3), ("d", 0.1),
      ("e", 0.2)).toDF("k", "w")
    val n = 5000
    val sampled = Sampling.weightedSample(dim, "w", n, seed = 11)
    assert(sampled.count() === n.toLong)
    assert(sampled.select(col("draw_id")).distinct().count() === n.toLong)
  }

  test("mixtureResample fails fast on a stratum the weights do not cover") {
    import graft.ext.Sampling
    val df = Seq((1L, "en"), (2L, "fr"), (3L, "de")).toDF("id", "stratum")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureResample(df, "stratum", "id",
        Map("en" -> 500000L, "fr" -> 500000L))
    }
    assert(e.getMessage.contains("de"), e.getMessage)
  }

  test("mixtureResample: NULL-stratum rows are dropped, not a permanent failure") {
    import graft.ext.Sampling
    // an untagged row can never be covered by a Map[String,Long]
    // weight — it must not make every call throw
    val df = Seq((1L, Some("en")), (2L, Some("fr")), (3L, None))
      .toDF("id", "stratum")
    val out = Sampling.mixtureResample(df, "stratum", "id",
      Map("en" -> 500000L, "fr" -> 500000L))
    assert(out.filter(col("stratum").isNull).count() === 0)
    assert(out.count() <= 2)
  }

  test("hashSplit: disjoint, complete, deterministic, ratio-faithful") {
    val docs = spark.range(20000).select(col("id").as("doc_id"))
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train").toDouble / 20000 - 0.8) < 0.02, counts)
    assert(math.abs(counts("val").toDouble / 20000 - 0.1) < 0.02, counts)
    // stable: same rows land in the same split on recompute
    val again = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.except(again).count() === 0)
    // growth-stable: adding rows never moves existing ones
    val bigger = Sampling.hashSplit(
      spark.range(40000).select(col("id").as("doc_id")), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(bigger.filter(col("doc_id") < 20000).except(split).count() === 0)
  }

  test("stratified sampleBy honours per-stratum fractions") {
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 2 === 0).cast("string").as("stratum"))
    val got = Sampling.stratified(df, "stratum",
      Map("true" -> 0.5, "false" -> 0.1), seed = 3)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("true").toDouble / 5000 - 0.5) < 0.07, got)
    assert(math.abs(got("false").toDouble / 5000 - 0.1) < 0.07, got)
  }
}
