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

  test("weightedSample: integer weight columns sample (and match their double twin)") {
    // counts are the natural weights; sum(int)→Long / min(int)→Int
    // would throw ClassCastException at the bounds read without the
    // up-front double cast. Same values as ints and doubles must also
    // pick the SAME draws (the cast is exact).
    val ints = Seq(("a", 1), ("b", 3), ("c", 6)).toDF("k", "w")
    val dbls = Seq(("a", 1.0), ("b", 3.0), ("c", 6.0)).toDF("k", "w")
    def draws(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "w", 500, seed = 7)
        .select("draw_id", "k").as[(Long, String)].collect().toSet
    assert(draws(ints) === draws(dbls))
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

  test("weightedSample: dim with an `id` column survives; dirty dims fail fast") {
    // spark.range's internal id used to collide: withColumnRenamed
    // renamed BOTH ids to draw_id → ambiguous downstream references
    val dim = Seq((1L, "a", 1.0), (2L, "b", 3.0)).toDF("id", "k", "w")
    val out = Sampling.weightedSample(dim, "w", 100, seed = 5)
    assert(out.columns.count(_ == "draw_id") === 1)
    assert(out.columns.contains("id")) // the DIM's id survives untouched
    assert(out.select("draw_id").distinct().count() === 100L)
    // non-positive weights silently distort every draw probability —
    // the ladder max understates the positive mass
    val neg = Seq(("a", 5.0), ("b", -3.0), ("c", 4.0)).toDF("k", "w")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.weightedSample(neg, "w", 10)
    }
    assert(e1.getMessage.contains("positive"))
    // empty dim → named error, not a driver NPE
    val e2 = intercept[IllegalArgumentException] {
      Sampling.weightedSample(dim.filter(lit(false)), "w", 10)
    }
    assert(e2.getMessage.contains("empty"))
  }

  test("weightedSample draws are a pure function of (draw_id, seed), not layout") {
    // rand(seed) reseeds per PARTITION, so the old implementation
    // sampled differently under a different default parallelism; the
    // hash-derived uniform must give the same assignment no matter how
    // the session is laid out — pinned as a golden assignment
    val dim = Seq(("a", 1.0), ("b", 3.0)).toDF("k", "w")
    val got = Sampling.weightedSample(dim, "w", 8, seed = 7)
      .orderBy("draw_id").select("k").collect().map(_.getString(0)).toSeq
    val again = Sampling.weightedSample(dim, "w", 8, seed = 7)
      .orderBy("draw_id").select("k").collect().map(_.getString(0)).toSeq
    assert(got === again)
    // ~3:1 mixture sanity on the pinned assignment
    assert(got.count(_ == "b") >= 4, got)
  }

  test("hashSplit and groupHashSample exclude NULL-id rows (documented convention)") {
    // xxhash64(NULL) = the seed → all null-id rows would land in ONE
    // split; a NULL md5 rank sorts first → null-id rows would own
    // every stratum's top-k
    val docs = Seq((Some(1L), "g"), (None, "g"), (Some(2L), "g"))
      .toDF("doc_id", "g")
    val split = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 1.0))
    assert(split.count() === 2)
    assert(split.filter(col("doc_id").isNull).count() === 0)
    val sampled = Sampling.groupHashSample(docs, "g", "doc_id", k = 3)
    assert(sampled.count() === 2)
    assert(sampled.filter(col("doc_id").isNull).count() === 0)
  }

  test("mixtureResample: weight 0 drops the stratum without constraining the rest") {
    // 0 ppm = "exclude this domain": previously an ANSI DIVIDE_BY_ZERO
    val df = (1L to 40L).map(i => (i, if (i % 2 == 0) "en" else "spam"))
      .toDF("id", "stratum")
    val out = Sampling.mixtureResample(df, "stratum", "id",
      Map("en" -> 1000000L, "spam" -> 0L))
    assert(out.filter(col("stratum") === "spam").count() === 0)
    assert(out.filter(col("stratum") === "en").count() === 20) // unconstrained
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureResample(df, "stratum", "id",
        Map("en" -> 1000000L, "spam" -> -5L))
    }
    assert(e.getMessage.contains("non-negative"))
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
