package graft

import org.apache.spark.sql.functions._
import graft.ext.{Decontam, Sampling}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationPairs: exact shared-distinct-gram counts, no false pairs") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words with zero overlap here today"),
      // doc 3 repeats the leaked gram twice — distinct count stays 1
      (3L, "alpha beta gamma delta and alpha beta gamma delta again"))
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "quick brown fox jumps somewhere else"),
      (101L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val pairs = Decontam.contaminationPairs(train, evalSet, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // train 1 shares "quick brown fox jumps" with eval 100;
    // train 3 shares "alpha beta gamma delta" with eval 101 (once,
    // distinct); train 2 shares nothing
    assert(pairs === Set((1L, 100L, 1L), (3L, 101L, 1L)))
  }

  test("mixtureResample: deterministic, mixture-shaped, layout-invariant") {
    val df = (0 until 2000).map { i =>
      (i.toLong, if (i % 10 < 7) "major" else "minor")
    }.toDF("id", "stratum")
    val weights = Map("major" -> 500000L, "minor" -> 500000L)
    val kept = Sampling.mixtureResample(df, "stratum", "id", weights)
    val counts = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // minor (600 rows) is the scarce stratum at 50/50 → N_target=1200,
    // each stratum targets 600: minor keeps ~everything, major
    // downsamples to ~600 of its 1400
    assert(counts("minor") > 500 && counts("minor") <= 600)
    assert(math.abs(counts("major") - 600) < 60,
      s"major kept ${counts("major")}, expected ≈600")
    // keep decision is per-row-stable: partition layout cannot move it
    val again = Sampling.mixtureResample(df.repartition(7), "stratum", "id", weights)
      .select("id").as[Long].collect().sorted
    assert(again === kept.select("id").as[Long].collect().sorted)
    // schema passthrough: helper columns dropped
    assert(kept.columns.toSeq === Seq("stratum", "id"))
  }

  test("mixtureResample: kept sets are hash-ranked — widening a gate nests them") {
    // when another stratum grows, a fixed stratum's target can only
    // rise (N_target is a min over strata); because rows are admitted
    // by a stable per-row hash rank, the old kept set must be a SUBSET
    // of the new one — no churn, only admission. (This is the property
    // that makes incremental re-mixing cheap at 100 TB: a mixture
    // re-balance only moves the marginal rows, never reshuffles the
    // kept corpus.)
    val base = (0 until 300).map(i => (i.toLong, "a")) ++
      (1000 until 1300).map(i => (i.toLong, "b"))
    val grown = base ++ (2000 until 2600).map(i => (i.toLong, "b"))
    val w = Map("a" -> 200000L, "b" -> 800000L)
    val keptBase = Sampling.mixtureResample(base.toDF("id", "stratum"),
      "stratum", "id", w).filter(col("stratum") === "a")
      .select("id").as[Long].collect().toSet
    val keptGrown = Sampling.mixtureResample(grown.toDF("id", "stratum"),
      "stratum", "id", w).filter(col("stratum") === "a")
      .select("id").as[Long].collect().toSet
    // base: N=min(300·5, 300·1.25)=375 → target_a=75;
    // grown: n_b=900 → N=1125 → target_a=225 — gate widened
    assert(keptBase.size < keptGrown.size)
    assert(keptBase.subsetOf(keptGrown))
  }
}
