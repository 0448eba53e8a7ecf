package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * `weightedSample` distributes the reference producer's weighted
  * product draw (`producer.py:131-134,203-204`: cumulative-weight
  * ladder + uniform draw + nearest match) as a DataFrame op: the
  * dimension's cumulative ranges are computed with one window pass,
  * draws range-join into them. For a dimension table that fits in a
  * broadcast (the usual case) the join is broadcast + residual range
  * predicate — no shuffle of the draws.
  *
  * `hashSplit` is THE reproducible train/val/test idiom at 100 TB:
  * bucket by a hash of a stable id — no shuffle, no state, stable
  * across runs/machines/engine versions, and rows never migrate
  * between splits when the dataset grows.
  *
  * NULL-id convention (uniform across the id-keyed operators here): a
  * row without a stable id has no deterministic hash, so it cannot be
  * split, ranked, or gated reproducibly — such rows are EXCLUDED from
  * the output (hashSplit, groupHashSample, mixtureResample all drop
  * them; filter or synthesize ids upstream if they must participate).
  * The alternatives are worse: xxhash64(NULL) returns the seed, which
  * would funnel every null-id row into ONE split deterministically,
  * and a NULL md5 rank sorts first, which would hand null-id rows
  * every stratum's top-k.
  */
object Sampling {

  /** Draw `n` rows (with replacement) from `dim`, each row weighted by
    * `weightCol` (weights must be positive). Deterministic for a fixed
    * seed INCLUDING across cluster layouts: the per-draw uniform is
    * derived from xxhash64(draw_id, seed) — a pure function of the
    * draw index — not from `rand(seed)`, which reseeds per PARTITION
    * (seed + partitionIndex) and so yields a different sample on a
    * 4-core laptop than on a 32-core executor for the same seed.
    */
  def weightedSample(dim: DataFrame, weightCol: String, n: Int,
      seed: Long = 42L): DataFrame = {
    require(!dim.columns.contains("draw_id"),
      "weightedSample: dim must not already have a draw_id column")
    // the ladder arithmetic below reads the aggregates with getDouble,
    // so the weight is cast up front: an integer weight column (counts
    // are the natural weights) would otherwise sum to LongType and
    // min to IntegerType and throw ClassCastException at the bounds
    // read instead of sampling. No-op for double inputs; the cast is
    // exact for longs up to 2^53.
    val wc = col(weightCol).cast("double")
    // content-hash tiebreak keeps the cumulative ranges deterministic
    // regardless of partition layout
    val w = Window.orderBy(wc,
      xxhash64(struct(dim.columns.toIndexedSeq.map(col): _*)))
    // __lo is the PREVIOUS row's __hi (lag), not __hi − weight: the
    // subtraction re-derives the prior cumulative sum in floating
    // point, and the rounding gap/overlap between fl(a+b)−b and a
    // lets a draw match zero or two rows at a range boundary
    val cum = dim
      .withColumn("__hi", sum(wc).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lo", coalesce(lag(col("__hi"), 1).over(w), lit(0.0)))
    val bounds = cum.agg(max(col("__hi")), min(wc)).head()
    // empty dim / all-NULL weights → a clear error, not a driver NPE;
    // non-positive weights → a clear error, not silently distorted
    // draw probabilities (a negative weight makes the ladder
    // non-monotone, so max(__hi) understates the positive mass)
    require(!bounds.isNullAt(0),
      "weightedSample: dim is empty or its weight column is all NULL")
    require(bounds.getDouble(1) > 0.0,
      s"weightedSample: weights must be positive, min=${bounds.getDouble(1)}")
    val total = bounds.getDouble(0)
    // uniform in [0, total): 20 high bits of the hash (exactly
    // representable in double) / 2^20 — draw-indexed, layout-free
    val draws = dim.sparkSession.range(n.toLong)
      .select(col("id").as("draw_id"))
      .withColumn("__r",
        shiftrightunsigned(xxhash64(col("draw_id"), lit(seed)), 44)
          .cast("double") / lit((1L << 20).toDouble) * lit(total))
    draws.join(broadcast(cum),
        col("__r") >= col("__lo") && col("__r") < col("__hi"))
      .drop("__r", "__lo", "__hi")
  }

  /** Deterministic hash split: assigns each row to the first named
    * split whose cumulative fraction covers `xxhash64(idCol) mod 10^6`.
    * Returns the input plus a `split` column. Map-side only.
    */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val buckets = 1000000L
    // xxhash64(NULL) returns the SEED, not NULL — unfiltered, every
    // null-id row would land deterministically in one split (silent
    // skew); the object-level NULL-id convention excludes them
    val df0 = df.filter(col(idCol).isNotNull)
    val h = pmod(xxhash64(col(idCol)), lit(buckets))
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr0: Column = lit(fractions.last._1)
    val split = fractions.map(_._1).zip(cuts).init.reverse
      .foldLeft(expr0) { case (acc, (name, cut)) =>
        when(h < (cut * buckets).toLong, lit(name)).otherwise(acc)
      }
    df0.withColumn("split", split)
  }

  /** Stratified sample: per-stratum fractions, seeded (builtin
    * sampleBy exposed at the engine surface for discoverability).
    */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Deterministic per-stratum fixed-size sample: the k rows of each
    * stratum with the smallest 60-bit md5 of their id — a reservoir
    * sample whose "random" order is a content hash, so membership is
    * reproducible across runs/engines/partitionings and replays in
    * the DuckDB oracle ([[Dedup.md5Hash60]] convention).
    *
    * Shape at 100 TB: one shuffle on the stratum key; the rank filter
    * plans as `WindowGroupLimit`, so each map task pre-prunes to its
    * local top-k before the shuffle — per-stratum state is O(k), never
    * stratum-scale. Returns the input plus a `sample_rank` column
    * (1-based within stratum).
    */
  def groupHashSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Dedup.md5Hash60(col(idCol).cast("string")), col(idCol))
    // NULL ids rank FIRST under ascending NULL ordering — they would
    // deterministically occupy every stratum's top-k; the object-level
    // NULL-id convention excludes them instead
    df.filter(col(idCol).isNotNull)
      .withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic domain-mixture resampling — the "data mixing" stage
    * of a training-data pipeline: downsample each stratum so the kept
    * set approximates the target mixture `weightsPpm` (parts per
    * million; must cover every stratum present) at the largest total
    * the scarcest stratum allows:
    *
    *   N_target = min_s floor(n_s · 10^6 / w_s)   (largest N with
    *                                               n_s ≥ w_s·N ∀s)
    *   keep row ⇔ (md5₆₀(id) mod 10^6) · n_s < target_s · 10^6
    *
    * Everything is integer arithmetic over a stable 60-bit md5 of the
    * row id ([[Dedup.md5Hash60]] convention) — no RNG state, so the
    * decision is reproducible across runs/engines/partitionings, rows
    * never migrate between kept/dropped as other strata grow, and the
    * whole operator replays exactly in the DuckDB oracle.
    *
    * Shape at 100 TB: one tiny stratum-count aggregate, broadcast of
    * the per-stratum gates back onto the corpus, map-side filter. The
    * corpus itself never shuffles. (No overflow headroom issues:
    * hash < 10^6 and n_s < 10^12 keeps the product under 2^63.)
    */
  def mixtureResample(df: DataFrame, strataCol: String, idCol: String,
      weightsPpm: Map[String, Long]): DataFrame = {
    require(weightsPpm.values.forall(_ >= 0L),
      "mixtureResample: weights must be non-negative (0 = drop stratum)")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toSeq.toDF(strataCol, "w_ppm")
    // a NULL stratum (untagged row) can never match a Map[String,Long]
    // weight — neither the weights join nor the fail-fast below can
    // cover it. Such rows are dropped from the mixture by definition
    // (a target mixture has no "unknown domain" share); excluding them
    // here keeps the coverage check from permanently rejecting any
    // corpus that contains one untagged row.
    val counts0 = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_stratum"))
    // fail fast on a stratum the weights don't cover: the inner joins
    // below would otherwise silently DELETE the whole stratum from the
    // curated corpus. One stratum-scale job — the same cardinality the
    // gates broadcast already assumes is tiny.
    val missing = counts0.join(w, Seq(strataCol), "left_anti")
      .select(col(strataCol)).collect().map(r => String.valueOf(r.get(0)))
    require(missing.isEmpty,
      s"mixtureResample: weightsPpm has no entry for strata present in " +
        s"df: ${missing.mkString(", ")}")
    // weight 0 = "exclude this domain": the stratum passes the
    // coverage check but joins out of the gates entirely (its rows
    // drop), and it must not constrain N_target — dividing by it
    // would be an ANSI DIVIDE_BY_ZERO crash
    val counts = counts0.join(w.filter(col("w_ppm") > 0L), Seq(strataCol))
    val nTarget = counts.agg(
      min(expr("n_stratum * 1000000 DIV w_ppm")).as("n_target_total"))
    val gates = counts.crossJoin(nTarget)
      .withColumn("n_target", expr("w_ppm * n_target_total DIV 1000000"))
      .select(col(strataCol), col("n_stratum"), col("n_target"))
    val h = pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(1000000L))
    df.join(broadcast(gates), Seq(strataCol))
      .filter(h * col("n_stratum") < col("n_target") * lit(1000000L))
      .drop("n_stratum", "n_target")
  }
}
