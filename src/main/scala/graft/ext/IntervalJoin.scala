package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval join — the scale path for interval
  * stabbing WITHOUT an equi key, where Spark's only native plan is a
  * broadcast-nested-loop (or worse, cartesian) join re-checking every
  * (point, interval) pair.
  *
  * Standard time-binning decomposition: pick a bin width, explode each
  * interval to the bins it touches (`sequence(lo_bin, hi_bin)` —
  * map-side, fan-out = interval length / width, bounded by
  * construction for bounded intervals), bin each point once, and
  * equi-join on the bin key before re-checking the exact range
  * predicate. Every candidate pair shares a bin, so the join is a
  * plain hash/sort-merge shuffle on the bin key: work scales with
  * points + interval-bins + TRUE matches, never |points|×|intervals|.
  * A point and an interval meet in at most one shared bin per overlap
  * — each (point, interval) pair can match in several bins only if
  * the point lies in the interval, so the pair appears exactly once
  * in the output without deduplication: the point's single bin is the
  * only one where both sides coexist.
  *
  * Bin-width tradeoff (the knob a 100 TB deployment tunes): wide bins
  * = fewer index rows, more false candidates re-checked; narrow bins
  * = the reverse. Interval skew (one interval spanning everything)
  * fans out that interval's index rows, not the points.
  */
object IntervalJoin {

  /** Join `points` (timestamp column `tsCol`) to `intervals`
    * (`loCol`/`hiCol` timestamps, inclusive) on containment, with
    * `binSeconds`-wide bins on the epoch axis. Returns
    * points-columns ++ intervals-columns for every containment pair.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      tsCol: String, loCol: String, hiCol: String,
      binSeconds: Long = 3600L): DataFrame = {
    // fail at the API edge, not as an ANSI DIVIDE_BY_ZERO (or garbage
    // negative bins) deep inside the join
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    // integer DIV on the epoch keeps the bin key exact (no double
    // division anywhere near a join key); column names ride in
    // backquoted so names with spaces/hyphens work like the col() API
    val pBin = expr(s"unix_timestamp(`$tsCol`) DIV $binSeconds")
    val loBin = expr(s"unix_timestamp(`$loCol`) DIV $binSeconds")
    val hiBin = expr(s"unix_timestamp(`$hiCol`) DIV $binSeconds")
    val binned = intervals.withColumn("bin", explode(sequence(loBin, hiBin)))
    points.withColumn("bin", pBin)
      .join(binned, Seq("bin"))
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("bin")
  }

  /** Interval×interval OVERLAP join (Allen: a.lo ≤ b.hi ∧ b.lo ≤ a.hi,
    * inclusive) under the same binning decomposition. Unlike the point
    * case, an overlapping pair shares EVERY bin their intersection
    * touches — so each candidate pair is kept only in the first such
    * bin, `max(a_lo_bin, b_lo_bin)` (the later-starting interval's
    * first bin, which both necessarily cover): exactly-once by
    * construction, no distinct over the pair set. Left/right column
    * sets must be disjoint (callers alias).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    def bins(df: DataFrame, lo: String, hi: String, tag: String) =
      df.withColumn(s"${tag}_lo_bin", expr(s"unix_timestamp(`$lo`) DIV $binSeconds"))
        .withColumn("bin", explode(sequence(
          col(s"${tag}_lo_bin"),
          expr(s"unix_timestamp(`$hi`) DIV $binSeconds"))))
    bins(left, lLo, lHi, "l")
      .join(bins(right, rLo, rHi, "r"), Seq("bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("bin") === greatest(col("l_lo_bin"), col("r_lo_bin")))
      .drop("bin", "l_lo_bin", "r_lo_bin")
  }
}
