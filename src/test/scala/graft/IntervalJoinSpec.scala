package graft

import org.apache.spark.sql.functions._
import graft.ext.IntervalJoin

/** Binned point-in-interval join vs a brute-force nested-loop twin —
  * plus the boundary cases binning gets wrong when off by one:
  * points exactly on interval endpoints, intervals spanning many
  * bins, bin-edge-straddling containment, empty results.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val points = Seq(
    ("p1", ts("2024-01-01 10:00:00")), // == lo of i1
    ("p2", ts("2024-01-01 11:59:59")), // == hi of i1
    ("p3", ts("2024-01-01 12:00:00")), // just past i1
    ("p4", ts("2024-01-01 03:30:00")), // inside the long i2 only
    ("p5", ts("2024-01-02 09:00:00"))  // inside nothing
  ).toDF("pid", "ts")

  private val intervals = Seq(
    ("i1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:59:59")),
    ("i2", ts("2024-01-01 00:00:00"), ts("2024-01-01 23:00:00")), // 24 bins
    ("i3", ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00"))  // no points
  ).toDF("iid", "lo", "hi")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select("pid", "iid").as[(String, String)].collect().toSet

  test("matches the brute-force nested-loop twin exactly (incl. boundaries)") {
    val expected = pairsOf(points.crossJoin(intervals)
      .filter(col("ts") >= col("lo") && col("ts") <= col("hi")))
    val got = pairsOf(IntervalJoin.pointInInterval(
      points, intervals, "ts", "lo", "hi", binSeconds = 3600L))
    assert(got === expected)
    assert(got === Set("p1" -> "i1", "p2" -> "i1", "p1" -> "i2",
      "p2" -> "i2", "p3" -> "i2", "p4" -> "i2"))
  }

  test("each containment pair appears exactly once despite multi-bin intervals") {
    val out = IntervalJoin.pointInInterval(
      points, intervals, "ts", "lo", "hi", binSeconds = 3600L)
    assert(out.count() === out.select("pid", "iid").distinct().count())
  }

  test("bin width is a pure knob: 1s, 1min, 1day all give the same answer") {
    val hourly = pairsOf(IntervalJoin.pointInInterval(
      points, intervals, "ts", "lo", "hi", 3600L))
    for (w <- Seq(1L, 60L, 86400L))
      assert(pairsOf(IntervalJoin.pointInInterval(
        points, intervals, "ts", "lo", "hi", w)) === hourly, s"width=$w")
  }

  private val others = Seq(
    ("j1", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")), // overlaps i1+i2
    ("j2", ts("2024-01-01 23:00:00"), ts("2024-01-02 02:00:00")), // touches i2's hi exactly
    ("j3", ts("2024-01-02 05:00:00"), ts("2024-01-02 06:00:00"))  // overlaps nothing
  ).toDF("jid", "jlo", "jhi")

  private def overlapPairs(w: Long): Set[(String, String)] =
    IntervalJoin.intervalOverlap(
        intervals, others, "lo", "hi", "jlo", "jhi", binSeconds = w)
      .select("iid", "jid").as[(String, String)].collect().toSet

  test("overlap join matches the brute-force twin, incl. the touching-endpoint pair") {
    val expected = intervals.crossJoin(others)
      .filter(col("lo") <= col("jhi") && col("jlo") <= col("hi"))
      .select("iid", "jid").as[(String, String)].collect().toSet
    assert(overlapPairs(3600L) === expected)
    assert(expected === Set("i1" -> "j1", "i2" -> "j1", "i2" -> "j2"))
  }

  test("overlap pairs emerge exactly once despite sharing many bins") {
    // i2 and j1 share 13 hourly bins; the max-of-start-bins assignment
    // must keep exactly one
    val out = IntervalJoin.intervalOverlap(
      intervals, others, "lo", "hi", "jlo", "jhi", 3600L)
    assert(out.count() === out.select("iid", "jid").distinct().count())
    for (w <- Seq(60L, 86400L)) assert(overlapPairs(w) === overlapPairs(3600L))
  }
}
