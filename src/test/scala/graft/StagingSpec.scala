package graft

import org.apache.spark.sql.functions._

/** Pins [[Staging.stagedSort]]'s contract: value- and order-identical
  * to a live `orderBy` over the same frame, with the sort's input
  * bounded to the staged file (the expensive plan runs exactly once —
  * the property that removed the range-sampling double execution and
  * the r5/r6 x30 sort-stall class; see the stagedSort scaladoc).
  */
class StagingSpec extends SparkSpec {

  test("stagedSort: rows and order identical to a live orderBy") {
    import spark.implicits._
    val df = Seq((3L, "c", -0.0), (1L, "a", 2.5), (2L, "b", Double.NaN),
      (1L, "z", 1.0)).toDF("k", "s", "x")
      .withColumn("y", col("x") * 2) // a computed column rides along
    val live = df.orderBy(col("k"), col("s")).collect()
    val staged = Staging.stagedSort(df, "spec-sort")(col("k"), col("s"))
      .collect()
    assert(staged.length === live.length)
    staged.zip(live).foreach { case (a, b) =>
      // bit-faithful compare (NaN, signed zero) — the driver gate's
      // standard, not ==
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getString(1) === b.getString(1))
      assert(java.lang.Double.doubleToRawLongBits(a.getDouble(2))
        === java.lang.Double.doubleToRawLongBits(b.getDouble(2)))
    }
  }

  test("stagedSort: the sort's plan reads the staged file, not the source plan") {
    import spark.implicits._
    val df = Seq((2L, 1L), (1L, 2L)).toDF("a", "b")
      .groupBy(col("a")).agg(sum(col("b")).as("s"))
    val sorted = Staging.stagedSort(df, "spec-plan")(col("a"))
    val p = sorted.queryExecution.executedPlan.toString
    assert(p.contains("graft-stage-spec-plan"), p)
    assert(!p.contains("HashAggregate"), p) // the expensive plan already ran
  }

}
