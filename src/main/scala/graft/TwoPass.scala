package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two-pass global-order mechanism (the q139 idiom, PlanSpec-
  * asserted to contain no `Exchange SinglePartition`): range-partition
  * on the total-order keys, FREEZE the partition id over a staged
  * copy, compute the per-partition local window, then collect the
  * ≤`partitions` per-partition aggregates and fold them into exclusive
  * prefix offsets that broadcast-join back. At 100 TB the only global
  * coordination is a `partitions`-row driver fold.
  *
  * This object owns the COUNT fold (global row numbering — the copy
  * that used to live separately in q156 and q162); the MAX and SUM
  * folds (q165 running max, q139 revenue prefix sum) differ in their
  * window/fold arithmetic and remain at their call sites.
  */
object TwoPass {

  /** Append `rnName` = 1-based global row number of each row under the
    * total order `orderCols`. Ties within equal keys are broken by the
    * local window's order, so pass a key prefix that is unique for a
    * deterministic result (every call site does).
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], rnName: String,
      partitions: Int = 32, tag: String = "rownum"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = Staging.checkpoint(
      df.repartitionByRange(partitions, orderCols: _*)
        .withColumn("__pid", spark_partition_id()), tag)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val parts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .orderBy(col("__pid")).collect()
    var acc = 0L
    val offsets = parts.toSeq.map { r =>
      val o = r.getAs[Int]("__pid") -> acc
      acc += r.getAs[Long]("n"); o
    }
    val offsetDf = df.sparkSession.createDataFrame(offsets)
      .toDF("__pid", "__off")
    ranged
      .withColumn("__rn", row_number().over(wLocal).cast("bigint"))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rnName, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }
}
