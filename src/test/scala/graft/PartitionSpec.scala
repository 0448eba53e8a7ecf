package graft

import org.apache.spark.sql.functions._

class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned layout prunes at the scan (the Silver/Gold layout bet)") {
    val out = tmpDir("orders-by-year")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)
    val q = spark.read.parquet(out).filter(col("o_year") === 1997)
      .agg(count(lit(1)).as("n"))
    val n = q.head().getLong(0)
    assert(n > 0 && n < orders.count())
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).get
    // partition filter present, nothing pushed as a data filter
    assert(scan.contains("PartitionFilters: [isnotnull(o_year"), scan)
    assert(scan.contains("(o_year"), scan)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    val out = tmpDir("lineitem-by-rf")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val fact = spark.read.parquet(out)
    val dim = Seq(("R", "returned")).toDF("flag", "label")
    val q = fact.join(dim, col("l_returnflag") === col("flag"))
      .agg(sum(col("l_quantity")).as("qty"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the fact scan carries a runtime partition filter from the dim side
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
  }
}

class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  test("session_window builtin agrees with the lag-based sessionization on gap semantics") {
    // one user, events at 0, 10, 20, 70, 75, 200 minutes; 30-min gap →
    // sessions {0,10,20}, {70,75}, {200}
    val base = java.sql.Timestamp.valueOf("2025-06-01 00:00:00").getTime
    val events = Seq(0, 10, 20, 70, 75, 200).zipWithIndex.map { case (m, i) =>
      (1L, i.toLong, new java.sql.Timestamp(base + m * 60000L), 1.0)
    }.toDF("user_id", "event_id", "ts", "value")
    val sessions = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("v"))
      .orderBy(col("session_window.start"))
      .collect()
    assert(sessions.map(_.getAs[Long]("n_events")).toSeq === Seq(3, 2, 1))
  }
}
