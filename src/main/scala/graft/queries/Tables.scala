package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet corpus
  * (`/root/repo/TESTDATA.md`). One parquet file per table; the scale
  * factor is encoded in the directory the driver passes in.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loader is the single seam where that swap happens (same DataFrame
  * downstream), so every query stays storage-agnostic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. GraftSession sets the legacy nanosAsLong conf so
      // the scan yields raw nanos; convert with INTEGER division (a
      // double division would lose precision at ~1.7e18 ns) — values
      // are µs-grained, so this is lossless. The loader itself is
      // side-effect free (no session mutation).
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (scalar
    * subqueries, EXISTS, set ops) run against the same corpus. Idempotent.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
