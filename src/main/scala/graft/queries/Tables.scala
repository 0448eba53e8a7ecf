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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across driver corpus generations, so branch
      // on the scanned type instead of assuming one encoding:
      //  - NANOS scans as raw LongType (GraftSession sets the legacy
      //    nanosAsLong conf — Spark's vectorized reader has no nanos
      //    type); convert with INTEGER division (a double division
      //    would lose precision at ~1.7e18 ns) — values are µs-grained,
      //    so this is lossless.
      //  - MICROS (isAdjustedToUTC=false) scans as TIMESTAMP_NTZ;
      //    cast to TIMESTAMP — wall-clock preserving under the UTC
      //    session timezone every graft session pins.
      // Either way downstream queries see one type: TIMESTAMP (UTC).
      // The loader itself is side-effect free (no session mutation).
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (scalar
    * subqueries, EXISTS, set ops) run against the same corpus. Idempotent.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
