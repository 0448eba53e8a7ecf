package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps
  * the test run fast; UTC + small shuffle width everywhere).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val scratch = java.nio.file.Files.createTempDirectory("graft-warehouse")
    System.setProperty("derby.system.home", scratch.toString)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      // mirrors GraftSession: the driver corpus' events.parquet is
      // TIMESTAMP(NANOS) and must scan as raw longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf, must be set at build: ThriftServerSpec registers
      // temp views and reads them over JDBC through the shared session
      .config("spark.sql.hive.thriftserver.single.session", "true")
      // mirrors GraftSession: composite pipelines compile ~92 codegen
      // fragments — the default 100-entry cache self-evicts across a
      // suite run and every suite re-pays Janino + JIT warmup (sizing
      // rationale and the 256-vs-1000 A/B: see GraftSession)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
