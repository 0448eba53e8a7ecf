package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump `explain("formatted")` of selected registered queries to
  * per-query text files — the before/after plan evidence the
  * optimization rounds commit under `plans/r<N>/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query ...]
  * (no query args = every headline query). Queries whose construction
  * stages intermediates eagerly (minhash candidates, truth pairs) run
  * those stages at the chosen sfDir — keep it small (default
  * sf0.001 via SPARK_GRAFT_SF_DIR).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val suffix = args.lift(1).getOrElse("before")
    val names =
      if (args.length > 2) args.drop(2).toSeq else SparkEntry.headlines
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.create("local[8]", "8")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
