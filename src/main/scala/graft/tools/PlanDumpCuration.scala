package graft.tools

import org.apache.spark.sql.functions._

/** Dump the q86/q151 exact-dedup STAGE's physical plan in both
  * formulations — the registered q86 plan only shows the packing tail
  * (s0 executes eagerly into a staged file at query construction), so
  * the r22 before/after evidence for the winner-window rewrite needs
  * the staged subplan dumped directly. "before" = groupBy(md5) + min
  * with the left-semi join back (three exchanges); "after" = the
  * digest-partitioned min window the pipeline actually stages now
  * (one exchange).
  *
  * Usage: runMain graft.tools.PlanDumpCuration <outDir>
  */
object PlanDumpCuration {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r22")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.create("local[8]", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    val kept = docs.filter(graft.ext.TextAnalysis.qualityFilter(col("text"),
      minTokens = 20, maxTokens = 150, maxPunctRatio = 0.05) === "keep")
    val legacy = kept.join(
      kept.groupBy(md5(col("text")).as("hsh"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val window = kept
      .withColumn("min_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("min_id")).drop("min_id")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.writeString(p, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)): Unit
      println(s"[plandump] wrote $p")
    }
    dump(legacy, "q86_s0_stage_before.txt")
    dump(window, "q86_s0_stage_after.txt")
    spark.stop()
  }
}
