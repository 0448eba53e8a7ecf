package graft.tools

import org.apache.spark.sql.functions._

/** Dump the minhash CANDIDATE pipeline's physical plan in both
  * formulations — the registered q65 plan only shows the staged-sort
  * tail (candidates execute eagerly at query construction), so the
  * r21 before/after evidence for the signature/banding fusion needs
  * the subplans dumped directly. "before" = the explode + 64-column
  * aggregate + interpreted banding (minhashSignatures over
  * explodedShingles + lshBands, still in-tree as the spec reference);
  * "after" = the fused lshBandRows path minhashDupPairs actually runs.
  *
  * Usage: runMain graft.tools.PlanDumpMinhash <outDir>
  */
object PlanDumpMinhash {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.create("local[8]", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    def pairsFrom(bandRows: org.apache.spark.sql.DataFrame) = bandRows
      .groupBy(col("band_id"), col("band_hash"))
      .agg(graft.functions.BoundedCollect.collectIds(col("doc_id"), 1000)
        .as("ids"))
      .select(explode(col("ids")).as("doc_id_a"), col("ids"))
      .select(col("doc_id_a"), explode(col("ids")).as("doc_id_b"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .distinct()
    val legacy = pairsFrom(
      graft.ext.Dedup.minhashSignatures(
          graft.ext.Dedup.explodedShingles(docs, "doc_id", "text"), 64)
        .select(col("doc_id"),
          explode(graft.ext.Dedup.lshBands(col("sig"), 16, 4)).as("band"))
        .select(col("doc_id"), col("band.band_id").as("band_id"),
          col("band.band_hash").as("band_hash")))
    val fused = pairsFrom(
      graft.ext.Dedup.lshBandRows(docs, "doc_id", "text", 64, 16))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    Seq("minhash_candidates_before" -> legacy,
        "minhash_candidates_after" -> fused).foreach { case (name, df) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"[plandump] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
