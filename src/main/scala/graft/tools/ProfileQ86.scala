package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: attribute the q86 curation cascade's cost to its
  * stages — quality filter + exact dedup + s0 stage write, the LSH
  * candidate build (eager inside minhashDupPairs), the verify join +
  * connected components (executed by the union-find collect), and the
  * anti-join + packing + bin aggregate tail.
  *
  * Usage: runMain graft.tools.ProfileQ86 <sfDir> [copies] [repeat]
  */
object ProfileQ86 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 1
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val corpus =
      if (copies <= 1) dir else graft.Bench.buildScaledCorpus(spark, dir, copies)
    import graft.ext.{Dedup, Packing, TextAnalysis}
    (1 to repeat).foreach { i =>
      spark.catalog.clearCache(); System.gc()
      val docs = graft.queries.Tables.load(spark, corpus, "documents")
      val kept = docs.filter(TextAnalysis.qualityFilter(col("text"),
        minTokens = 20, maxTokens = 150, maxPunctRatio = 0.05) === "keep")
      val exactWinners = kept
        .groupBy(md5(col("text")).as("hsh"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      var s0: org.apache.spark.sql.DataFrame = null
      val tS0 = timed {
        s0 = graft.Staging.checkpoint(
          kept.join(exactWinners, Seq("doc_id"), "left_semi"), "prof-s0")
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      val tCand = timed {
        // minhashDupPairs runs its candidate build + stage + count
        // EAGERLY at call time; the verify join stays lazy
        pairs = Dedup.minhashDupPairs(s0, "doc_id", "text", threshold = 0.3)
      }
      var losers: org.apache.spark.sql.DataFrame = null
      val tCc = timed {
        // connectedComponents collects the pair set -> this phase pays
        // the verify join + the driver union-find + label frame build
        losers = Dedup.connectedComponents(pairs)
          .filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id"))
      }
      val s1 = s0.join(losers, Seq("doc_id"), "left_anti")
      val sized = s1.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .withColumn("shard", pmod(col("doc_id"), lit(4L)))
      val tTail = timed {
        Packing.packByTokenBudget(sized, col("shard"), col("doc_id"),
            col("n_tokens"), budget = 2000L)
          .groupBy(col("shard"), col("bin_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("shard"), col("bin_id"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[q86] run $i: s0(filter+dedup+stage) $tS0%.2f  " +
        f"candidates $tCand%.2f  verify+cc $tCc%.2f  tail(pack+sort) $tTail%.2f  " +
        f"total ${tS0 + tCand + tCc + tTail}%.2f")
    }
    spark.stop()
  }
}
