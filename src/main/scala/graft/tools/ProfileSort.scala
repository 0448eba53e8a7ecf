package graft.tools

/** Dev utility: per-query A/B of the two presentation-sort shapes —
  * live `orderBy` over the full plan vs [[graft.Staging.stagedSort]]
  * (stage the output-scale result, sort the file). One JVM, alternating
  * arms, min-of-n per arm: the keep/revert evidence for each converted
  * query (a staged sort wins only where the range sampler's second
  * traversal costs more than the parquet round-trip).
  *
  * Usage: runMain graft.tools.ProfileSort <sfDir> [copies] [pairs]
  *   copies > 1 runs over a Bench.buildScaledCorpus corpus instead.
  */
object ProfileSort {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 1
    val pairs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val corpus =
      if (copies <= 1) dir else graft.Bench.buildScaledCorpus(spark, dir, copies)
    val queries = Seq(
      "q64_ngram_jaccard", "q65_minhash_dedup", "q72_ann_lsh",
      "q86_curation_pipeline", "q89_decontamination", "q94_tfidf_topk",
      "q96_unigram_surprisal", "q103_paragraph_dedup",
      "q125_substring_spans", "q140_bloom_decontam",
      "q161_minhash_error_audit")
    def run(name: String, staged: Boolean): Double = {
      spark.catalog.clearCache(); System.gc()
      graft.Staging.sortStagingEnabled = staged
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, corpus)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[absort] $name failed: ${e.getMessage}")
        -1.0
      } finally graft.Staging.sortStagingEnabled = true
    }
    queries.foreach { name =>
      // alternate arms so drift (JIT, cleaner, page cache) hits both
      val live = scala.collection.mutable.ArrayBuffer[Double]()
      val staged = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to pairs).foreach { _ =>
        live += run(name, staged = false)
        staged += run(name, staged = true)
      }
      def fmt(ts: Seq[Double]) =
        ts.map(t => f"$t%.2f").mkString("[", ",", "]")
      println(f"[absort] $name%-28s live min ${live.min}%.2f ${fmt(live.toSeq)}  staged min ${staged.min}%.2f ${fmt(staged.toSeq)}  ratio ${staged.min / live.min}%.2f")
    }
    spark.stop()
  }
}
