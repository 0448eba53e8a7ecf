package graft

import org.apache.spark.sql.functions.col

/** File-layout invariance net: the same corpus written as ONE parquet
  * file per table vs SEVEN files per table changes scan-task
  * boundaries — and with them partial-aggregation grouping and
  * summation order, the exact nondeterminism the repo's fixed-point
  * and rounding conventions exist to absorb (the driver regenerates
  * its corpus with whatever file layout its writer picks, so a
  * layout-sensitive query is a future red row waiting to happen).
  *
  * Runs the shared degenerate-group pick slice plus the
  * summation-order-sensitive families the signed-zero sweep touched
  * (raw-double stat aggs q08, vector means q75, Fisher ratios q169,
  * fixed-point JSD q155) and requires COLLECTED results to be
  * identical — not approximately equal — across layouts.
  */
class FileLayoutInvarianceSpec extends SparkSpec {

  test("pick slice + summation-sensitive queries are file-layout-invariant") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(src).isDirectory)
    val one = tmpDir("layout-1f")
    val seven = tmpDir("layout-7f")
    graft.queries.Tables.names.foreach { t =>
      val d = graft.queries.Tables.load(spark, src, t)
      d.coalesce(1).write.mode("overwrite").parquet(s"$one/$t.parquet")
      d.repartition(7).write.mode("overwrite").parquet(s"$seven/$t.parquet")
    }
    val names = graft.queries.DegenShadow.picks ++ Seq(
      "q08_stat_aggs", "q75_label_centroids",
      "q169_fisher_separability", "q155_source_divergence",
      // the fixed-point families: each exists BECAUSE its naive form
      // is summation-order-sensitive, so each must prove the floor
      // convention actually bought layout invariance
      "q94_tfidf_topk", "q105_corpus_datasheet", "q118_decayed_value",
      "q123_collocations", "q138_benford_screen", "q141_pagerank",
      "q152_bpe_pair_stats", "q166_psi_drift")
    val failures = names.flatMap { name =>
      val run = SparkEntry.queries(name)
      def rows(dir: String): Seq[String] =
        // total order on every output (queries end in orderBy; the
        // toString compare keeps -0.0 vs 0.0 and NaN bit-visible the
        // way the driver's hash is)
        run(spark, dir).collect().map(_.toString).toSeq
      try {
        val a = rows(one)
        val b = rows(seven)
        if (a == b) None
        else Some(s"$name: ${a.size}/${b.size} rows, first diff: " +
          a.zip(b).collectFirst { case (x, y) if x != y => s"$x vs $y" }
            .getOrElse("row-count mismatch"))
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} " +
          String.valueOf(e.getMessage).take(120))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries are file-layout-SENSITIVE:\n" +
        failures.mkString("\n"))
  }

  test("minhash pair search is file-layout-invariant end to end") {
    // the operator family with the most summation-order surface
    // (shingles -> 64 seeded hash mins -> band grouping -> verify):
    // candidate sets and exact-Jaccard scores must not move with task
    // boundaries
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(src).isDirectory)
    val docs = graft.queries.Tables.load(spark, src, "documents")
    def pairs(parts: Int): Seq[String] =
      graft.ext.Dedup.minhashDupPairs(
        docs.repartition(parts), "doc_id", "text", threshold = 0.3)
        .orderBy(col("doc_id_a"), col("doc_id_b"))
        .collect().map(_.toString).toSeq
    assert(pairs(1) === pairs(7))
  }
}
