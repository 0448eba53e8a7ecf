package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the round-4 tokenizer/curation additions: q152's
  * BPE pair counting, q153's survivorship-policy dedup, q154's
  * fertility arithmetic — each on constructed corpora where the right
  * answer is checkable by hand (the DuckDB oracle gate covers the
  * driver corpus; these pin the SEMANTICS on adversarial shapes the
  * synthetic corpus may not contain).
  */
class TokenizerStatsSpec extends SparkSpec {

  /** Write a documents.parquet in the driver layout under a tmp dir. */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("tok-stats")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q152: pair counts weight by word frequency, with multiplicity inside a word") {
    // vocab: "aaab" (freq 2) → pairs aa,aa,ab per occurrence; "cd" (freq 1)
    val dir = corpus(Seq(
      (1L, "aaab cd aaab", "en", "s0")))
    val rows = SparkEntry.queries("q152_bpe_pair_stats")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // 'aa' appears twice inside each of 2 occurrences of "aaab" → 4
    assert(rows("aa") == (1L, 4L), rows)
    assert(rows("ab") == (1L, 2L), rows)
    assert(rows("cd") == (1L, 1L), rows)
  }

  test("q153: the priority source wins over the lower doc_id") {
    // same vocabulary set {alpha, beta} in docs 1 and 2; source "big"
    // carries more corpus mass, so doc 2 survives DESPITE doc 1's
    // lower id (q60's rule would keep doc 1 — the policy is the point)
    val dir = corpus(Seq(
      (1L, "alpha beta", "en", "small"),
      (2L, "beta alpha beta alpha beta alpha beta", "en", "big"),
      (3L, "gamma delta epsilon zeta", "en", "big"),
      (4L, "unrelated words entirely here now", "en", "small")))
    val rows = SparkEntry.queries("q153_source_priority_dedup")(spark, dir).collect()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[Long]("survivor_doc") == 2L, r)
    assert(r.getAs[String]("survivor_source") == "big", r)
    assert(r.getAs[Long]("n_copies") == 2L && r.getAs[Long]("n_sources") == 2L, r)
  }

  test("q155: identical sources diverge 0; disjoint-vocab sources hit the closed form") {
    // corpus = {a:"x x x", b:"y y y"} → per-source P=(1,0) vs corpus
    // Q=(.5,.5): JSD = ½[KL(P,M)+KL(Q,M)], M=(.75,.25) → 0.2158
    val dir = corpus(Seq(
      (1L, "x x x", "en", "a"),
      (2L, "y y y", "en", "b")))
    val rows = SparkEntry.queries("q155_source_divergence")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("jsd")).toMap
    assert(rows("a") == 0.2158 && rows("b") == 0.2158, rows)

    val same = corpus(Seq(
      (1L, "x y x y", "en", "a"),
      (2L, "x y x y", "en", "b")))
    val rows2 = SparkEntry.queries("q155_source_divergence")(spark, same)
      .collect().map(r => r.getAs[Double]("jsd"))
    assert(rows2.forall(_ == 0.0), rows2.mkString(","))
  }

  test("q156: 20-checkpoint curve is monotone and lands on the true type count") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val rows = SparkEntry.queries("q156_vocab_growth")(spark, dir).collect()
    assert(rows.length == 20, rows.length)
    val cums = rows.map(_.getAs[Long]("cum_types"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b }, cums.mkString(","))
    // the curve must end at the independently-counted distinct 3-gram types
    val total = graft.ext.Dedup.explodedShingles(
        graft.queries.Tables.load(spark, dir, "documents"), "doc_id", "text", 3)
      .select(col("s")).distinct().count()
    assert(cums.last == total, s"${cums.last} vs $total")
    assert(rows.last.getAs[Long]("docs_seen") == 500L)
  }

  test("q157: yield curve is monotone non-increasing; threshold 0 keeps everything") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val rows = SparkEntry.queries("q157_quality_yield")(spark, dir).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    assert(r0.getAs[Long]("thr_permille") == 0L &&
      r0.getAs[Long]("doc_share_permille") == 1000L, r0)
    val kept = rows.map(_.getAs[Long]("n_docs_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b }, kept.mkString(","))
  }

  test("q158: boundary crossings move with pack order; bins do not") {
    // one shard, docs 100/28/100/28 tokens, budget 128: natural order
    // packs perfectly (0 crossings); length-desc puts the two 100s
    // adjacent → one doc straddles with 72 spilled tokens
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val dir = corpus(Seq(
      (1L, words(100), "en", "s0"),
      (2L, words(28), "en", "s0"),
      (3L, words(100), "en", "s0"),
      (4L, words(28), "en", "s0")))
    val rows = SparkEntry.queries("q158_packing_order_audit")(spark, dir)
      .collect().map(r => r.getAs[String]("ordering") ->
        ((r.getAs[Long]("n_crossing_docs"), r.getAs[Long]("spilled_tokens"),
          r.getAs[Long]("bins_used")))).toMap
    assert(rows("by_doc_id") == ((0L, 0L, 2L)), rows)
    assert(rows("by_len_desc") == ((1L, 72L, 2L)), rows)
  }

  test("q160: temperature weights sum to 1 and flatten head vs tail") {
    // skewed bilingual corpus: "big" holds 8× the tokens of "small"
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val dir = corpus(Seq(
      (1L, words(80), "big", "s0"),
      (2L, words(10), "small", "s0")))
    val rows = SparkEntry.queries("q160_temperature_mixture")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Double]("weight"), r.getAs[Double]("upsample")))).toMap
    assert(math.abs(rows.values.map(_._1).sum - 1.0) < 1e-5, rows)
    // α < 1 flattens: the dominant lang is DOWN-sampled, the tail UP
    assert(rows("big")._2 < 1.0 && rows("small")._2 > 1.0, rows)
    // closed form at α=.3: weight(big) = (8/9)^.3 / ((8/9)^.3 + (1/9)^.3)
    val wBig = math.pow(8.0 / 9, 0.3) /
      (math.pow(8.0 / 9, 0.3) + math.pow(1.0 / 9, 0.3))
    assert(math.abs(rows("big")._1 - wBig) < 1e-5, rows)
  }

  test("q161: identical docs estimate exactly 1.0; mean audit error is sketch-sized") {
    // two byte-identical docs: exact J = 1, all 32 components agree
    val dir = corpus(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s0"),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s0"),
      (3L, "totally different words in this document", "en", "s0")))
    val rows = SparkEntry.queries("q161_minhash_error_audit")(spark, dir).collect()
    assert(rows.length == 1, rows.mkString("; "))
    assert(rows.head.getAs[Double]("jaccard_sim") == 1.0 &&
      rows.head.getAs[Long]("sig_matches") == 32L, rows.head)

    // corpus-wide: the k=32 estimator's MEAN absolute error must sit
    // within sketch noise (per-pair σ ≤ .09; the mean over ~28 pairs
    // far tighter — 0.1 is a generous ceiling, catches broken hashing)
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val audit = SparkEntry.queries("q161_minhash_error_audit")(spark, sf).collect()
    assert(audit.nonEmpty)
    val meanErr = audit.map(r => math.abs(
      r.getAs[Long]("sig_matches") / 32.0 - r.getAs[Double]("jaccard_sim")))
      .sum / audit.length
    assert(meanErr < 0.1, s"mean |est - exact| = $meanErr")
  }

  test("q163: the explanation finds the exact shared span") {
    // docs share the 6-token run "a b c d e f" (4 consecutive 3-grams
    // on one diagonal); Jaccard = 4/8 = 0.5 ≥ threshold
    val dir = corpus(Seq(
      (1L, "a b c d e f x y", "en", "s0"),
      (2L, "q a b c d e f r", "en", "s0")))
    val rows = SparkEntry.queries("q163_neardup_explain")(spark, dir).collect()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[Double]("jaccard_sim") == 0.5, r)
    assert(r.getAs[Long]("n_shared_positions") == 4L, r)
    assert(r.getAs[Long]("longest_span_tokens") == 6L, r)
  }

  test("q168: the threshold curve is monotone non-increasing in both measures") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("q168_dedup_threshold_curve")(spark, sf)
      .collect().map(r => (r.getAs[Long]("thr_permille"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_flagged")))
    assert(rows.nonEmpty)
    assert(rows.sliding(2).forall {
      case Array((_, p1, d1), (_, p2, d2)) => p1 >= p2 && d1 >= d2
      case _ => true
    }, rows.mkString(","))
  }

  test("q154: fertility is integer permille of bpe over whitespace tokens") {
    val dir = corpus(Seq(
      (1L, "don't stop me now", "en", "s0"),   // ws 4, bpe: don|'t|stop|me|now = 5
      (2L, "plain words only", "en", "s0")))   // ws 3, bpe 3
    val rows = SparkEntry.queries("q154_tokenizer_fertility")(spark, dir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("ws_tokens") == 7L, r)
    assert(r.getAs[Long]("bpe_tokens") == 8L, r)
    assert(r.getAs[Long]("fertility_permille") == 8000L / 7L, r)
  }
}
