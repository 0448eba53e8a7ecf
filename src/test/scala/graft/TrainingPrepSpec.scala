package graft

import org.apache.spark.sql.functions._
import graft.ext.{Chunking, LanguageModel, Packing, Sampling, TextAnalysis}

/** Specs for the round-3 training-prep additions: context-window
  * chunking, unigram surprisal, padding economics, per-stratum hash
  * sampling, containment dedup.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("substringDupSpans: hand-computed coverage, overlap merge, within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e f"),        // canonical source for docs 2/3
      (2L, "a b c d e f"),        // exact copy → fully covered
      (3L, "x y a b c z"),        // shares one 3-gram with doc 1
      (4L, "p q r"),              // unique single 3-gram
      (5L, "a b"),                // shorter than the window
      (6L, "m n o m n o m n o")   // within-doc repeats past the first
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.substringDupSpans(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(got === Array(
      (1L, 6L, 0L, 0.0),      // every occurrence canonical
      (2L, 6L, 6L, 1.0),      // spans [0,2][1,3][2,4][3,5] union = whole doc
      (3L, 6L, 3L, 0.5),      // one removable span [2,4]
      (4L, 3L, 0L, 0.0),
      (5L, 2L, 0L, 0.0),
      (6L, 9L, 6L, 0.666666)  // repeats at pos 3..6 union to [3,8]
    ))
  }

  test("tokenChunks: spans tile the doc, last chunk reaches the end") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks → 3 chunks
      (2L, "a b c d"),                                // = window → 1 chunk
      (3L, "a b c d e")                               // 5 toks → 2 chunks
    ).toDF("doc_id", "text")
    val got = Chunking.tokenChunks(docs, "doc_id", "text",
        window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (2L, 0L, 0L, 4L),
      (3L, 0L, 0L, 4L), (3L, 1L, 3L, 2L)))
    // every chunk is full-width except possibly the last, and the last
    // covers the final token: start + len == n_tokens
    val last = got.groupBy(_._1).map(_._2.maxBy(_._2))
    assert(last.forall { case (id, _, start, len) =>
      start + len === (if (id == 2L) 4L else if (id == 3L) 5L else 10L)
    })
  }

  test("tokenChunks invariants hold for arbitrary lengths (1..500 tokens)") {
    // property sweep in one DataFrame pass: doc i has i tokens
    val docs = (1 to 500)
      .map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val w = 64; val st = 48
    val got = Chunking.tokenChunks(docs, "doc_id", "text", w, st)
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    (1 to 500).foreach { n =>
      val chunks = got(n.toLong).sortBy(_._2)
      val expect = if (n <= w) 1 else (n - w + st - 1) / st + 1
      assert(chunks.length === expect, s"n=$n")
      chunks.zipWithIndex.foreach { case ((_, cid, start, len), i) =>
        assert(cid === i.toLong && start === i.toLong * st, s"n=$n")
        // full width except possibly the last
        if (i < chunks.length - 1) assert(len === w.toLong, s"n=$n")
        assert(start < n, s"n=$n chunk starts past the text")
      }
      val (_, _, lastStart, lastLen) = chunks.last
      assert(lastStart + lastLen === n.toLong, s"n=$n last chunk misses the end")
    }
  }

  test("tokenChunks md5 is the hash of the rejoined window") {
    val docs = Seq((1L, "Alpha beta GAMMA")).toDF("doc_id", "text")
    val got = Chunking.tokenChunks(docs, "doc_id", "text", 2, 1)
      .orderBy("chunk_id").select("chunk_md5").as[String].collect()
    val exp = Seq("alpha beta", "beta gamma").map { s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(got.toSeq === exp)
  }

  test("unigramSurprisal matches the hand-computed corpus distribution") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = LanguageModel.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    // vocab: a=2, b=1, c=1, N=4
    val d1 = (2 * -math.log(2.0 / 4) + -math.log(1.0 / 4)) / 3
    val d2 = -math.log(1.0 / 4)
    assert(got === Array(
      (1L, 3L, math.rint(d1 * 1e4) / 1e4),
      (2L, 1L, math.rint(d2 * 1e4) / 1e4)))
  }

  test("bigramSurprisal matches the hand-computed interpolated model") {
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val got = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // corpus bigrams: (a,b)=2, (b,a)=2; heads a:2 b:2; tails b:2 a:2,
    // N=4 → p = 0.75·(2/2) + 0.25·(2/4) = 0.875 for every position
    val s = math.rint(-math.log(0.875) * 1e4) / 1e4
    assert(got === Array((1L, 3L, s), (2L, 1L, s)))
  }

  test("paddingStats: exact bucket ladder and waste fractions") {
    val docs = Seq.tabulate(3)(i => (i, Seq(10, 33, 100)(i)))
      .map { case (i, n) => (i.toLong, (1 to n).map(_ => "w").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Packing.paddingStats(docs, TextAnalysis.tokenCount(col("text")))
      .orderBy("seq_len").as[(Long, Long, Long, Double)].collect()
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got === Array(
      (32L, 1L, 10L, r4(1.0 - 10.0 / 32)),
      (64L, 1L, 33L, r4(1.0 - 33.0 / 64)),
      (128L, 1L, 100L, r4(1.0 - 100.0 / 128))))
  }

  test("groupHashSample: k per stratum, deterministic, WindowGroupLimit plan") {
    val df = spark.range(200)
      .select(col("id").as("doc_id"), (col("id") % 2).cast("string").as("g"))
    val s1 = Sampling.groupHashSample(df, "g", "doc_id", k = 5)
    val rows = s1.select("g", "sample_rank").as[(String, Long)].collect()
    assert(rows.length === 10)
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).sorted.sameElements(1L to 5L)))
    val s2 = Sampling.groupHashSample(df, "g", "doc_id", k = 5)
    assert(s1.except(s2).count() === 0)
    // rank filter must plan as WindowGroupLimit (map-side top-k prune)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q100 source report: dup exposure and token share per domain") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q100_source_report")(spark, dir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // token shares sum to ~1e6 (integer-division slack < n_sources)
    val shareSum = rows.map(_.getAs[Long]("token_share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    // dup_frac consistent with its numerator/denominator
    rows.foreach { r =>
      val frac = r.getAs[Double]("dup_frac")
      val expect = r.getAs[Long]("n_dup_docs").toDouble / r.getAs[Long]("n_docs")
      assert(math.abs(frac - math.rint(expect * 1e4) / 1e4) < 1e-12)
    }
  }

  test("q101 Tukey fences: hand-checked quartiles and outlier count") {
    val docs = (Seq.fill(4)(10) ++ Seq(11, 12, 13, 1000))
      .zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(_ => "w").mkString(" "), "s0") }
      .toDF("doc_id", "text", "source")
    val base = docs.select(col("source"),
      graft.ext.TextAnalysis.tokenCount(col("text")).as("nt"))
    val fences = base.groupBy(col("source")).agg(
      expr("percentile(nt, 0.25)").as("q1"),
      expr("percentile(nt, 0.75)").as("q3"))
    val r = fences.head()
    // sorted: 10,10,10,10,11,12,13,1000 → q1 at pos 1.75 = 10,
    // q3 at pos 5.25 = 12 + 0.25·(13−12) = 12.25
    assert(r.getAs[Double]("q1") === 10.0)
    assert(r.getAs[Double]("q3") === 12.25)
    val out = base.join(broadcast(fences), Seq("source"))
      .filter(col("nt") > col("q3") + (col("q3") - col("q1")) * 1.5 ||
        col("nt") < col("q1") - (col("q3") - col("q1")) * 1.5)
      .count()
    assert(out === 1L) // only the 1000-token doc is fenced out
  }

  test("q103 paragraph dedup: shared block flags both docs, unique blocks don't") {
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 20).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val blocks = graft.ext.Chunking.tokenChunks(docs, "doc_id", "text", 20, 20)
    val spread = blocks.groupBy(col("chunk_md5"))
      .agg(count_distinct(col("doc_id")).as("ndocs"))
    val got = blocks.join(spread, Seq("chunk_md5"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("dups"),
        count(lit(1)).as("n"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 1L, 2L), (2L, 1L, 2L), (3L, 0L, 1L)))
  }

  test("q104 corpus shuffle: dense per-shard positions, deterministic") {
    val r1 = SparkEntry.queries("q104_corpus_shuffle")(
      spark, "/root/testdata/sf0.001")
    val rows = r1.as[(Long, Long, Long)].collect()
    assert(rows.map(_._3).distinct.length === rows.length) // every doc once
    rows.groupBy(_._1).foreach { case (_, shard) =>
      assert(shard.map(_._2).sorted.sameElements(1L to shard.length)) // dense
    }
    val r2 = SparkEntry.queries("q104_corpus_shuffle")(
      spark, "/root/testdata/sf0.001")
    assert(r1.except(r2).count() === 0)
  }

  test("semanticDedup: greedy lowest-id keeper within a cell") {
    val unit = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val scaled = unit.map(_ * 0.9f)
    val emb = Seq((1L, unit), (2L, unit), (3L, scaled))
      .toDF("vec_id", "embedding")
    val got = graft.ext.Similarity
      .semanticDedup(emb, dim = 64, threshold = 0.5)
      .orderBy("dropped_id")
      .as[(Long, Long, Double)].collect()
    // all three share every plane sign (same direction) → one cell;
    // cosine is 1.0 for each pair; 2 and 3 drop, both kept by 1
    assert(got === Array((2L, 1L, 1.0), (3L, 1L, 1.0)))
  }

  test("fixed-point LM scores are partitioning-invariant (exact long sums)") {
    // the property the r5 fixed-point hardening buys: per-term floors
    // make every aggregate a sum of identical longs, so the result
    // cannot depend on partition layout / summation order — the same
    // invariance that makes the DuckDB oracle hash-stable
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "le chat est sur le tapis tapis", "fr"),
      (3L, "the dog ate the cat food and the mat", "en"),
      (4L, "cat cat cat unusual zyzzyva", "en"),
      (5L, "on the mat sat a very unusual dog", "en"))
      .toDF("doc_id", "text", "lang")
    def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    for (parts <- Seq(1, 7)) {
      val d = docs.repartition(parts)
      assert(collectSorted(graft.ext.LanguageModel
          .unigramSurprisal(d, "doc_id", "text")) ===
        collectSorted(graft.ext.LanguageModel
          .unigramSurprisal(docs, "doc_id", "text")))
      assert(collectSorted(graft.ext.LanguageModel
          .bigramSurprisal(d, "doc_id", "text")) ===
        collectSorted(graft.ext.LanguageModel
          .bigramSurprisal(docs, "doc_id", "text")))
      assert(collectSorted(graft.ext.LanguageModel
          .importanceWeights(d, "doc_id", "text", col("lang") === "en")) ===
        collectSorted(graft.ext.LanguageModel
          .importanceWeights(docs, "doc_id", "text", col("lang") === "en")))
    }
  }

  test("autoPlanes holds expected bucket occupancy at the target") {
    import graft.ext.Similarity.autoPlanes
    // occupancy bound: n / 2^planes <= target whenever unclamped
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L);
         t <- Seq(16, 64, 256)) {
      val p = autoPlanes(n, t)
      if (p > 4 && p < 30) assert(n.toDouble / math.pow(2, p) <= t)
    }
    assert(autoPlanes(0) === 4)
    assert(autoPlanes(100, 1000) === 4)              // clamp low
    assert(autoPlanes(Long.MaxValue, 1) === 30)      // clamp high
    // monotone in corpus size
    val seq = Seq(1L, 1000L, 1000000L, 1000000000L).map(autoPlanes(_, 64))
    assert(seq === seq.sorted)
    // the measured r5 diag case: 8 planes at ~6.4k vectors → ~25/bucket;
    // at 10× the rule asks for more planes instead of 100× candidates
    assert(autoPlanes(64000L, 25) > 8)
  }

  test("lshNeighborPairs DEFAULT path auto-sizes planes with corpus size") {
    // the r5 scale finding made default behavior: with no explicit
    // nPlanes the plane family grows with the corpus (linear candidate
    // growth), instead of a fixed family that saturates quadratically
    import graft.ext.Similarity
    val dim = 8
    def corpus(n: Int) = (0 until n)
      .map(i => (i.toLong, Array.tabulate(dim)(j => ((i * 31 + j * 7) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.lshNeighborPairs(corpus(100), dim, threshold = 0.999)
    val small = Similarity.lastResolvedPlanes
    Similarity.lshNeighborPairs(corpus(3000), dim, threshold = 0.999)
    val large = Similarity.lastResolvedPlanes
    assert(small === Similarity.autoPlanes(100L))
    assert(large === Similarity.autoPlanes(3000L))
    assert(large > small) // the family actually grew with the corpus
    // explicit nPlanes still wins (the oracle-constant path)
    Similarity.lshNeighborPairs(corpus(100), dim, threshold = 0.999, nPlanes = 8)
    assert(Similarity.lastResolvedPlanes === 8)
  }

  test("containment catches a small doc quoted inside a larger one") {
    // doc 1's shingles all appear in doc 2; the reverse direction is
    // below threshold — asymmetry is the point of the operator
    val docs = Seq(
      (1L, "x y z w"),
      (2L, "p q x y z w r")).toDF("doc_id", "text")
    val exploded = graft.ext.Dedup.explodedShingles(docs, "doc_id", "text")
    val szs = exploded.groupBy(col("doc_id"))
      .agg(count_distinct(col("s")).as("sz"))
    val pairs = exploded.select(col("doc_id").as("doc_id_a"), col("s"))
      .join(exploded.select(col("doc_id").as("doc_id_b"), col("s")), Seq("s"))
      .filter(col("doc_id_a") =!= col("doc_id_b"))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count_distinct(col("s")).as("inter"))
      .join(szs.select(col("doc_id").as("doc_id_a"), col("sz")), Seq("doc_id_a"))
      .withColumn("c", col("inter").cast("double") / col("sz").cast("double"))
      .select("doc_id_a", "doc_id_b", "c").as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) === 1.0)   // 2 of 2 shingles contained
    assert(m((2L, 1L)) === 0.4)   // 2 of 5
  }
}
