package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch
import graft.ext.TextAnalysis

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate within 15% of exact distinct; exact below k") {
    val df = spark.range(200000)
      .select((col("id") % 50000).as("v")) // 50k distinct, 4x repeated
    val r = df.agg(
      KmvSketch.kmvDistinct(256)(col("v")).as("est"),
      count_distinct(col("v")).as("exact")).head()
    val (est, exact) = (r.getDouble(0), r.getLong(1))
    assert(math.abs(est - exact) / exact < 0.15, s"est=$est exact=$exact")
    // exact mode below k
    val small = spark.range(100).select(col("id").as("v"))
      .agg(KmvSketch.kmvDistinct(256)(col("v"))).head().getDouble(0)
    assert(small === 100.0)
  }

  test("KMV skips NULLs like COUNT(DISTINCT) — no phantom distinct") {
    // xxhash64(null) is the constant seed hash; un-skipped it would
    // enter the sketch as one extra "value"
    val df = spark.range(100)
      .select(when(col("id") < 50, col("id")).as("v")) // 50 nulls
    val r = df.agg(
      KmvSketch.kmvDistinct(256)(col("v")).as("est"),
      count_distinct(col("v")).as("exact")).head()
    assert(r.getDouble(0) === 50.0) // exact mode below k, nulls ignored
    assert(r.getLong(1) === 50L)
    // all-null column → empty sketch → 0 distinct
    val allNull = spark.range(10).select(lit(null).cast("long").as("v"))
      .agg(KmvSketch.kmvDistinct(16)(col("v"))).head().getDouble(0)
    assert(allNull === 0.0)
  }

  test("KMV is deterministic under repartitioning (order/merge invariant)") {
    val base = spark.range(100000).select((col("id") % 7919).as("v"))
    val a = base.repartition(3).agg(KmvSketch.kmvDistinct(64)(col("v")))
      .head().getDouble(0)
    val b = base.repartition(17).orderBy(rand(1))
      .agg(KmvSketch.kmvDistinct(64)(col("v"))).head().getDouble(0)
    assert(a === b)
  }

  test("KMV groups: per-group estimates track per-group cardinalities") {
    val df = spark.range(60000).select(
      (col("id") % 3).as("g"), (col("id") % 20000).as("v"))
    // group 0: ids 0,3,6,… mod 20000 → ~6667 distinct… compute exact per group
    val rows = df.groupBy("g").agg(
      KmvSketch.kmvDistinct(128)(col("v")).as("est"),
      count_distinct(col("v")).as("exact")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getLong(2)) / r.getLong(2) < 0.2,
        r.toString)
    }
  }
}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala winnowing over token 3-grams with xxhash64 — needs
    * Spark's exact hash, so compute gram hashes via a tiny DataFrame.
    */
  private def hashGrams(grams: Seq[String]): Seq[Long] =
    if (grams.isEmpty) Seq.empty
    else grams.toDF("g").select(xxhash64(col("g"))).collect().map(_.getLong(0)).toSeq

  private def scalaWinnow(text: String, n: Int = 3, w: Int = 4): Set[Long] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val grams = if (toks.size < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    val hs = hashGrams(grams)
    if (hs.isEmpty) Set.empty
    else if (hs.size < w) Set(hs.min)
    else hs.sliding(w).map(_.min).toSet
  }

  test("Misra-Gries: candidate set ⊇ true heavy hitters under any partitioning") {
    import graft.functions.HeavyHitters
    // zipf-ish stream: word i appears 2^(12-i) times for i in 0..11,
    // plus 5000 singleton rare words — N = 8190 + 5000
    val rows = (0 until 12).flatMap(i => Seq.fill(1 << (12 - i))(s"hot$i")) ++
      (0 until 5000).map(i => s"rare$i")
    val n = rows.length.toLong
    val k = 20
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = exact.collect { case (w, c) if c > n / k => w }.toSet
    assert(heavy.nonEmpty)
    for (parts <- Seq(1, 7, 32)) {
      val cand = spark.sparkContext.parallelize(rows, parts).toDF("w")
        .agg(HeavyHitters.mgCandidates(k)(col("w")).as("c"))
        .select(explode(col("c.words")).as("w"))
        .as[String].collect().toSet
      assert(cand.size <= k, s"parts=$parts kept ${cand.size}")
      assert(heavy.subsetOf(cand), s"parts=$parts missed ${heavy -- cand}")
    }
  }

  test("Misra-Gries: exact (no decrements) when vocab fits the k counters") {
    import graft.functions.HeavyHitters
    val rows = (0 until 1000).map(i => s"w${i % 10}")
    val cand = rows.toDF("w")
      .agg(HeavyHitters.mgCandidates(50)(col("w")).as("c"))
      .select(explode(col("c.words")).as("w"))
      .as[String].collect().toSet
    assert(cand === (0 until 10).map(i => s"w$i").toSet)
  }

  test("winnowing ≡ plain-Scala reference; co-derived docs share fingerprints") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "INTRO words the quick brown fox jumps over the lazy dog by the river AND MORE"),
      (3L, "completely unrelated content with nothing shared at all here"),
      (4L, "shorty"))
    val df = texts.toDF("doc_id", "text")
      .withColumn("toks", graft.ext.Dedup.tokens(col("text")))
      .withColumn("grams", TextAnalysis.ngramSeq(col("toks")))
      .withColumn("hashes", transform(col("grams"), g => xxhash64(g)))
      .select(col("doc_id"), TextAnalysis.winnowFromHashes(col("hashes")).as("fp"))
    val got = df.as[(Long, Seq[Long])].collect()
      .map { case (id, fp) => id -> fp.toSet }.toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === scalaWinnow(t), s"doc $id")
    }
    // doc 2 contains doc 1's full text → winnowing guarantees overlap
    assert((got(1L) & got(2L)).nonEmpty)
    assert((got(1L) & got(3L)).isEmpty)
    assert(got(4L).isEmpty) // < 3 tokens
  }
}

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.BloomSketch

  private val Bits = 1 << 16
  private val K = 5

  private def bloomOf(df: org.apache.spark.sql.DataFrame) =
    df.agg(BloomSketch.bloomAgg(Bits, K)(col("v")).as("bf"))

  test("no false negatives: every built value passes mightContain") {
    val members = spark.range(5000).select(concat(lit("m-"), col("id")).as("v"))
    val misses = members
      .crossJoin(broadcast(bloomOf(members)))
      .filter(!BloomSketch.mightContain(col("v"), col("bf"), Bits, K))
      .count()
    assert(misses === 0)
  }

  test("false-positive rate stays near theory (not a degenerate all-pass)") {
    val members = spark.range(5000).select(concat(lit("m-"), col("id")).as("v"))
    val outsiders = spark.range(20000).select(concat(lit("x-"), col("id")).as("v"))
    val fp = outsiders
      .crossJoin(broadcast(bloomOf(members)))
      .filter(BloomSketch.mightContain(col("v"), col("bf"), Bits, K))
      .count()
    // 5000 keys in 2^16 bits, k=5 → theoretical fp ≈ (1-e^(-5·5000/65536))^5
    // ≈ 0.6%; allow generous slack, but far below all-pass
    assert(fp < 20000 * 0.05, s"fp=$fp")
    assert(fp > 0) // at this load a few fps are expected; 0 would be suspicious
  }

  test("bitmap is bit-identical under repartitioning (mergeable OR)") {
    val vals = spark.range(3000).select(concat(lit("k-"), col("id")).as("v"))
    val a = bloomOf(vals.repartition(1)).head().getSeq[Long](0)
    val b = bloomOf(vals.repartition(13).orderBy(rand(7))).head().getSeq[Long](0)
    assert(a === b)
  }

  test("bloom-prefiltered decontamination ≡ exact broadcast-index path (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val docs = graft.queries.Tables.load(spark, dir, "documents")
    val ev = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val tr = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val exact = graft.ext.Decontam
      .contaminationPairs(tr, ev, "doc_id", "text", n = 4)
      .orderBy("train_id", "eval_id").collect().toSeq
    val bloom = graft.ext.Decontam
      .bloomContaminationPairs(tr, ev, "doc_id", "text", n = 4)
      .orderBy("train_id", "eval_id").collect().toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty) // the corpus must actually exercise the sweep
  }

  test("scoped staging reclaims the eval-gram dir when the scope closes") {
    // the r6-ADVICE leak class: each plain bloomContaminationPairs call
    // stages eval grams until JVM exit; through Staging.scope the dir
    // must be GONE as soon as the body returns (result consumed inside)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val docs = graft.queries.Tables.load(spark, dir, "documents")
    val ev = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val tr = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    def stagedDirs(): Set[String] = {
      // resolve the staging root the way Staging.mkStageDir does —
      // scanning only java.io.tmpdir would make this test vacuously
      // green (empty === empty) whenever GRAFT_STAGE_DIR is set
      val root = sys.env.get("GRAFT_STAGE_DIR")
        .getOrElse(System.getProperty("java.io.tmpdir"))
      val files = new java.io.File(root)
        .listFiles((_, n) => n.startsWith("graft-stage-decontam-eval-grams"))
      Option(files).getOrElse(Array.empty).map(_.getName).toSet
    }
    val before = stagedDirs()
    val n = graft.Staging.scope { stager =>
      graft.ext.Decontam
        .bloomContaminationPairs(tr, ev, "doc_id", "text", n = 4,
          stage = stager)
        .count()
    }
    assert(n > 0)
    assert(stagedDirs() === before, "scope leaked a staging dir")
  }
}

class CountMinSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.CountMin

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(CountMin.cmsSketch(4, 64)(col("item"), col("w")))
      .head().getSeq[Long](0)

  test("CMS never undercounts; overcount within the 2N/w bound w.h.p.") {
    val df = spark.range(20000)
      .select(concat(lit("item"), (col("id") % 500).cast("string")).as("item"),
        lit(1L).as("w"))
    val cells = sketchOf(df)
    val n = 20000L
    val exact = 20000 / 500 // uniform: every item appears 40 times
    (0 until 500).foreach { v =>
      val est = (0 until 4).map { i =>
        cells(i * 64 + CountMin.bucket(i, s"item$v", 64))
      }.min
      assert(est >= exact, s"item$v undercounted: $est < $exact")
      assert(est <= exact + 2 * n / 64 + 1,
        s"item$v overcount ${est - exact} beyond bound")
    }
  }

  test("CMS skips NULL items — no collision with the literal token 'null'") {
    // a null item interpolated into "cms<i>:null" would collide with
    // the real string "null" and inflate its estimate past the 2N/w
    // bound, an overcount the DuckDB replay (which drops NULLs) can't
    // reproduce
    val withNulls = Seq(
      (Option("null"), 3L), (None, 100L), (Option("x"), 2L), (None, 50L))
      .toDF("item", "w")
    val clean = Seq(("null", 3L), ("x", 2L)).toDF("item", "w")
    assert(sketchOf(withNulls) === sketchOf(clean))
  }

  test("CMS cells are bit-identical under repartitioning (linear sketch)") {
    val df = spark.range(30000)
      .select(concat(lit("x"), (col("id") % 997).cast("string")).as("item"),
        (col("id") % 3 + 1).as("w"))
    val a = sketchOf(df.repartition(3))
    val b = sketchOf(df.repartition(17).orderBy(rand(5)))
    assert(a === b)
  }

  test("CMS md5 bucket matches the Column-side md5Hash60 convention") {
    // the q148 lookup computes buckets via Dedup.md5Hash60 Column
    // expressions while the Aggregator hashes JVM-side — both must
    // land every item in the same cell or estimates read wrong cells
    val items = Seq("alpha", "bravo", "漢字", "x y", "")
    val colBuckets = items.toDF("s").select(
      pmod(graft.ext.Dedup.md5Hash60(concat(lit("cms2:"), col("s"))),
        lit(64L)).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    val jvmBuckets = items.map(CountMin.bucket(2, _, 64))
    assert(colBuckets === jvmBuckets)
  }

  test("CMS weighted input ≡ per-occurrence input") {
    val occ = spark.range(5000)
      .select(concat(lit("t"), (col("id") % 50).cast("string")).as("item"),
        lit(1L).as("w"))
    val weighted = occ.groupBy("item")
      .agg(sum("w").as("w")).select(col("item"), col("w"))
    assert(sketchOf(occ) === sketchOf(weighted))
  }
}

class ContrastivePairsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ext.Similarity

  test("positives share the anchor's label, negatives never do; ranks dense") {
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.9f, 0.1f, 0.0f)),
      (2L, 0, Array(0.0f, 1.0f, 0.0f)),
      (3L, 1, Array(0.95f, 0.05f, 0.0f)),
      (4L, 1, Array(0.0f, 0.0f, 1.0f)),
      (5L, 2, Array(0.5f, 0.5f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.contrastivePairs(
      vecs, vecs.filter(col("vec_id") === 0), kNeg = 2).collect()
    val pos = out.filter(_.getAs[String]("kind") == "pos")
    val neg = out.filter(_.getAs[String]("kind") == "neg")
    // anchor 0 (label 0): nearest same-label is vec 1 (cos ≈ .994)
    assert(pos.map(r => (r.getAs[Long]("n_vec"), r.getAs[Long]("rn"))).toSeq
      === Seq((1L, 1L)))
    // nearest different-label: vec 3 (cos ≈ .998) then vec 5 (cos ≈ .707)
    assert(neg.sortBy(_.getAs[Long]("rn"))
      .map(_.getAs[Long]("n_vec")).toSeq === Seq(3L, 5L))
    // and the hard negative is HARDER than the positive — the case the
    // mining exists to surface
    val posSim = pos.head.getAs[Double]("sim_r")
    val negTop = neg.minBy(_.getAs[Long]("rn")).getAs[Double]("sim_r")
    assert(negTop > posSim)
  }

  test("matryoshkaRecall: full-width row is exact; a prefix that flips ranks scores lower") {
    import spark.implicits._
    // 4-dim vectors built so the 2-dim prefix flips the ranking for
    // query (1,0,1,0): full-width cosines are v2 ≈.70 > v1 ≈.32 > v3
    // = 0 (top-2 {2,1}); the 2-dim prefix sees v2 = 1, v3 = 0,
    // v1 = −1 (its prefix points AWAY) → top-2 {2,3}, overlap 1
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f, 1.0f, 0.0f)),            // query
      (1L, 0, Array(-0.5f, 0.0f, 1.0f, 0.0f)),           // full-near, prefix-opposed
      (2L, 0, Array(1.0f, 0.0f, 0.0f, 0.1f)),            // near everywhere
      (3L, 0, Array(0.0f, 1.0f, 0.0f, 1.0f))             // far everywhere
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.matryoshkaRecall(
        vecs, vecs.filter(col("vec_id") === 0), dims = Seq(2, 4), k = 2)
      .collect().map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Long]("total_overlap"), r.getAs[Long]("recall_permille")))).toMap
    // full width: overlap ≡ k·|queries| = 2, recall 1000 by construction
    assert(out(4L) == ((2L, 1000L)), out)
    assert(out(2L) == ((1L, 500L)), out)
  }

  test("matryoshkaRecall rejects a narrow QUERY frame, not just a narrow corpus") {
    import spark.implicits._
    // a 2-wide query against a validated 4-wide corpus would silently
    // score every full-width baseline against slice(qv, 1, 4) of a
    // 2-element array — the width gate must cover both frames
    val corpus = Seq((1L, Array(1.0f, 0f, 0f, 0f)), (2L, Array(0f, 1.0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val narrowQ = Seq((9L, Array(1.0f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.matryoshkaRecall(corpus, narrowQ, dims = Seq(2, 4), k = 1)
    }
    assert(e.getMessage.contains("query"))
  }

  test("q169 fisher: hand-computed ratio; a constant dimension yields NULL, not ∞") {
    import spark.implicits._
    // dim 1: classes {0,2} vs {10,12} → between SS 100, within SS 4
    // → ratio 25; dim 2 is constant → within 0 → NULLIF guards
    val fx = tmpDir("fisher")
    Seq(
      (1L, 0, Array(0.0f, 5.0f)), (2L, 0, Array(2.0f, 5.0f)),
      (3L, 1, Array(10.0f, 5.0f)), (4L, 1, Array(12.0f, 5.0f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$fx/embeddings.parquet")
    val rows = SparkEntry.queries("q169_fisher_separability")(spark, fx)
      .collect().map(r => r.getAs[Long]("dim") ->
        Option(r.get(r.fieldIndex("fisher_ratio")))).toMap
    assert(rows(1L).contains(25.0), rows)
    assert(rows(2L).isEmpty, rows)
  }
}
