package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: times each headline query end-to-end (scan →
  * compute → noop sink, so no projected column is pruned away the way
  * a bare count() would allow) and prints ONE JSON line for the
  * driver's BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def runIn(name: String, dir: String): Double = {
      // every entry starts from an empty cache: registered queries
      // persist() intermediates for intra-query reuse, and without
      // clearing, a session accumulates dead cache entries that
      // degrade every LATER entry (this contaminated r2's q65 number
      // with the x10 corpus's cached shingles). Clearing is outside
      // the timed region; both runs of an entry then measure the
      // same cold-cache state.
      spark.catalog.clearCache()
      // broadcast/shuffle blocks from prior entries are reclaimed by
      // ContextCleaner only when their refs are GC'd; without a forced
      // collection they pile up across the ~30 entries and late
      // entries (the x10 group especially) measure allocation stalls
      // from earlier queries' garbage, not their own work — r3 saw
      // 3-10x wobble on x10 entries from exactly this
      System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    def runOne(name: String): Double = runIn(name, sfDir)
    // JVM/codegen/reader warmup outside the timed loop
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    SparkEntry.headlines.headOption.foreach(runOne)
    // streaming-ingest throughput: parse+flatten+stamp+partitioned write
    // of 100k generated purchase events (the reference producer tops out
    // at ~2 events/s; this measures the engine's single-node ceiling)
    val ingestSec = {
      import spark.implicits._
      val gen = graft.generator.EventGenerator.generate(
        graft.generator.EventGenerator.defaultProducts, 100000)
      // stage the envelope strings across partitions the way a real
      // feed arrives (a Seq.toDF LocalRelation plans as ONE task, so
      // it would serialize parse+write behind a single core and
      // measure that artifact instead of the engine)
      val raw = spark.sparkContext.parallelize(
        gen.purchases.map(graft.generator.EventGenerator.toJson),
        cpus.toInt).toDF("value")
      // min-of-2 like the headline loop (fresh sink dir per run; the
      // generator and staging above stay outside the timed region)
      def once(): Double = {
        val out = java.nio.file.Files.createTempDirectory("bench-silver").toString
        val t0 = System.nanoTime()
        graft.ingest.Silver.writeSilver(
          graft.ingest.Silver.parsePurchases(raw), out)
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once(); val t2 = once()
      math.min(t1, t2)
    }
    // two runs, report the min: the first run pays one-time plan
    // codegen/JIT that a steady-state workload never sees
    val headlineResults = SparkEntry.headlines.map { n =>
      val t1 = runOne(n); val t2 = runOne(n)
      n -> (if (t1 < 0 || t2 < 0) math.max(t1, t2) else math.min(t1, t2))
    }
    // ── 10× dedup/ANN scale probe ─────────────────────────────────
    // AFTER the headline loop (r2 ran it first and every headline
    // number was measured against a storage pool pre-loaded with
    // 10×-scale cached intermediates). Same pipelines over a corpus
    // 10× the SF dir, built so near-dup structure is preserved WITHIN
    // each copy and absent ACROSS copies (every token gets a per-copy
    // tag; embeddings get a per-copy diagonal ±1 sign flip, which
    // keeps within-copy cosines bit-identical and decorrelates
    // cross-copy pairs). True output therefore grows LINEARLY in
    // corpus size — so wall-time growth beyond ~10× on these entries
    // would expose super-linear engine behavior (an N² candidate path
    // would show ~100×).
    val x10Probe: Seq[(String, Double)] = {
      val dir10 = buildScaledCorpus(spark, sfDir, copies = 10)
      Seq("q60_dedup_exact", "q64_ngram_jaccard",
        "q65_minhash_dedup", "q72_ann_lsh",
        "q76_dedup_clusters", "q86_curation_pipeline",
        "q89_decontamination",
        // round-3 additions: chunking (pure map-side — should scale
        // ~linearly with docs), surprisal (vocab-key join), paragraph
        // dedup (block-digest join)
        "q95_doc_chunking", "q96_unigram_surprisal",
        "q103_paragraph_dedup",
        // stride-1 shingle mining: the heaviest joinless linear op —
        // 8× corpus bytes through one map-side-combined agg
        "q122_repeated_ngrams",
        // positioned-digest window + doc-keyed interval sweep: dup
        // structure stays within copies, so output rows grow 10×
        // while the removable-span mass per doc is unchanged
        "q125_substring_spans").map { n =>
        val t1 = runIn(n, dir10); val t2 = runIn(n, dir10)
        s"x10_$n" -> (if (t1 < 0 || t2 < 0) math.max(t1, t2) else math.min(t1, t2))
      }
    }
    val results =
      (headlineResults :+ ("ingest_parse_write_100k" -> ingestSec)) ++ x10Probe
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total = the headline set only (comparable round to round); the
    // x10 probe entries are reported per-query, not summed in
    val total = results.filter(r => !r._1.startsWith("x10_"))
      .map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** 10× corpus for the scale probe (see call site for the invariance
    * argument). Written once to a temp dir in the SF layout so the
    * registered queries run unmodified against it.
    */
  def buildScaledCorpus(spark: SparkSession, sfDir: String, copies: Int): String = {
    val out = java.nio.file.Files.createTempDirectory("bench-x10").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tagged = (0 until copies).map { k =>
      docs
        .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), "\\s+"),
            t => concat(t, lit("·" + k)))))
    }.reduce(_ unionByName _)
    tagged.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val flipped = (0 until copies).map { k =>
      val rnd = new scala.util.Random(100 + k)
      val signs = array(Seq.fill(64)(
        lit(if (rnd.nextBoolean()) 1.0f else -1.0f)): _*)
      emb
        .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        .withColumn("embedding",
          zip_with(col("embedding"), signs, (x, s) => x * s))
    }.reduce(_ unionByName _)
    flipped.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }
}
