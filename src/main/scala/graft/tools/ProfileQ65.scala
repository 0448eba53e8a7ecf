package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: attribute the x10/x30 q65 probe cost to the minhash
  * pipeline's phases (the candidate build already ships a phase split
  * in BENCH_DIAG's `candidate_sec`; this breaks the REMAINING seconds
  * — verify join, final sort — apart, and splits the candidate build
  * itself into sig-agg vs banding vs pair-explode).
  *
  * Usage: runMain graft.tools.ProfileQ65 <sfDir> [copies] [repeat]
  */
object ProfileQ65 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 30
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // job-level attribution: per timed phase, how many Spark jobs ran
    // and how long each took (names the re-execution / stall job)
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobLog.put(s.jobId, (s.time, -1L)): Unit
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = jobLog.get(e.jobId)
          if (v != null) jobLog.put(e.jobId, (v._1, e.time)): Unit
        }
      })
    def jobReport(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      val rows = jobLog.asScala.toSeq.sortBy(_._1).map { case (id, (s, e)) =>
        f"j$id:${if (e < 0) -1.0 else (e - s) / 1e3}%.1fs"
      }
      println(s"[q65]   $label jobs: ${rows.mkString(" ")}")
      jobLog.clear()
    }
    val corpus =
      if (copies <= 1) dir else graft.Bench.buildScaledCorpus(spark, dir, copies)
    val docs = graft.queries.Tables.load(spark, corpus, "documents")
    println(s"[q65] corpus=$corpus docs=${docs.count()}")
    (1 to repeat).foreach { i =>
      spark.catalog.clearCache(); System.gc()
      val ex = graft.ext.Dedup.explodedShingles(docs, "doc_id", "text")
      val tShingle = timed {
        ex.write.format("noop").mode("overwrite").save()
      }
      val sigLegacy = graft.ext.Dedup.minhashSignatures(ex, 64)
      val tSigLegacy = timed {
        sigLegacy.write.format("noop").mode("overwrite").save()
      }
      val sig = graft.ext.Dedup.minhashSignaturesNative(
        docs, "doc_id", "text", 64)
      val tSig = timed {
        sig.write.format("noop").mode("overwrite").save()
      }
      println(f"[q65]   legacy sig-agg $tSigLegacy%.2f  native sig $tSig%.2f")
      val bandRows = sig
        .select(col("doc_id"),
          explode(graft.ext.Dedup.lshBands(col("sig"), 16, 4)).as("band"))
        .select(col("doc_id"), col("band.band_id").as("band_id"),
          col("band.band_hash").as("band_hash"))
      val tBands = timed { bandRows.write.format("noop").mode("overwrite").save() }
      val buckets = bandRows
        .groupBy(col("band_id"), col("band_hash"))
        .agg(graft.functions.BoundedCollect.collectIds(col("doc_id"), 1000)
          .as("ids"))
      val tBuckets = timed { buckets.write.format("noop").mode("overwrite").save() }
      println(f"[q65]   bands-only $tBands%.2f  buckets(collect) $tBuckets%.2f")
      val cand = buckets
        .select(explode(col("ids")).as("doc_id_a"), col("ids"))
        .select(col("doc_id_a"), explode(col("ids")).as("doc_id_b"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .distinct()
      val tCand = timed {
        cand.write.format("noop").mode("overwrite").save()
      }
      // minhashDupPairs stages+counts candidates EAGERLY at call time,
      // so tVerify times ONLY the verify join (corpus scan + broadcast
      // + pair agg + jaccard)
      val full = graft.ext.Dedup.minhashDupPairs(
        docs, "doc_id", "text", k = 64, bands = 16, threshold = 0.3)
      jobLog.clear()
      val tVerify = timed {
        full.write.format("noop").mode("overwrite").save()
      }
      jobReport("verify")
      val tVerifySorted = timed {
        full.orderBy(col("doc_id_a"), col("doc_id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      jobReport("verify+sort")
      val tStageThenSort = timed {
        graft.Staging.checkpoint(full, "q65-pairs")
          .orderBy(col("doc_id_a"), col("doc_id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      jobReport("stage+sort")
      if (i == 1) {
        val sorted = full.orderBy(col("doc_id_a"), col("doc_id_b"))
        println("[q65]   sorted executedPlan head: " +
          sorted.queryExecution.executedPlan.getClass.getSimpleName)
        val pqDir = java.nio.file.Files.createTempDirectory("q65-pq")
        graft.Staging.trackForCleanup(pqDir)
        val pq = pqDir.toString
        val tPq = timed {
          sorted.write.mode("overwrite").parquet(pq)
        }
        jobReport("verify+sort->parquet")
        println(f"[q65]   verify+sort->parquet $tPq%.2f")
      }
      val tScan = timed {
        docs.select(col("doc_id"), col("text"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[q65] run $i: shingles $tShingle%.2f  +sig $tSig%.2f  " +
        f"+cand $tCand%.2f  verify $tVerify%.2f  " +
        f"verify+sort $tVerifySorted%.2f  stage+sort $tStageThenSort%.2f  " +
        f"scan $tScan%.2f")
    }
    spark.stop()
  }
}
