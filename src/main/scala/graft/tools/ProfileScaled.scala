package graft.tools

/** Dev utility: time registered queries against a Bench-style scaled
  * corpus with the Bench methodology (noop sink, cache clear + GC
  * before each run). Usage:
  *   runMain graft.tools.ProfileScaled <sfDir> <copies> <repeat> <query ...>
  * copies = 1 runs against sfDir directly.
  */
object ProfileScaled {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val copies = args(1).toInt
    val repeat = args(2).toInt
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val runDir =
      if (copies <= 1) dir
      else graft.Bench.buildScaledCorpus(spark, dir, copies)
    // task-sec + task-count per run (r22): same listener shape as the
    // bench diag's, so the probe can attribute wall movement to CPU
    // work vs latency without a full bench run
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val taskN = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            taskMs.addAndGet(e.taskMetrics.executorRunTime): Unit
            taskN.incrementAndGet(): Unit
          }
      })
    def settled(): (Long, Long) = {
      var prev = -1L; var v = taskMs.get(); var waited = 0
      while (v != prev && waited < 1000) {
        prev = v; Thread.sleep(50); waited += 50; v = taskMs.get()
      }
      (v, taskN.get())
    }
    // warmup outside timing
    spark.read.parquet(s"$dir/nation.parquet").count()
    names.foreach { name =>
      (1 to repeat).foreach { i =>
        spark.catalog.clearCache()
        System.gc()
        val (ms0, n0) = settled()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, runDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val (ms1, n1) = settled()
        println(f"[x$copies%d] $name run $i: $wall%.2f s  " +
          f"task ${(ms1 - ms0) / 1e3}%.1f s  tasks ${n1 - n0}%d")
      }
    }
    spark.stop()
  }
}
