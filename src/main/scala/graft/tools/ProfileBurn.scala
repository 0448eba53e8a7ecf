package graft.tools

/** Dev utility: repeated pure-CPU Spark jobs (a 3.2e9-row range sum,
  * 32 partitions, no IO, no shuffle beyond the final single-row agg)
  * with wall vs summed-task-time per run — separates "this host's
  * cores intermittently run slow" (task_time wobbles on a fixed-work
  * job) from workload-specific causes (codegen/JIT/staging) when a
  * bench entry's numbers won't settle.
  *
  * Usage: runMain graft.tools.ProfileBurn [repeat]
  */
object ProfileBurn {
  def main(args: Array[String]): Unit = {
    val repeat = args.headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            taskMs.addAndGet(e.taskMetrics.executorRunTime): Unit
          }
      })
    (1 to repeat).foreach { i =>
      taskMs.set(0)
      val t0 = System.nanoTime()
      // bit_xor, not sum: 3.2e9 ids summed overflows ANSI long math
      spark.range(0, 3200000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(id * 2 + 1) as s").collect(): Unit
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus settles
      println(f"[burn] run $i: wall $t%.2f s  task_time ${taskMs.get / 1000.0}%.1f s")
    }
    spark.stop()
  }
}
