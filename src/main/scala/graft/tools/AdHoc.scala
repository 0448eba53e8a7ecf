package graft.tools

/** Dev utility: run one registered query against a testdata dir, print
  * wall time + row count (and rows with `show`). Usage:
  *   runMain graft.tools.AdHoc <sfDir> <queryName> [show|plan] [repeat]
  */
object AdHoc {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val mode = if (args.length > 2) args(2) else "count"
    val repeat = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(e.jobId, System.nanoTime())
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStarts.getOrDefault(e.jobId, 0L)
          if (t0 > 0) println(f"[job] ${e.jobId}%3d: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      })
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[adhoc] $name run $i: $n rows in $sec%.2f s")
      if (mode == "show" && i == repeat) df.show(50, truncate = false)
      if (mode == "plan" && i == repeat) df.explain("formatted")
      // repeat runs measure the same cold-cache state (queries
      // persist() intermediates that would otherwise accumulate)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
