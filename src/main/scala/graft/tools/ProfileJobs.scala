package graft.tools

/** Dev utility (r22): job-level latency attribution for one registered
  * query — per run, every Spark job's wall and the DRIVER GAP since
  * the previous job ended (planning, staging-file round-trips, footer
  * reads, broadcast builds all hide in the gaps; the 1× bench entries
  * are latency-bound, so the gaps are where the headline seconds
  * live). Usage:
  *   runMain graft.tools.ProfileJobs <sfDir> <repeat> <query ...>
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val repeat = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    final case class J(id: Int, start: Long, var end: Long,
        var nTasks: Int, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(s.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .filter(_.nonEmpty)
            .getOrElse(s.stageInfos.map(_.name.takeWhile(_ != '+')).mkString("|"))
          jobs.put(s.jobId,
            J(s.jobId, s.time, -1L, s.stageInfos.map(_.numTasks).sum,
              d.take(70))): Unit
          order.add(s.jobId): Unit
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.get(e.jobId)
          if (j != null) j.end = e.time
        }
      })
    spark.read.parquet(s"$dir/nation.parquet").count()
    names.foreach { name =>
      (1 to repeat).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        jobs.clear(); order.clear()
        val t0ms = System.currentTimeMillis()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        var prevEnd = t0ms
        val rows = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
          .sortBy(_.start)
        println(f"[jobs] $name run $i wall $wall%.2f s, ${rows.size} jobs")
        rows.foreach { j =>
          val gap = (j.start - prevEnd) / 1e3
          val dur = if (j.end < 0) -1.0 else (j.end - j.start) / 1e3
          println(f"[jobs]   j${j.id}%-3d gap $gap%6.3f  dur $dur%6.3f  " +
            f"tasks ${j.nTasks}%-4d ${j.desc}")
          if (j.end > 0) prevEnd = j.end
        }
        val lastEnd = rows.filter(_.end > 0).map(_.end)
          .foldLeft(t0ms)(math.max)
        println(f"[jobs]   tail after last job: ${(t0ms + wall * 1000 - lastEnd) / 1e3}%.3f s")
      }
    }
    spark.stop()
  }
}
