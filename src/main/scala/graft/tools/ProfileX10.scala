package graft.tools

/** Dev utility: variance-check a registered query against the Bench
  * 10× scaled corpus (same construction as the BENCH x10 probe).
  * Usage: runMain graft.tools.ProfileX10 <sfDir> <queryName> [repeat]
  */
object ProfileX10 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val dir10 = graft.Bench.buildScaledCorpus(spark, dir, copies = 10)
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir10).count()
      println(f"[x10] $name run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
