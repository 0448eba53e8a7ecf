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
    // warmup outside timing
    spark.read.parquet(s"$dir/nation.parquet").count()
    names.foreach { name =>
      (1 to repeat).foreach { i =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, runDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[x$copies%d] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
