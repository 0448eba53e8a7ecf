package graft.tools

/** Dev utility: attribute q93a (incremental-MV maintenance) cost to
  * its phases — the r6 VERDICT ask #5 ("check whether manifest
  * head-validation and zone-map recomputation run for untouched
  * partitions, and whether staging I/O can be batched"; done = ≤2 s
  * at sf0.1 or a diag fact naming the floor).
  *
  * Usage: runMain graft.tools.ProfileQ93 <sfDir> [repeat]
  */
object ProfileQ93 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeat = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    (1 to repeat).foreach { i =>
      val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
      graft.gold.AtomicTable.phaseSink = Some((n, s) =>
        phases.synchronized { phases(n) = phases.getOrElse(n, 0.0) + s })
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val root = graft.queries.EventQueries.mvMaintain(spark, dir)
      val tm = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.queries.EventQueries.mvRead(spark, root)
        .write.format("noop").mode("overwrite").save()
      val tr = (System.nanoTime() - t1) / 1e9
      graft.gold.AtomicTable.phaseSink = None
      println(f"[q93] run $i: maintain $tm%.3f s, read $tr%.3f s")
      phases.foreach { case (n, s) => println(f"[q93]   $n%-28s $s%.3f s") }
    }
    spark.stop()
  }
}
