package graft
import org.apache.spark.sql.SparkSession

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
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
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
      val raw = gen.purchases.map(graft.generator.EventGenerator.toJson).toDF("value")
      val out = java.nio.file.Files.createTempDirectory("bench-silver").toString
      val t0 = System.nanoTime()
      graft.ingest.Silver.writeSilver(
        graft.ingest.Silver.parsePurchases(raw), out)
      (System.nanoTime() - t0) / 1e9
    }
    // two runs, report the min: the first run pays one-time plan
    // codegen/JIT that a steady-state workload never sees
    val results = SparkEntry.headlines.map { n =>
      val t1 = runOne(n); val t2 = runOne(n)
      n -> (if (t1 < 0 || t2 < 0) math.max(t1, t2) else math.min(t1, t2))
    } :+ ("ingest_parse_write_100k" -> ingestSec)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
