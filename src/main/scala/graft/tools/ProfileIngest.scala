package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: cost breakdown of the 100k-event ingest benchmark. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd")
      val gen = time("generate 100k (driver)")(
        graft.generator.EventGenerator.generate(
          graft.generator.EventGenerator.defaultProducts, 100000))
      val json = time("toJson (driver)")(
        gen.purchases.map(graft.generator.EventGenerator.toJson))
      val raw = json.toDF("value")
      time("parse only (noop)") {
        graft.ingest.Silver.parsePurchases(raw)
          .write.format("noop").mode("overwrite").save()
      }
      val out1 = java.nio.file.Files.createTempDirectory("prof-silver").toString
      time("parse + repartition + partitioned write") {
        graft.ingest.Silver.writeSilver(
          graft.ingest.Silver.parsePurchases(raw), out1)
      }
      val out2 = java.nio.file.Files.createTempDirectory("prof-silver").toString
      time("parse + flat write (no partitionBy)") {
        graft.ingest.Silver.parsePurchases(raw)
          .write.mode("append").parquet(out2)
      }
    }
    spark.stop()
  }
}
