package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev scratch: stage-by-stage timing of the MinHash dedup pipeline. */
object ProfileQ65 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd")
      val docs = graft.queries.Tables.load(spark, dir, "documents")
      val exploded = Dedup.explodedShingles(docs, "doc_id", "text")
      time("exploded count")(exploded.count())
      val sigs = Dedup.minhashSignatures(exploded)
      time("signatures count")(sigs.count())
      val buckets = sigs
        .select(col("doc_id"), explode(Dedup.lshBands(col("sig"), 16, 4)).as("band"))
        .select(col("doc_id"), col("band.band_id").as("band_id"),
          col("band.band_hash").as("band_hash"))
      time("buckets count")(buckets.count())
      val bucketed = buckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val oversized = bucketed.groupBy(col("band_id"), col("band_hash"))
        .agg(count(lit(1)).as("bucket_n")).filter(col("bucket_n") > 1000)
        .select(col("band_id"), col("band_hash"))
      time("oversized count")(oversized.count())
      val candidates = bucketed
        .join(broadcast(oversized), Seq("band_id", "band_hash"), "left_anti")
        .groupBy(col("band_id"), col("band_hash"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .select(explode(col("ids")).as("doc_id_a"), col("ids"))
        .select(col("doc_id_a"), explode(col("ids")).as("doc_id_b"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .distinct()
      time("candidates count")(candidates.count())
      time("candidates again")(candidates.count())
      val base = docs.select(col("doc_id"), col("text"))
      val withTextA = base
        .select(col("doc_id").as("doc_id_a"), col("text").as("text_a"))
        .join(broadcast(candidates), Seq("doc_id_a"))
      val verified = base.select(col("doc_id").as("doc_id_b"), col("text").as("text_b"))
        .join(broadcast(withTextA), Seq("doc_id_b"))
        .withColumn("jaccard_sim",
          round(Dedup.jaccard(Dedup.shingles(col("text_a")), Dedup.shingles(col("text_b"))), 6))
        .filter(col("jaccard_sim") >= 0.3)
      time("verified count")(verified.count())
      // variant A: fused count+collect (one shuffle, no pre-count pass)
      val candA = bucketed
        .groupBy(col("band_id"), col("band_hash"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) <= 1000)
        .select(explode(col("ids")).as("doc_id_a"), col("ids"))
        .select(col("doc_id_a"), explode(col("ids")).as("doc_id_b"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .distinct()
      time("candA count")(candA.count())
      time("candA again")(candA.count())
      // variant A verify chained
      val wta = docs.select(col("doc_id").as("doc_id_a"), col("text").as("text_a"))
        .join(broadcast(candA), Seq("doc_id_a"))
      val verA = docs.select(col("doc_id").as("doc_id_b"), col("text").as("text_b"))
        .join(broadcast(wta), Seq("doc_id_b"))
        .withColumn("jaccard_sim",
          round(Dedup.jaccard(Dedup.shingles(col("text_a")), Dedup.shingles(col("text_b"))), 6))
        .filter(col("jaccard_sim") >= 0.3)
      time("verA count")(verA.count())
      val full = Dedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.3)
      time("full pipeline")(full.count())
      time("full again")(full.count())
    }
    spark.stop()
  }
}
