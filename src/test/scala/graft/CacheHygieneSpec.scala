package graft

/** Round-4 hygiene contract (VERDICT/ADVICE r3): registered queries
  * leave ZERO cache-manager state behind once their result
  * materializes — no harness `clearCache()` required. Operators that
  * reuse an intermediate across actions stage it to disk
  * ([[graft.Staging.checkpoint]]) instead of `persist()`, and the few
  * remaining in-query persists are consumed and unpersisted before
  * the query returns. A long-lived session embedding the registry (a
  * notebook, a server) therefore cannot accumulate dead entries —
  * matching the reference's implicit serverless hygiene (dbt/Athena
  * sessions never carry state between statements;
  * `fct_purchases.sql` is stateless).
  */
class CacheHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cachedRdds: scala.collection.Map[Int, org.apache.spark.rdd.RDD[_]] =
    spark.sparkContext.getPersistentRDDs

  test("dedup queries run back-to-back leave the cache empty — no clearCache between") {
    assume(new java.io.File(dir).isDirectory)
    spark.catalog.clearCache() // clean slate; NOT repeated between queries
    val names = Seq("q87_dedup_method_agreement", "q76_dedup_clusters",
      "q86_curation_pipeline")
    names.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).collect().length
      assert(n >= 0)
      assert(cachedRdds.isEmpty,
        s"$name left ${cachedRdds.size} cached RDD(s) behind: " +
          cachedRdds.values.map(_.name).mkString(", "))
    }
  }

  test("q93 MV maintenance unpersists its partials before returning") {
    assume(new java.io.File(dir).isDirectory)
    spark.catalog.clearCache()
    val rows = SparkEntry.queries("q93_incremental_mv")(spark, dir)
      .collect().length
    assert(rows > 0)
    assert(cachedRdds.isEmpty,
      s"q93 left ${cachedRdds.size} cached RDD(s) behind")
  }

  test("Staging.scope reclaims every staged dir when the scope exits") {
    import spark.implicits._
    var stagedFiles: Seq[java.io.File] = Nil
    val total = graft.Staging.scope { stager =>
      // two independent stagings inside one scope (the
      // incrementalDupPairs-per-micro-batch shape); both must be
      // readable inside and gone after
      val a = stager(Seq(1, 2, 3).toDF("x"), "scope-a")
      val b = stager(Seq(10, 20).toDF("x"), "scope-b")
      stagedFiles = (a.inputFiles ++ b.inputFiles).toSeq
        .map(u => new java.io.File(new java.net.URI(u)))
      assert(stagedFiles.nonEmpty && stagedFiles.forall(_.exists))
      a.count() + b.count()
    }
    assert(total === 5)
    assert(stagedFiles.forall(!_.exists),
      "scope-staged files must be deleted at scope exit")
  }
}
