package graft

import org.apache.spark.sql.functions._
import graft.gold.AtomicTable
import graft.streaming.StreamingSurvivorship

/** The streaming survivorship keeper holds exactly one best copy per
  * content fingerprint across micro-batches, displaces on better,
  * absorbs worse WITHOUT a version bump, and is a fixed point of
  * at-least-once replay.
  */
class StreamingSurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("doc_id", "source", "priority", "text")

  test("keeper displaces on better priority, absorbs worse version-stably; replay converges") {
    val root = tmpDir("surv-keeper")
    // batch 1: two rearranged copies of one doc (same vocab set) from
    // a low-trust source (priority 9), plus an unrelated doc
    StreamingSurvivorship.processBatch(df(Seq(
      (100L, "webdump", 9L, "alpha beta gamma"),
      (101L, "webdump", 9L, "gamma beta alpha beta"),
      (102L, "webdump", 9L, "unrelated content entirely"))), root)
    def keepers = AtomicTable.read(spark, root)
      .select("fp", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(keepers.length === 2) // intra-batch winner: doc 100 (min id)
    assert(keepers.exists(k => k._2 == 100L))
    val v1 = AtomicTable.latestVersion(root).get

    // batch 2: the SAME content arrives from a curated source
    // (priority 1) with a HIGHER doc_id — it must displace doc 100
    StreamingSurvivorship.processBatch(df(Seq(
      (500L, "curated", 1L, "beta alpha gamma alpha"))), root)
    assert(keepers.count(_._2 == 500L) === 1)
    assert(!keepers.exists(_._2 == 100L))

    // batch 3: a WORSE copy (priority 9, higher id) — absorbed with
    // NO new version committed
    val v2 = AtomicTable.latestVersion(root).get
    StreamingSurvivorship.processBatch(df(Seq(
      (900L, "webdump", 9L, "alpha gamma beta"))), root)
    assert(AtomicTable.latestVersion(root).get === v2)
    assert(keepers.count(_._2 == 500L) === 1)

    // at-least-once replay of batch 2: identical winners → no commit
    StreamingSurvivorship.processBatch(df(Seq(
      (500L, "curated", 1L, "beta alpha gamma alpha"))), root)
    assert(AtomicTable.latestVersion(root).get === v2)
    assert(keepers.length === 2)
    assert(v1 >= 0 && v2 > v1)
  }

  test("a NULL-priority (dirty) copy never displaces a genuine keeper") {
    // priority missing/unparseable → cast nulls it → default ascending
    // NULLS FIRST would crown the dirty copy permanently; nulls-last
    // keeps it subordinate to ANY real priority
    val root = tmpDir("surv-nullprio")
    StreamingSurvivorship.processBatch(df(Seq(
      (100L, "curated", 5L, "alpha beta gamma"))), root)
    val dirty = Seq((200L, "webdump", "alpha gamma beta"))
      .toDF("doc_id", "source", "text")
      .withColumn("priority", lit(null).cast("string")) // unparseable
    StreamingSurvivorship.processBatch(
      dirty.select(col("doc_id"), col("source"), col("priority"), col("text")),
      root)
    val keeper = AtomicTable.read(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(keeper === Seq(100L)) // the real-priority keeper survives
  }

  test("full tie on (fp, priority, doc_id) resolves deterministically; replay commits nothing") {
    val root = tmpDir("surv-tie")
    // same doc_id, priority, and token SET (so same fp) with different
    // raw text: only a total order over the row content keeps the
    // winner stable — a nondeterministic pick would flip the exceptAll
    // delta between the gate and a replay, committing a version per run
    val tied = df(Seq(
      (7L, "feed", 1L, "beta alpha"),
      (7L, "feed", 1L, "alpha beta beta")))
    StreamingSurvivorship.processBatch(tied, root)
    val v1 = AtomicTable.latestVersion(root).get
    val kept1 = AtomicTable.read(spark, root)
      .select("text").as[String].collect().toSeq
    assert(kept1 === Seq("alpha beta beta")) // (source, text)-least wins
    StreamingSurvivorship.processBatch(tied, root) // pure replay
    assert(AtomicTable.latestVersion(root).get === v1)
    assert(AtomicTable.read(spark, root)
      .select("text").as[String].collect().toSeq === kept1)
  }
}
