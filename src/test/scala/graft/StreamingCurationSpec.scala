package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.gold.AtomicTable
import graft.streaming.StreamingCuration

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, tag: String) =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private val batch1 = Seq(
    (1L, words(10, "a")),   // keep → 1 chunk (10 tokens < window)
    (2L, words(150, "b")),  // keep → 2 chunks at window=128/stride=96
    (3L, "no"))             // too_short → drop log
  private val batch2 = Seq(
    (4L, words(20, "c")),   // keep → 1 chunk
    (5L, "!!! ,,, ;;; ... !!!"))// 5 tokens, 79% punct → punct_soup

  test("gate: drops logged with reasons, survivors chunked; replay converges") {
    val (chunks, drops) = (tmpDir("sc-chunks"), tmpDir("sc-drops"))
    StreamingCuration.processBatch(batch1.toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, drops)
      .as[(Long, String)].collect().toSet === Set((3L, "too_short")))
    val c1 = AtomicTable.read(spark, chunks)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
    assert(c1 === Set((1L, 0L), (2L, 0L), (2L, 1L)))

    // at-least-once replay: keyed merges replace, never duplicate
    StreamingCuration.processBatch(batch1.toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks).count() === 3)
    assert(AtomicTable.read(spark, drops).count() === 1)

    StreamingCuration.processBatch(batch2.toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks)
      .select("doc_id").distinct().as[Long].collect().toSet === Set(1L, 2L, 4L))
    assert(AtomicTable.read(spark, drops)
      .as[(Long, String)].collect().toSet ===
      Set((3L, "too_short"), (5L, "punct_soup")))
  }

  test("NULL-text docs land in the drop log — they never silently vanish from both stores") {
    // without qualityFilter's null_text branch, a NULL-text doc gated
    // "keep": the chunker emitted no rows for it while both
    // group-replacement merges still deleted its prior state — the doc
    // vanished from chunk store AND drop log, breaking the "stores
    // reflect the latest observation of every touched doc" invariant
    val (chunks, drops) = (tmpDir("sc-null-chunks"), tmpDir("sc-null-drops"))
    StreamingCuration.processBatch(
      Seq((1L, Option(words(10, "a"))), (2L, Option.empty[String]))
        .toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, drops)
      .as[(Long, String)].collect().toSet === Set((2L, "null_text")))
    // keep → null flip: chunks shed, drop-log row appears
    StreamingCuration.processBatch(
      Seq((1L, Option.empty[String])).toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks).count() === 0)
    assert(AtomicTable.read(spark, drops)
      .as[(Long, String)].collect().toSet ===
      Set((1L, "null_text"), (2L, "null_text")))
  }

  test("re-ingest convergence: shorter docs shed stale chunks, keep/drop flips replace state") {
    val (chunks, drops) = (tmpDir("scr-chunks"), tmpDir("scr-drops"))
    StreamingCuration.processBatch(batch1.toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
      === Set((1L, 0L), (2L, 0L), (2L, 1L)))

    // doc 2 re-ingested SHORTER (150 → 10 tokens): 2 chunks → 1, and
    // the stale (2,1) row must be gone — the r3 ADVICE failure mode
    StreamingCuration.processBatch(
      Seq((2L, words(10, "b"))).toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
      === Set((1L, 0L), (2L, 0L)))

    // doc 2 flips keep → drop: all its chunks vanish, drop row appears
    StreamingCuration.processBatch(
      Seq((2L, "no")).toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks)
      .select("doc_id").distinct().as[Long].collect().toSet === Set(1L))
    assert(AtomicTable.read(spark, drops)
      .as[(Long, String)].collect().toSet
      === Set((2L, "too_short"), (3L, "too_short")))

    // doc 3 flips drop → keep: its stale drop-log row is replaced too
    StreamingCuration.processBatch(
      Seq((3L, words(25, "c"))).toDF("doc_id", "text"), chunks, drops)
    assert(AtomicTable.read(spark, chunks)
      .select("doc_id").distinct().as[Long].collect().toSet === Set(1L, 3L))
    assert(AtomicTable.read(spark, drops)
      .as[(Long, String)].collect().toSet === Set((2L, "too_short")))
  }

  test("streaming wiring: MemoryStream micro-batch flows through the gate") {
    implicit val sqlCtx = spark.sqlContext
    val (chunks, drops) = (tmpDir("scs-chunks"), tmpDir("scs-drops"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(batch1)
    val q = StreamingCuration.start(
      stream.toDF().toDF("doc_id", "text"),
      chunks, drops, tmpDir("scs-ckpt"), trigger = Trigger.AvailableNow())
    q.awaitTermination()
    assert(AtomicTable.read(spark, chunks).count() === 3)
    assert(AtomicTable.read(spark, drops).count() === 1)
  }

  test("rollback: a bad commit is reversible with zero data I/O, history intact") {
    val root = tmpDir("rb")
    AtomicTable.merge(spark, Seq((1L, "good")).toDF("k", "v"), root, "k")
    val goodV = AtomicTable.latestVersion(root).get
    AtomicTable.merge(spark, Seq((1L, "BAD"), (2L, "BAD2")).toDF("k", "v"),
      root, "k")
    assert(AtomicTable.read(spark, root).count() === 2)
    val rolledV = AtomicTable.rollback(root, goodV)
    assert(rolledV > goodV)
    assert(AtomicTable.read(spark, root)
      .as[(Long, String)].collect().toSeq === Seq((1L, "good")))
    // the bad snapshot remains time-travelable until vacuumed
    assert(AtomicTable.readVersion(spark, root, rolledV - 1).count() === 2)
    // rolling back to the state we're already at is a no-op
    assert(AtomicTable.rollback(root, rolledV) === rolledV)
  }
}
