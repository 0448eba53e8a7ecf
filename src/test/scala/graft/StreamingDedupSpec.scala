package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.gold.AtomicTable
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val day1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different text about distributed query engines and spark"))
  private val day2 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (11L, "fresh unrelated content that matches nothing seen before today"))

  test("incremental gate: day-2 batch flags near-dups against day-1 corpus; replay converges") {
    val (corpus, index, pairs) =
      (tmpDir("sd-corpus"), tmpDir("sd-index"), tmpDir("sd-pairs"))
    StreamingDedup.processBatch(day1.toDF("doc_id", "text"),
      corpus, index, pairs, threshold = 0.3)
    // day 1: empty history → no pairs table yet, corpus + index seeded
    assert(AtomicTable.latestVersion(pairs).isEmpty)
    assert(AtomicTable.read(spark, corpus).count() === 2)
    assert(AtomicTable.read(spark, index)
      .select("doc_id").distinct().count() === 2)

    StreamingDedup.processBatch(day2.toDF("doc_id", "text"),
      corpus, index, pairs, threshold = 0.3)
    val got = AtomicTable.read(spark, pairs)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L))) // the cross-day near-dup, nothing else
    assert(AtomicTable.read(spark, corpus).count() === 4)

    // at-least-once replay of day 2: its docs are already indexed, so
    // a naive re-run would self-match and duplicate — the gate's
    // anti-join + keyed merges must leave all three tables unchanged
    val pairsV = AtomicTable.latestVersion(pairs)
    StreamingDedup.processBatch(day2.toDF("doc_id", "text"),
      corpus, index, pairs, threshold = 0.3)
    assert(AtomicTable.read(spark, pairs)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet === got)
    assert(AtomicTable.read(spark, corpus).count() === 4)
    assert(AtomicTable.read(spark, index)
      .select("doc_id").distinct().count() === 4)
    // versions may bump (merge rewrites) but content is converged
    assert(pairsV.isDefined)
  }

  test("streaming wiring: MemoryStream micro-batch lands in the corpus through the gate") {
    implicit val sqlCtx = spark.sqlContext
    val (corpus, index, pairs) =
      (tmpDir("sds-corpus"), tmpDir("sds-index"), tmpDir("sds-pairs"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(day1)
    val q = StreamingDedup.start(
      stream.toDF().toDF("doc_id", "text"),
      corpus, index, pairs, tmpDir("sds-ckpt"),
      threshold = 0.3, trigger = Trigger.AvailableNow())
    q.awaitTermination()
    assert(AtomicTable.read(spark, corpus).count() === 2)
    assert(AtomicTable.read(spark, index).count() === 2 * 16) // 16 bands/doc
  }
}
