package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Skew-safe bounded id-collection aggregate for LSH bucketing: collects
  * group members like `collect_list`, but once a group exceeds `cap`
  * members it stops RETAINING (while still counting) and finishes as an
  * empty list — so a pathological bucket (mass-duplicated content
  * hashing to one LSH band value) costs O(cap) memory instead of O(n),
  * and is dropped from candidate generation without a separate
  * count-pass + anti-join (one shuffle instead of three).
  *
  * Determinism: retention order varies with partial-merge order, but
  * the result is order-insensitive downstream (pair generation is a
  * set operation) and content-complete whenever n ≤ cap — reduce only
  * stops appending once the count passes cap, so a non-overflowing
  * group always finishes with ALL members.
  */
/** Aggregation buffer: total seen count `n` (may exceed the retained
  * length once the cap trips) + retained ids as a PRIMITIVE array —
  * r21: the (Long, Seq[Long]) tuple buffer boxed every id through the
  * ExpressionEncoder at each partial/final boundary and allocated a
  * persistent-Vector node per reduced row; with millions of
  * near-singleton LSH buckets per probe that encoder traffic was a
  * measurable slice of the candidate stage. `Array[Long]` encodes as
  * an unboxed UnsafeArrayData copy and appends with a plain copyOf
  * (buckets average ~1–2 members, and retention is capped). Semantics
  * are unchanged (BoundedCollectSpec's invariance suite pins them).
  */
final case class BoundedBuf(var n: Long, var ids: Array[Long])

// boxed input so NULL ids are SKIPPED like collect_list skips them —
// a primitive Long input would decode a null row as id 0L, emitting a
// phantom document 0 into candidate pairs AND inflating the group
// count toward the cap (the KmvSketch null trap, same fix)
final class BoundedCollect(cap: Int)
    extends Aggregator[java.lang.Long, BoundedBuf, Seq[Long]] {

  override def zero: BoundedBuf = BoundedBuf(0L, Array.emptyLongArray)

  override def reduce(b: BoundedBuf, a: java.lang.Long): BoundedBuf = {
    if (a eq null) return b
    if (b.n < cap + 1) {
      val grown = java.util.Arrays.copyOf(b.ids, b.ids.length + 1)
      grown(b.ids.length) = a.longValue
      b.ids = grown
    }
    b.n += 1
    b
  }

  override def merge(x: BoundedBuf, y: BoundedBuf): BoundedBuf = {
    val keep = math.min(cap + 1, x.ids.length + y.ids.length)
    val merged = java.util.Arrays.copyOf(x.ids, keep)
    if (keep > x.ids.length)
      System.arraycopy(y.ids, 0, merged, x.ids.length, keep - x.ids.length)
    BoundedBuf(x.n + y.n, merged)
  }

  override def finish(b: BoundedBuf): Seq[Long] =
    if (b.n <= cap) scala.collection.immutable.ArraySeq.unsafeWrapArray(b.ids)
    else Vector.empty

  override def bufferEncoder: Encoder[BoundedBuf] = Encoders.product[BoundedBuf]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BoundedCollect {
  /** Column aggregate: ids per group, or empty when the group exceeds cap. */
  def collectIds(c: Column, cap: Int): Column =
    org.apache.spark.sql.functions.udaf(new BoundedCollect(cap)).apply(c)
}
