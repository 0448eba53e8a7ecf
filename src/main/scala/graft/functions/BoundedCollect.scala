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
// boxed input so NULL ids are SKIPPED like collect_list skips them —
// a primitive Long input would decode a null row as id 0L, emitting a
// phantom document 0 into candidate pairs AND inflating the group
// count toward the cap (the KmvSketch null trap, same fix)
final class BoundedCollect(cap: Int)
    extends Aggregator[java.lang.Long, (Long, Seq[Long]), Seq[Long]] {

  override def zero: (Long, Seq[Long]) = (0L, Vector.empty)

  override def reduce(b: (Long, Seq[Long]), a: java.lang.Long): (Long, Seq[Long]) =
    if (a eq null) b
    else (b._1 + 1, if (b._1 < cap + 1) b._2 :+ a.longValue else b._2)

  override def merge(x: (Long, Seq[Long]), y: (Long, Seq[Long]))
      : (Long, Seq[Long]) =
    (x._1 + y._1, (x._2 ++ y._2).take(cap + 1))

  override def finish(b: (Long, Seq[Long])): Seq[Long] =
    if (b._1 <= cap) b._2 else Vector.empty

  override def bufferEncoder: Encoder[(Long, Seq[Long])] =
    Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[Seq[Long]]](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()))

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BoundedCollect {
  /** Column aggregate: ids per group, or empty when the group exceeds cap. */
  def collectIds(c: Column, cap: Int): Column =
    org.apache.spark.sql.functions.udaf(new BoundedCollect(cap)).apply(c)
}
