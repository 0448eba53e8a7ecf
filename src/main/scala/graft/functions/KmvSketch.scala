package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the engine's custom-UDAF surface (SURVEY.md §2.12).
  *
  * Keeps the k smallest xxhash64 values of the column; the cardinality
  * estimate is (k−1) · 2⁶⁴ / (maxKept − Long.MinValue). Properties
  * that make it the right sketch for a 100 TB engine:
  *  - DETERMINISTIC: unlike reservoir sampling, the k minima are
  *    independent of row order, partitioning, and merge order — runs
  *    hash-compare stable;
  *  - mergeable: partial sketches union + truncate (map-side partial
  *    aggregation works);
  *  - doubles as a uniform sample of the DISTINCT values' hashes.
  *
  * Spark's builtin approx_count_distinct (HLL) is cheaper per row; KMV
  * earns its place when the same pass must also yield a distinct-value
  * sample or an intersection estimate between sketches.
  */
object KmvSketch {

  /** Sorted ascending, at most k values. */
  final case class Buf(k: Int, values: Vector[Long])

  // boxed input so NULL column values can be SKIPPED like
  // COUNT(DISTINCT)/approx_count_distinct skip them — a primitive Long
  // input would decode null rows as 0L and count a phantom distinct
  final class KmvAggregator(k: Int)
      extends Aggregator[java.lang.Long, Buf, Double] {
    require(k >= 2, "k >= 2")

    override def zero: Buf = Buf(k, Vector.empty)

    private def insert(b: Buf, h: Long): Buf =
      if (b.values.length >= b.k && h >= b.values.last) b
      else {
        val idx = b.values.search(h)(Ordering.Long) match {
          case scala.collection.Searching.Found(i) => return b // distinct sketch: dedupe
          case scala.collection.Searching.InsertionPoint(i) => i
        }
        Buf(b.k, (b.values.take(idx) :+ h) ++ b.values.drop(idx) take b.k)
      }

    override def reduce(b: Buf, a: java.lang.Long): Buf =
      if (a eq null) b else insert(b, a.longValue)

    override def merge(b1: Buf, b2: Buf): Buf =
      b2.values.foldLeft(b1)(insert)

    override def finish(b: Buf): Double =
      if (b.values.length < b.k) b.values.length.toDouble // exact below k
      else {
        // fraction of the hash space covered by the k minima
        val span = (b.values.last.toDouble - Long.MinValue.toDouble)
        (b.k - 1).toDouble * (math.pow(2, 64) / span)
      }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `kmvDistinct(k)(xxhash64-able column)`. NULLs are
    * skipped (COUNT(DISTINCT) semantics): xxhash64(null) would
    * otherwise hash to the constant seed value and count as one
    * phantom distinct.
    */
  def kmvDistinct(k: Int)(c: Column): Column =
    udaf(new KmvAggregator(k))
      .apply(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c)))
}
