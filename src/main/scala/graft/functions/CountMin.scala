package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch as a typed `Aggregator` (custom-UDAF surface,
  * SURVEY.md §2.12) — mergeable point-FREQUENCY estimates, completing
  * the sketch family next to KMV (distinct count) and Misra-Gries
  * (heavy-hitter candidates): d hash rows × w counters; an item's
  * estimate is the MIN of its d cells (Cormode & Muthukrishnan). The
  * estimate never undercounts, and overcounts by more than 2N/w with
  * probability at most 2^−d.
  *
  * Two properties make it the 100 TB shape:
  *  - the sketch is LINEAR (cell-wise sums), so map-side partial
  *    aggregation and any merge order produce the IDENTICAL d×w
  *    array — unlike MG, even the internal state is
  *    partitioning-invariant, which is why q148 can hash-check the
  *    estimates themselves against a DuckDB replay;
  *  - a corpus-scale token stream reduces to d·w longs (here 4×256)
  *    instead of a vocabulary-scale shuffle; point lookups then cost
  *    one broadcast row.
  *
  * Hashes are the repo's md5-60bit convention (`Dedup.md5Hash60` of
  * "cms<i>:<item>", mod w) so the whole sketch — build AND lookup —
  * replays exactly in DuckDB SQL.
  *
  * Input is (item, weight) so pre-aggregated term frequencies (one
  * row per (doc, token) instead of per occurrence) feed the sketch
  * without a re-explode; weight 1 recovers the per-occurrence form.
  */
object CountMin {

  final case class Buf(d: Int, w: Int, cells: Array[Long])

  /** Same value as `Dedup.md5Hash60` / the oracle's
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)` — the JVM-side
    * convention lives in [[Md5Hash60]] (shared with the multimodal
    * stub synthesis). The hex-format-then-parse form this replaced ran
    * a fresh getInstance plus 32 Formatter calls per hash, d times per
    * input row — the aggregation's dominant cost on a token stream.
    */
  def md5Hash60(s: String): Long = Md5Hash60.of(s.getBytes("UTF-8"))

  def bucket(i: Int, item: String, w: Int): Int =
    (md5Hash60(s"cms$i:$item") % w).toInt

  final class CountMinSketch(d: Int, w: Int)
      extends Aggregator[(String, Long), Buf, Seq[Long]] {
    require(d >= 1 && w >= 2, "d >= 1, w >= 2")

    override def zero: Buf = Buf(d, w, Array.fill(d * w)(0L))

    override def reduce(b: Buf, a: (String, Long)): Buf = {
      // null items are SKIPPED (COUNT semantics): interpolating one
      // into "cms<i>:null" would collide exactly with the real token
      // string "null" and inflate its estimate past the 2N/w bound —
      // an overcount a DuckDB replay (which drops NULLs) can't
      // reproduce. A null weight decodes as 0 through the primitive
      // Long and contributes nothing, which is already the right
      // semantics.
      if (a._1 == null) return b
      var i = 0
      while (i < b.d) {
        b.cells(i * b.w + bucket(i, a._1, b.w)) += a._2
        i += 1
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val out = Array.tabulate(b1.cells.length)(j =>
        b1.cells(j) + b2.cells(j))
      Buf(b1.d, b1.w, out)
    }

    override def finish(b: Buf): Seq[Long] = b.cells.toSeq

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: aggregates (item, weight) rows into the flattened
    * d×w cell array (row i occupies cells [i·w, (i+1)·w)).
    */
  def cmsSketch(d: Int, w: Int)(item: Column, weight: Column): Column =
    udaf(new CountMinSketch(d, w)).apply(item, weight)
}
