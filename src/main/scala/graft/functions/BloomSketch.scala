package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter membership sketch as a typed `Aggregator` plus a
  * pure-`Column` membership test (SURVEY.md §2.12 custom-UDAF surface;
  * the sketch half of the sketch-then-verify decontamination pattern,
  * q140).
  *
  * Split of labor chosen for Spark's execution model:
  *  - the BUILD side is a 1-row aggregate over the (small) reference
  *    set — a mergeable OR of fixed-size bit arrays, so map-side
  *    partial aggregation works and the result is independent of row
  *    order and partitioning (bit-deterministic, hash-compare stable);
  *  - the PROBE side is NOT a UDF: both hash values are computed as
  *    `xxhash64` columns and the k bit tests are builtin
  *    element_at/shiftright/bitwiseAND expressions over the broadcast
  *    bitmap, so the membership test stays inside whole-stage codegen
  *    on the corpus-scale scan where per-row cost matters.
  *
  * Agreement between the two sides is by CONSTRUCTION, not by
  * replicating a hash in two languages: the aggregator consumes the
  * same two `xxhash64` columns the probe computes, and both derive bit
  * index i as floorMod(h1 + i·h2, numBits) (Kirsch–Mitzenmacher double
  * hashing — k indices from two hashes with standard fp guarantees).
  *
  * Why it earns its place at 100 TB: the exact verify join on the gram
  * key is a SHUFFLE join once the reference set outgrows broadcast —
  * and unfiltered, the corpus side of that shuffle is every gram in
  * the training set. A few hundred KB of broadcast bitmap prefilters
  * that shuffle down to near-hit-scale (true hits + numBits-tunable
  * false positives), which is the difference between shuffling the
  * corpus and shuffling the report.
  */
object BloomSketch {

  /** Derived from a 64-bit base hash; kept as two columns so the
    * aggregator and the probe consume IDENTICAL values. h2 is forced
    * odd so the k probe indices never collapse onto one bit.
    */
  def hashPair(c: Column): (Column, Column) = {
    val h1 = xxhash64(c)
    val h2 = xxhash64(c, lit(1L)).bitwiseOR(lit(1L))
    (h1, h2)
  }

  final case class Buf(words: Array[Long])

  /** OR-mergeable fixed-size bitmap; input is the (h1, h2) pair from
    * [[hashPair]]. numBits must be a power of two ≥ 64.
    */
  final class BloomAggregator(numBits: Int, numHashes: Int)
      extends Aggregator[(Long, Long), Buf, Array[Long]] {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      "numBits must be a power of two >= 64")
    require(numHashes >= 1, "numHashes >= 1")

    override def zero: Buf = Buf(new Array[Long](numBits / 64))

    override def reduce(b: Buf, a: (Long, Long)): Buf = {
      // reduce mod numBits BEFORE the linear combination: keeps every
      // intermediate far from Long overflow (which ANSI mode turns
      // into a runtime error on the Column side — both sides use the
      // congruent small-domain form so the bits agree exactly)
      val m = numBits.toLong
      val h1 = java.lang.Math.floorMod(a._1, m)
      val h2 = java.lang.Math.floorMod(a._2, m)
      var i = 0
      while (i < numHashes) {
        // Long combination: h1 + i·h2 can pass 2^31 for numBits up to
        // the allowed 2^30 (Int math would wrap negative — crash or,
        // worse, bits that disagree with the probe's Long pmod and
        // break the no-false-negatives guarantee)
        val idx = ((h1 + i.toLong * h2) % m).toInt
        b.words(idx >>> 6) |= 1L << (idx & 63)
        i += 1
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < b1.words.length) { b1.words(i) |= b2.words(i); i += 1 }
      b1
    }

    override def finish(b: Buf): Array[Long] = b.words

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** 1-row aggregate: the bitmap of every value's [[hashPair]]. */
  def bloomAgg(numBits: Int, numHashes: Int)(c: Column): Column = {
    val (h1, h2) = hashPair(c)
    udaf(new BloomAggregator(numBits, numHashes)).apply(h1, h2)
  }

  /** Membership test of `c` against bitmap column `bf` (the
    * [[bloomAgg]] result, usually ridden in on a broadcast 1-row
    * frame). Pure builtin expressions — stays in whole-stage codegen.
    * False positives possible (rate set by numBits/numHashes vs the
    * build-set size), false negatives impossible.
    */
  def mightContain(c: Column, bf: Column, numBits: Int, numHashes: Int): Column = {
    // same validation as BloomAggregator: numHashes=0 would die in an
    // obscure empty.reduce at plan build, and a numBits that differs
    // from the build side (non-power-of-two typo) yields bit indices
    // incongruent with the aggregator's — FALSE NEGATIVES, the one
    // failure mode a Bloom prefilter must never have
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      "numBits must be a power of two >= 64 (and equal the build side's)")
    require(numHashes >= 1, "numHashes >= 1")
    val (h1r, h2r) = hashPair(c)
    // same small-domain congruent form as the aggregator: mod first,
    // then the linear combination — no Long overflow under ANSI, and
    // word/bit indices via shift/mask (no double division anywhere)
    val h1 = pmod(h1r, lit(numBits.toLong))
    val h2 = pmod(h2r, lit(numBits.toLong))
    (0 until numHashes).map { i =>
      val idx = pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))
      val word = element_at(bf,
        call_function("shiftright", idx, lit(6)).cast("int") + lit(1))
      call_function("shiftright", word, idx.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
