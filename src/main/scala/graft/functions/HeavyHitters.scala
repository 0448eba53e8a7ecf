package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` (the
  * custom-UDAF surface, SURVEY.md §2.12) — the candidate-pruning half
  * of the sketch-then-verify top-word pattern (q124).
  *
  * With k counters the summary GUARANTEES every item of true count
  * > N/(k+1) is present (undercount per item is bounded by the total
  * decrement mass ≤ N/(k+1)); the merge keeps that bound under
  * map-side partial aggregation (Agarwal et al., "Mergeable
  * Summaries": sum counts, subtract the (k+1)-th largest, drop ≤0).
  * The surviving WORD SET is therefore a superset of the true heavy
  * hitters no matter how rows are partitioned — which is what makes
  * the downstream exact-verify step deterministic even though the
  * sketch's internal counts are merge-order-dependent.
  *
  * Why this is the 100 TB shape: a full `groupBy(word)` shuffles the
  * whole vocabulary; MG shuffles at most k counters per partition, and
  * the exact pass then counts ONLY the (broadcast) candidate set — the
  * classic two-phase heavy-hitter query over a corpus whose vocab
  * doesn't fit a single aggregation comfortably.
  */
object HeavyHitters {

  final case class Buf(k: Int, counts: Map[String, Long])

  /** Candidate words only (sorted for stable display) — the counts are
    * merge-order-dependent lower bounds, so they stay private to the
    * sketch; callers re-count candidates exactly.
    */
  final case class Candidates(words: Seq[String])

  final class MisraGries(k: Int)
      extends Aggregator[String, Buf, Candidates] {
    require(k >= 1, "k >= 1")

    override def zero: Buf = Buf(k, Map.empty)

    override def reduce(b: Buf, a: String): Buf =
      b.counts.get(a) match {
        case Some(c) => Buf(b.k, b.counts.updated(a, c + 1))
        case None if b.counts.size < b.k =>
          Buf(b.k, b.counts.updated(a, 1L))
        case None =>
          // classic MG step: decrement every counter, drop zeros
          Buf(b.k, b.counts.collect {
            case (w, c) if c > 1 => w -> (c - 1)
          })
      }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val k = b1.k // every buffer carries this instance's constructor k
      val sum = b2.counts.foldLeft(b1.counts) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k) Buf(k, sum)
      else {
        // subtract the (k+1)-th largest count from all; at most k
        // entries stay strictly positive afterwards
        val d = sum.values.toIndexedSeq.sorted(Ordering.Long.reverse)(k)
        Buf(k, sum.collect { case (w, c) if c > d => w -> (c - d) })
      }
    }

    override def finish(b: Buf): Candidates =
      Candidates(b.counts.keys.toSeq.sorted)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Candidates] =
      Encoders.product[Candidates]
  }

  /** Column form: 1-row aggregate of a string column into a
    * `Candidates(words)` struct.
    */
  def mgCandidates(k: Int)(c: Column): Column =
    udaf(new MisraGries(k)).apply(c)
}
