package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: assign
  * documents to fixed token-budget bins by deterministic greedy
  * sequential fill — bin = ⌊tokens-before-this-doc / budget⌋ over a
  * stable order, so a bin overflows its budget by at most one
  * document (the standard greedy fill used when packing samples into
  * fixed-length training sequences).
  *
  * Scale shape: packing runs WITHIN shards (`shardCol`), so the
  * cumulative-sum window parallelizes across shards instead of
  * forcing a global single-task ordering — at 100 TB you pack each
  * output shard independently (shards are the unit training readers
  * consume anyway), one shuffle on the shard key. Deterministic
  * across re-runs ONLY when `orderCol` is a total order within each
  * shard — on ties, shuffle arrival order decides which doc's tokens
  * count first and bin assignments can differ between runs. Callers
  * pass a unique key or append one (q158 orders by
  * struct(-n_tok, doc_id) for exactly this reason); the oracle SQL
  * must sort by the same key, which is why the tiebreak belongs to
  * the caller, not this window.
  */
object Packing {

  /** Adds `bin_id` (0-based within shard) + `run_tokens_before`. */
  def packByTokenBudget(docs: DataFrame, shardCol: Column, orderCol: Column,
      tokenCol: Column, budget: Long): DataFrame = {
    // budget=0 would otherwise divide to Infinity → Long.MaxValue bins
    require(budget > 0, s"token budget must be positive: $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      // negative token counts (dirty input) would make the cumulative
      // sum non-monotone and, under DIV's truncate-toward-zero, pin
      // negative prefixes to bin 0 instead of a (meaningless) negative
      // bin — fail fast instead of packing garbage. The guard is a
      // FILTER, not an expression inside the window aggregate: the
      // (unboundedPreceding, -1) frame never consumes the LAST row of
      // a partition, so a guard embedded in the sum's input would skip
      // a trailing negative. A filter predicate evaluates on EVERY
      // row; assert_true returns NULL (isNull → keep) when the check
      // passes and throws when it fails. NULL counts stay allowed —
      // assert_true throws on non-true, and sum() has always ignored
      // them (a null contributes 0 tokens; only NEGATIVE is garbage).
      .filter(assert_true(tokenCol.isNull || tokenCol >= 0,
        concat(lit("packByTokenBudget: negative token count: "),
          tokenCol.cast("string"))).isNull)
      .withColumn("run_tokens_before",
        coalesce(sum(tokenCol).over(w), lit(0L)))
      // integer DIV, the Chunking/lengthBucket discipline: double
      // division loses integer precision past 2^53 cumulative tokens
      // and could shift a bin boundary by one
      .withColumn("bin_id",
        expr(s"run_tokens_before DIV ${budget}L").cast("bigint"))
  }

  /** Power-of-two length buckets on the ladder 32…`maxLen` (min 32,
    * clamp above): the batching alternative to packing — pad each
    * sequence to its bucket's length. Exact CASE ladder (no float
    * log2, whose boundary rounding differs across engines).
    */
  def lengthBucket(tokenCol: Column, maxLen: Int = 2048): Column = {
    // r > 0 stops the ladder if the doubling overflows Int (maxLen >
    // 2^30 would otherwise cycle -2^31 → 0 → 0... forever)
    val rungs = Iterator.iterate(32)(_ * 2)
      .takeWhile(r => r > 0 && r < maxLen).toSeq
    rungs.foldRight(lit(maxLen.toLong): Column) { (rung, rest) =>
      when(tokenCol <= rung, lit(rung.toLong)).otherwise(rest)
    }
  }

  /** Per-bucket padding economics: how many docs/tokens land in each
    * length bucket and what fraction of the padded batch is waste
    * (1 − Σmin(tokens, seq_len) / (n·seq_len) — tokens past the top
    * rung are TRUNCATED in a padding regime, so they never count as
    * negative waste; `sum_tokens` stays raw so the truncation loss is
    * visible as sum_tokens − n·seq_len). The number a pipeline owner
    * reads to pick packing vs padding. One map-side bucket expression
    * + one hash aggregate over ≤ log₂(maxLen) groups.
    */
  def paddingStats(docs: DataFrame, tokenCol: Column, maxLen: Int = 2048)
      : DataFrame =
    docs
      .withColumn("seq_len", lengthBucket(tokenCol, maxLen))
      .groupBy(col("seq_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCol).as("sum_tokens"),
        round(lit(1.0) - sum(least(tokenCol, col("seq_len"))).cast("double")
          / (count(lit(1)) * col("seq_len")).cast("double"), 4)
          .as("pad_frac"))
}
