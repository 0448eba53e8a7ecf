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
  * across re-runs: order is (shardCol, orderCol), both data-derived.
  */
object Packing {

  /** Adds `bin_id` (0-based within shard) + `run_tokens_before`. */
  def packByTokenBudget(docs: DataFrame, shardCol: Column, orderCol: Column,
      tokenCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("run_tokens_before",
        coalesce(sum(tokenCol).over(w), lit(0L)))
      .withColumn("bin_id",
        floor(col("run_tokens_before") / lit(budget.toDouble)).cast("bigint"))
  }
}
