package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / the 100 TB posture).
  * AQE's skew-join splitting handles sort-merge skew at runtime; these
  * are the explicit salting patterns for the cases AQE can't fix —
  * a hash-aggregate with a hot group key, and a shuffle join where one
  * side's hot key floods a single task.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. Splits a hot key across `buckets` tasks at
    * the cost of a second (tiny) shuffle. Correct for any algebraic
    * aggregate expressed as (partial, merge) pairs — here sum/count.
    * `n` is the ROW count (COUNT(*), the q121 oracle contract), so
    * total/n equals AVG(value) only when `value` has no NULLs — SQL
    * AVG skips null rows, count(lit(1)) does not.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16): DataFrame = {
    // any row-varying salt works: the final agg is invariant to how
    // the partial groups were split
    val salted = df
      .withColumn("__salt", (rand(42) * buckets).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
    salted.groupBy(col("key"))
      .agg(sum(col("__psum")).as("total"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted shuffle join for a skewed left side against a smaller (but
    * not broadcastable) right side: left gets a random salt in
    * [0, buckets), right is replicated `buckets` times with every salt
    * value, and the join key becomes (key, salt) — the hot key's rows
    * spread over `buckets` tasks instead of one.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt",
      (rand(42) * buckets).cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
