package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/eval n-gram overlap sweep
  * every LLM training-data pipeline runs before a corpus ships: any
  * training document sharing a long-enough word n-gram with an
  * evaluation/benchmark document is flagged (and typically dropped),
  * so downstream eval numbers measure generalization, not leakage.
  *
  * Shape at 100 TB: benchmark suites are tiny (10^4–10^6 docs) while
  * the train corpus is the 100 TB side — so the EVAL side's exploded
  * n-gram index is the broadcast build side, and the train corpus
  * streams through one map-side hash join on the gram; the only
  * shuffle is the per-(train,eval)-pair count aggregate, whose size is
  * the contamination report itself (output-scale, not corpus-scale).
  * The train corpus is never shuffled and never materialized.
  */
object Decontam {

  /** (train_id, eval_id, n_shared_grams) for every train document
    * sharing at least one distinct word `n`-gram with an eval
    * document. Gram construction matches [[Dedup.explodedShingles]]
    * (lowercase, whitespace tokens), so the whole operator replays in
    * the DuckDB oracle.
    *
    * `broadcastEval = false` drops the hint for eval suites too large
    * to broadcast (≳10^8 grams): the join degrades to a shuffle on the
    * gram key — the train side then shuffles once, which is the
    * unavoidable cost when the index side itself is corpus-scale.
    */
  /** Exploded 64-bit gram digests — the r21 working representation
    * for both sweep variants: the gram is only ever an EQUALITY key
    * here (join + count_distinct; never displayed, never replayed
    * by value in an oracle), so the fused rolling digest
    * ([[graft.functions.GramHashes]], grouping-key collision argument
    * in graft.functions.TextHash) replaces corpus-wide n-gram STRING
    * construction on the big train side, and the index/shuffle carry
    * 8-byte longs instead of ~50-byte phrases. Distinct-gram counts
    * over digests equal counts over strings modulo 64-bit collisions.
    */
  private def gramDigests(df: DataFrame, idCol: String, textCol: String,
      n: Int, outId: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as(outId),
      explode(call_function("graft_gram_hashes",
        Dedup.tokens(col(textCol)), lit(n))).as("gram"))
  }

  def contaminationPairs(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    // eval side deduped per (doc, gram): the digest explode is NOT
    // per-doc-distinct, so an eval doc repeating a boilerplate gram
    // b times would inflate the broadcast index b× and multiply the
    // join output a·b per logical pair before count_distinct collapses
    // it. The TRAIN side stays raw — a distinct there would shuffle
    // the corpus, defeating the map-side streaming shape.
    val evalGrams = gramDigests(eval, idCol, textCol, n, "eval_id")
      .distinct()
    val trainGrams = gramDigests(train, idCol, textCol, n, "train_id")
    val index = if (broadcastEval) broadcast(evalGrams) else evalGrams
    trainGrams.join(index, Seq("gram"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count_distinct(col("gram")).as("n_shared_grams"))
  }

  /** [[contaminationPairs]] for the regime where the eval gram index
    * has outgrown broadcast: the exact join runs as a SHUFFLE join on
    * the gram key, and a Bloom filter of the eval grams
    * ([[graft.functions.BloomSketch]], a few hundred KB broadcast as a
    * 1-row frame) prefilters the train side MAP-SIDE first — so the
    * gram shuffle carries true hits plus a tunable trickle of false
    * positives instead of the whole corpus's gram stream. The output
    * is EXACT regardless of the fp rate: false positives die in the
    * exact join (they match no eval gram), and Bloom filters have no
    * false negatives — which is why this query hash-checks against the
    * same oracle as the broadcast-index path.
    *
    * (At this test scale Catalyst/AQE may still pick a broadcast for
    * the exact join — the operator forces the shuffle-join shape with
    * a merge hint so the plan under test is the 100 TB plan.)
    *
    * EAGER: the eval-side tokenize+shingle pipeline executes AT CALL
    * TIME (the stage below materializes it to a session-scoped parquet
    * dir that lives until JVM exit). Repeated calls in a long-lived
    * session each leave one eval-gram-sized staging dir; callers that
    * loop over many eval suites bound that by running inside
    * [[graft.Staging.scope]] and passing its stager as `stage` — every
    * staged dir is reclaimed when the scope's body returns (consume
    * the result inside the scope: the returned plan reads the staged
    * file). The default stager keeps the plain session-lifetime
    * behavior.
    */
  def bloomContaminationPairs(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      numBits: Int = 1 << 20, numHashes: Int = 5,
      stage: (DataFrame, String) => DataFrame =
        graft.Staging.checkpoint): DataFrame = {
    import graft.functions.BloomSketch
    // staged once: the (eval_id, gram) distinct frame feeds BOTH the
    // bloom build and the exact join — without the stage the whole
    // eval-side tokenize+shingle pipeline executes twice, in exactly
    // the too-big-to-broadcast regime this function exists for
    val evalGrams = stage(
      gramDigests(eval, idCol, textCol, n, "eval_id").distinct(),
      "decontam-eval-grams")
    val trainGrams = gramDigests(train, idCol, textCol, n, "train_id")
    val bloom = evalGrams.select(col("gram")).distinct()
      .agg(BloomSketch.bloomAgg(numBits, numHashes)(col("gram")).as("bf"))
    trainGrams
      .crossJoin(broadcast(bloom)) // 1 row: the bitmap
      .filter(BloomSketch.mightContain(col("gram"), col("bf"), numBits, numHashes))
      .drop("bf")
      .join(evalGrams.hint("merge"), Seq("gram"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count_distinct(col("gram")).as("n_shared_grams"))
  }
}
