package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistical language-model scoring: per-document mean
  * unigram surprisal −ln p(token) under the corpus' own empirical
  * unigram distribution. The standard cheap "perplexity-ish" quality
  * signal in training-data pipelines — documents of rare/garbled
  * tokens score high, boilerplate scores low — computed without any
  * external model artifact.
  *
  * Shape at 100 TB: tokens are aggregated to (doc, token, tf) FIRST
  * (map-side partial aggregation shrinks the shuffle to per-doc
  * distinct tokens, not every token occurrence), the corpus term
  * frequency is a tok-partitioned window over that one stream (r22 —
  * no vocab-scale build side, no second corpus pass), the corpus
  * total is a 1-row scalar crossJoin (broadcast). No UDFs, no driver
  * state.
  */
object LanguageModel {

  /** (doc_id, tok, dtf) pre-aggregation — the shared first stage of
    * every token-statistics operator (surprisal, vocab, OOV): map-side
    * partial aggregation shrinks the shuffle to per-doc distinct
    * tokens before any corpus-level work.
    */
  def docTermFreq(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("dtf"))

  /** Corpus term frequencies over a [[docTermFreq]] frame. */
  def vocabFreq(docTf: DataFrame): DataFrame =
    docTf.groupBy(col("tok")).agg(sum(col("dtf")).as("tf"))

  /** (doc_id, n_tokens, mean_surprisal): mean −ln(tf_tok / N) over the
    * document's token occurrences, rounded to 4dp.
    *
    * Determinism: the per-token surprisal is floored to 1e-9
    * fixed-point units (a long) BEFORE the dtf-weighted sum — the
    * q141/q145 convention — so the aggregation is exact integer
    * arithmetic in both engines and neither libm-vs-JVM `ln` ulp
    * drift nor summation order can move the 4dp-rounded mean.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val docTf = docTermFreq(docs, idCol, textCol)
    // r22 (guide §2): the corpus term frequency is a tok-partitioned
    // window SUM over docTf instead of a vocab aggregate joined back —
    // the join formulation planned the docTf subtree TWICE (once as
    // the probe side, once under the vocab aggregate: two corpus
    // scans + explodes) and repartitioned the token stream a second
    // time for the join; the window computes the identical tf (same
    // integer sum over the same dtf rows) in the one tok-keyed
    // exchange. At 100 TB this also drops the implicit bet that the
    // vocabulary fits a broadcast/SMJ build — the window never
    // materializes a vocab-scale side. Honest trade-off: a window
    // cannot split a hot key the way AQE splits join skew, so a
    // stop-word's group (≤ n_docs rows of ~24 B, docTf is per-doc
    // DISTINCT) lands in one task's spillable buffer; if vocabulary
    // skew ever makes that the straggler, the revert is the vocab
    // aggregate + tok join this replaced (AQE-splittable), paying the
    // second corpus scan back.
    // n_total = Σ tf over the vocab = Σ dtf over docTf = Σ per-doc
    // token-array sizes — computed from a column-pruned map-side pass
    // over the corpus (no explode, no aggregate chain): size(tokens)
    // is null exactly when explode drops the doc (null text), so the
    // long totals are equal by construction.
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok"))
    val total = docs.agg(
      sum(size(Dedup.tokens(col(textCol)))).as("n_total"))
    docTf.withColumn("tf", sum(col("dtf")).over(wTok))
      .crossJoin(broadcast(total))
      .withColumn("sp_fp",
        floor(-log(col("tf").cast("double") / col("n_total").cast("double"))
          * lit(1e9d)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("dtf")).as("n_tokens"),
        round((sum(col("dtf") * col("sp_fp")).cast("double") / lit(1e9d))
          / sum(col("dtf")).cast("double"), 4).as("mean_surprisal"))
  }

  /** DSIR-style importance weight (Xie et al., "Data Selection for
    * Language Models via Importance Resampling" — the unigram-LM
    * instantiation): per-document mean log-likelihood RATIO of the
    * TARGET domain's language model over the full-corpus (source)
    * model, add-one smoothed over the shared vocabulary. Positive →
    * the document looks more like the target domain than the corpus
    * at large; used to up-/down-weight documents when resampling a
    * raw crawl toward a quality domain.
    *
    * Shape: reuses [[docTermFreq]] (map-side pre-aggregation), builds
    * BOTH models from one docTf pass (target side via a semi-join on
    * the target ids), joins them token-keyed, and scores with one
    * vocabulary-scale equi-join + a 1-row totals broadcast — same
    * 100 TB posture as [[unigramSurprisal]], nothing corpus-scale
    * shuffles twice. Deterministic: counts are exact integers, and the
    * per-token log-ratio is floored to 1e-9 fixed-point units (a long)
    * BEFORE the weighted sum — the q141-PageRank convention — so the
    * aggregation is exact integer arithmetic in both engines; libm-vs-
    * JVM `ln` ulp drift and summation-order drift cannot move the
    * 4dp-rounded weight or flip the keep flag.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: org.apache.spark.sql.Column): DataFrame = {
    val docTf = docTermFreq(docs, idCol, textCol)
    val vocabS = vocabFreq(docTf)
    val targetIds = docs.filter(targetFilter).select(col(idCol).as("doc_id"))
    val vocabT = vocabFreq(docTf.join(targetIds, Seq("doc_id"), "left_semi"))
      .withColumnRenamed("tf", "tf_t")
    val vocab = vocabS.join(vocabT, Seq("tok"), "left")
      .select(col("tok"), col("tf").as("tf_s"),
        coalesce(col("tf_t"), lit(0L)).as("tf_t"))
    val totals = vocab.agg(sum(col("tf_s")).as("n_s"),
      sum(col("tf_t")).as("n_t"), count(lit(1)).as("v"))
    docTf.join(vocab, Seq("tok"))
      .crossJoin(broadcast(totals))
      // fixed-point nano-units: one libm call per (doc, tok), floored
      // to a long so everything downstream is exact integer math
      .withColumn("lr_fp",
        floor((log((col("tf_t") + lit(1L)).cast("double")
          / (col("n_t") + col("v")).cast("double"))
          - log((col("tf_s") + lit(1L)).cast("double")
            / (col("n_s") + col("v")).cast("double"))) * lit(1e9d))
          .cast("long"))
      .groupBy(col("doc_id"))
      // `+ 0.0` after the round normalizes IEEE signed zero: a tiny
      // NEGATIVE fixed-point sum rounds to -0.0 in DuckDB's ROUND but
      // +0.0 in Spark's HALF_UP BigDecimal path — float-equal, hash-
      // different. `-0.0 + 0.0 = +0.0` in both engines (IEEE-754), so
      // both sides of the oracle carry the same normalization. Repo
      // convention: every SIGNED rounded output column does this.
      .agg(sum(col("dtf")).as("n_tokens"),
        (round((sum(col("dtf") * col("lr_fp")).cast("double") / lit(1e9d))
          / sum(col("dtf")).cast("double"), 4) + lit(0.0)).as("log_weight"))
      // the resampling decision on the ROUNDED weight, so the flag is
      // exactly as engine-stable as the weight itself
      .withColumn("keep_target", (col("log_weight") > 0).cast("int"))
  }

  /** Interpolated bigram surprisal: mean of
    *   −ln( λ·p(w_i | w_{i−1}) + (1−λ)·p(w_i) )
    * over each document's bigram positions — the sharper LM quality
    * signal (catches shuffled-word salad that unigram stats score as
    * fluent). p(w|v) = corpus bigram count / corpus count of v as a
    * bigram head; p(w) = unigram MLE; λ fixed.
    *
    * Shape: doc-level (bigram, count) pre-aggregation → corpus bigram
    * model (one hash agg) → head-marginal agg → two key joins + a
    * scalar-total broadcast. Everything count-based and deterministic,
    * so the whole model replays in the SQL oracle.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("t"))
    // (doc, head, tail, count) for each adjacent pair — zip-of-slices,
    // same map-side shape as Dedup.shingleSeq
    val docBg = toks
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => struct(a.as("head"), b.as("tail")))).as("bg"))
      .select(col("doc_id"), col("bg.head").as("head"), col("bg.tail").as("tail"))
      .groupBy(col("doc_id"), col("head"), col("tail"))
      .agg(count(lit(1)).as("dbc"))
    val bgModel = docBg.groupBy(col("head"), col("tail"))
      .agg(sum(col("dbc")).as("bc"))
    val heads = bgModel.groupBy(col("head")).agg(sum(col("bc")).as("hc"))
    val uni = bgModel.groupBy(col("tail").as("w")).agg(sum(col("bc")).as("uc"))
    val total = uni.agg(sum(col("uc")).as("n_total"))
    docBg
      .join(bgModel, Seq("head", "tail"))
      .join(heads, Seq("head"))
      .join(uni, docBg("tail") === uni("w"))
      .crossJoin(broadcast(total))
      .withColumn("p",
        lit(lambda) * (col("bc").cast("double") / col("hc").cast("double"))
          + lit(1.0 - lambda)
          * (col("uc").cast("double") / col("n_total").cast("double")))
      // per-bigram surprisal in 1e-9 fixed-point (q141/q145
      // convention): the weighted sum is exact integer arithmetic,
      // immune to libm ulp and summation-order drift under the gate
      .withColumn("sp_fp", floor(-log(col("p")) * lit(1e9d)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("dbc")).as("n_bigrams"),
        round((sum(col("dbc") * col("sp_fp")).cast("double") / lit(1e9d))
          / sum(col("dbc")).cast("double"), 4).as("mean_bigram_surprisal"))
  }
}
