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
  * distinct tokens, not every token occurrence), the vocabulary is a
  * second hash aggregate over that, the corpus total is a 1-row
  * scalar crossJoin (broadcast), and the scoring join is a shuffle
  * equi-join on the token key — vocabulary-scale, not corpus-scale.
  * No UDFs, no driver state.
  */
object LanguageModel {

  /** (doc_id, n_tokens, mean_surprisal): mean −ln(tf_tok / N) over the
    * document's token occurrences, rounded to 4dp.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val docTf = docs
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("dtf"))
    val vocab = docTf.groupBy(col("tok")).agg(sum(col("dtf")).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("n_total"))
    docTf.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("dtf")).as("n_tokens"),
        round(
          sum(col("dtf").cast("double") *
            -log(col("tf").cast("double") / col("n_total").cast("double")))
            / sum(col("dtf")).cast("double"), 4).as("mean_surprisal"))
  }
}
