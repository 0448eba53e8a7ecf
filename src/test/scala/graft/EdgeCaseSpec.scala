package graft

import org.apache.spark.sql.functions._
import graft.ext.{Chunking, LanguageModel, Packing, Sampling, TextAnalysis}

/** Adversarial-input hardening for the training-prep operators: empty
  * text, single token, Unicode, and degenerate corpora must produce
  * sane outputs, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val weird = Seq(
    (1L, ""),                               // empty
    (2L, "solo"),                           // single token
    (3L, "   leading and trailing   "),     // whitespace padding
    (4L, "汉字 字符 混合 text mixed"),        // Unicode tokens
    (5L, (1 to 50000).map(_ => "w").mkString(" "))) // 50k-token doc
  private def docs = weird.toDF("doc_id", "text")

  test("tokenChunks: every doc chunks, the 50k doc tiles completely") {
    val got = Chunking.tokenChunks(docs, "doc_id", "text")
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        max(col("start_tok") + col("n_chunk_tokens")).as("covered"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((1L, 1L)))   // empty text → one ["" ] token
    assert(got(2L) === ((1L, 1L)))
    assert(got(5L)._2 === 50000L)    // last chunk reaches the end
    assert(got(5L)._1 === (50000 - 128 + 95) / 96 + 1)
  }

  test("unigramSurprisal: defined for every doc, zero-prob impossible") {
    val got = LanguageModel.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(got.length === weird.length)
    assert(got.forall(r => !r._3.isNaN && !r._3.isInfinite && r._3 >= 0.0))
  }

  test("bigramSurprisal: sub-2-token docs drop out cleanly, rest finite") {
    val got = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    // docs 1 and 2 have < 2 tokens → no bigram rows (not NaN rows)
    assert(got.map(_._1).toSet === Set(3L, 4L, 5L))
    assert(got.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("paddingStats clamps past maxLen; groupHashSample survives tiny strata") {
    val ps = Packing.paddingStats(docs, TextAnalysis.tokenCount(col("text")))
      .as[(Long, Long, Long, Double)].collect()
    assert(ps.map(_._1).max === 2048L) // the 50k doc clamps to the top rung
    assert(ps.forall(r => r._4 >= -1e-9))
    val gs = Sampling.groupHashSample(
      docs.withColumn("g", lit("one")), "g", "doc_id", k = 100)
    assert(gs.count() === weird.length) // k > stratum size → whole stratum
  }

  test("8-gram shingles: sub-8-token docs yield no shingles, 50k doc tiles") {
    val got = docs.select(col("doc_id"),
      size(graft.ext.Dedup.shingleSeq(graft.ext.Dedup.tokens(col("text")), 8))
        .as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) === 0 && got(2L) === 0 && got(4L) === 0)
    assert(got(5L) === 50000 - 7) // stride-1 windows cover the doc
  }

  test("adjacent-pair builder: sub-2-token docs pair nothing, never throw") {
    // the exact production expression behind q123's bigram rows
    val toks = graft.ext.Dedup.tokens(col("text"))
    val pairs = docs.select(col("doc_id"),
      size(graft.ext.Dedup.pairSeq(toks)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(pairs(1L) === 0 && pairs(2L) === 0)
    assert(pairs(3L) === 2 && pairs(5L) === 49999)
  }

  test("quality/langId/fingerprint expressions never throw on weird input") {
    val got = docs.select(
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.qualityFilter(col("text")).as("gate"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect()
    assert(got.length === weird.length)
    assert(got.forall(r => !r.getDouble(0).isNaN))
  }
}
