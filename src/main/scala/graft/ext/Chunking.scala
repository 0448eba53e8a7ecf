package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking — the stage that turns variable-length
  * documents into fixed-size overlapping token windows before
  * tokenization/training (RAG indexing and pretraining both need it).
  *
  * Chunk layout: windows of `window` tokens starting every `stride`
  * tokens (overlap = window − stride); a document of n tokens yields
  *   n ≤ window           → 1 chunk
  *   otherwise            → ⌈(n − window) / stride⌉ + 1 chunks
  * so the final chunk always reaches the last token and no chunk
  * starts past the text.
  *
  * Shape at 100 TB: pure map-side — tokenize, integer chunk-count
  * arithmetic, one `posexplode(sequence(...))` per document, array
  * `slice` per chunk. No shuffle, no state, no UDFs; everything stays
  * inside whole-stage codegen, and output size is corpus-linear
  * (≈ n/stride rows per doc). Tokenization matches
  * [[Dedup.tokens]] (lowercase, whitespace) so the whole operator
  * replays in the DuckDB oracle.
  */
object Chunking {

  /** One row per (doc, chunk): doc_id, chunk_id, start_tok,
    * n_chunk_tokens, chunk_md5 (md5 of the space-rejoined window).
    */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 128, stride: Int = 96): DataFrame =
    chunkFrames(docs, idCol, textCol, window, stride)
      .select(
        col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).cast("bigint").as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))

  /** [[tokenChunks]] with a 64-bit `chunk_digest` (xxhash64 of the
    * space-rejoined window) instead of the md5 string — for consumers
    * that use the digest ONLY as an equality key (q103's cross-doc
    * block-spread join): 8-byte shuffle keys, no cryptographic digest
    * per chunk, identical grouping modulo 64-bit collisions. q95
    * keeps [[tokenChunks]] — its oracle replays the md5 BY VALUE.
    */
  def tokenChunkDigests(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 128, stride: Int = 96): DataFrame =
    chunkFrames(docs, idCol, textCol, window, stride)
      .select(
        col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).cast("bigint").as("n_chunk_tokens"),
        xxhash64(array_join(col("chunk"), " ")).as("chunk_digest"))

  /** Shared chunking core: (doc_id, chunk_id, start_tok, chunk). */
  private def chunkFrames(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("bigint"))
      // integer DIV keeps the count exact (no float-boundary risk at
      // n − window ≡ 0 (mod stride))
      .withColumn("n_chunks",
        when(col("n_tokens") <= window, lit(1L))
          .otherwise(expr(
            s"(n_tokens - $window + ${stride - 1}) DIV $stride + 1")))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk_id", col("pos").cast("bigint"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(window)))
  }
}
