package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * normalized-exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB posture):
  *  - exact/normalized dedup = hash groupBy on a digest → one shuffle
  *    on the digest key, map-side partial agg;
  *  - MinHash LSH: per-row signature is map-side only (O(k·shingles)),
  *    candidate generation shuffles on (band, band_hash) — never N²;
  *    oversized buckets (stop-shingle pathologies / skew) are capped;
  *  - SimHash: 64-bit fingerprint map-side; candidate pairs via
  *    pigeonhole blocking on 16-bit chunks (hamming ≤ 3 ⇒ some chunk
  *    equal), so the self-join is an equi-join, not a cross join;
  *  - exact verify (Jaccard) runs only on the candidate set.
  *
  * All expressions are Spark builtins (codegen'd, no UDFs);
  * determinism comes from xxhash64 + fixed multiply-add constants.
  */
object Dedup {

  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Distinct word n-gram shingles (default 3). */
  def shingles(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(t, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ── MinHash + LSH ─────────────────────────────────────────────────

  /** Universal hash family h_j(x) = (a_j·x + b_j) mod p over a base
    * xxhash64, with p = 2^31−1 and a_j,b_j < p so the arithmetic never
    * overflows a signed 64-bit long (Spark 4 runs ANSI mode — wrapping
    * multiply would throw). Constants from a seeded PRNG so signatures
    * are stable across runs/JVMs.
    */
  private val P = 2147483647L // 2^31 − 1 (Mersenne prime)

  private def hashFamily(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((rnd.nextInt(Int.MaxValue - 2) + 1L,
      rnd.nextInt(Int.MaxValue - 1).toLong))
  }

  /** MinHash signature (array<bigint> of length k) over shingles. */
  def minhashSignature(sh: Column, k: Int = 64): Column = {
    val base = transform(sh, s => pmod(xxhash64(s), lit(P)))
    val comps = hashFamily(k).map { case (a, b) =>
      array_min(transform(base, h => pmod(h * lit(a) + lit(b), lit(P))))
    }
    when(size(sh) > 0, array(comps: _*))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Explode a signature into (band_id, band_hash) LSH keys. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band_id"),
        xxhash64(slice(sig, b * rows + 1, lit(rows)), b).as("band_hash")))

  /** Candidate near-duplicate pairs via MinHash LSH, then exact-Jaccard
    * verified. Returns (doc_id_a, doc_id_b, jaccard_sim).
    *
    * @param maxBucket skip buckets larger than this (skew/stop-shingle cap)
    */
  def minhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    val withSig = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    val buckets = withSig
      .select(col("doc_id"), col("sh"),
        explode(lshBands(col("sig"), bands, rows)).as("band"))
      .select(col("doc_id"), col("sh"),
        col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    // cap pathological buckets before the self-join (skew guard)
    val capped = buckets
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_id"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket)
    val a = capped.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard_sim", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("doc_id_a"), col("doc_id_b"), col("jaccard_sim"))
  }

  // ── SimHash ───────────────────────────────────────────────────────

  /** 64-bit SimHash fingerprint over whitespace tokens (bigint). */
  def simhash64(textCol: Column): Column = {
    val t = tokens(textCol)
    // per-token ±1 bit contributions, summed across tokens
    val counters = aggregate(
      t,
      array_repeat(lit(0L), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(
            call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L))
      })
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (a, i) => a + when(element_at(counters, i + 1) > 0,
        call_function("shiftleft", lit(1L), i)).otherwise(0L))
  }

  /** Near-duplicate pairs by SimHash hamming distance ≤ maxDist (< 4):
    * pigeonhole on 4 × 16-bit chunks makes the candidate join an
    * equi-join on (chunk_id, chunk_value).
    */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "pigeonhole blocking uses 4 chunks ⇒ maxDist ≤ 3")
    val withSim = docs.select(col(idCol).as("doc_id"),
      simhash64(col(textCol)).as("simhash"))
    val chunked = withSim.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk_id"),
          call_function("shiftright", col("simhash"), c * 16)
            .bitwiseAND(0xFFFFL).as("chunk_value")))).as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.chunk_id").as("chunk_id"), col("ch.chunk_value").as("chunk_value"))
    val a = chunked.select(col("chunk_id"), col("chunk_value"),
      col("doc_id").as("doc_id_a"), col("simhash").as("sim_a"))
    val b = chunked.select(col("chunk_id"), col("chunk_value"),
      col("doc_id").as("doc_id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk_id", "chunk_value"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("bigint"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_id_a"), col("doc_id_b"), col("hamming"))
  }
}
