package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** r21 optimization equivalence gates for the fused text-hash
  * expressions (graft.functions.TextHashExpressions).
  *
  * The MinhashSig equality test is the load-bearing one: the q65/q76/
  * q86/q91 oracles are exact-Jaccard truth sets that hold only while
  * LSH recall stays 1, and recall is a function of the SIGNATURE
  * VALUES — so the native path must reproduce the aggregate
  * formulation bit for bit, not merely "work".
  */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  locally { graft.functions.GraftFunctions.register(spark) }

  private def randText(r: scala.util.Random, n: Int): String =
    Seq.fill(n)("tok" + r.nextInt(40)).mkString(" ")

  private val rnd = new scala.util.Random(7)
  private val docs = (
    (1L to 60L).map(i => (i, randText(rnd, 1 + rnd.nextInt(30)))) ++
      Seq(
        (101L, ""),                      // empty text → 1 empty token
        (102L, "one"),                   // < 3 tokens
        (103L, "one two"),               // < 3 tokens
        (104L, "a a a a a a"),           // duplicate shingles
        (105L, "Unicode Ω tokens λ mixed Δ case Ω tokens λ"),
        (106L, "  leading  and   trailing   whitespace  ")
      )).toDF("doc_id", "text")

  test("graft_minhash_sig ≡ explode + 64-column min(pmod) aggregate, bit for bit") {
    val legacy = Dedup.minhashSignatures(
        Dedup.explodedShingles(docs, "doc_id", "text"), 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = Dedup.minhashSignaturesNative(docs, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === legacy.keySet) // same doc set (short docs dropped)
    legacy.foreach { case (id, sig) =>
      assert(native(id) === sig, s"signature mismatch for doc $id")
    }
    // the short/empty docs really are absent from both
    assert(!native.contains(102L) && !native.contains(103L))
  }

  test("graft_minhash_sig: k=32 family sliced independently of k=64") {
    val n32 = Dedup.minhashSignaturesNative(docs, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val legacy = Dedup.minhashSignatures(
        Dedup.explodedShingles(docs, "doc_id", "text"), 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n32 === legacy)
  }

  test("graft_minhash_bands ≡ explode(lshBands) over the signature, bit for bit") {
    val legacy = Dedup.minhashSignaturesNative(docs, "doc_id", "text", 64)
      .select(col("doc_id"), explode(Dedup.lshBands(col("sig"), 16, 4)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fused = Dedup.lshBandRows(docs, "doc_id", "text", 64, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused === legacy)
    assert(fused.nonEmpty)
  }

  test("TextHash.modP ≡ % P on boundary and random non-negative inputs") {
    val P = graft.functions.TextHash.P
    val cases = Seq(0L, 1L, P - 1, P, P + 1, 2 * P - 1, 2 * P,
      (1L << 62) - 1, (P - 1) * (P - 1) + (P - 1)) ++
      Seq.fill(10000)(math.abs(rnd.nextLong()) % (1L << 62))
    cases.foreach { x =>
      assert(graft.functions.TextHash.modP(x) === x % P, s"x=$x")
    }
  }

  test("graft_gram_hashes: position count, order, equal-gram equality") {
    val df = Seq(
      (1L, "a b c d e"),      // 3 trigram positions
      (2L, "x y a b c d"),    // shares "a b c" / "b c d" with doc 1
      (3L, "a b"),            // too short → empty
      (4L, "")                // empty → 1 token → empty
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("graft_gram_hashes",
          Dedup.tokens(col("text")), lit(3)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L).length === 3)
    assert(df(2L).length === 4)
    assert(df(3L).isEmpty && df(4L).isEmpty)
    // equal grams hash equal regardless of position/document
    assert(df(1L)(0) === df(2L)(2)) // "a b c"
    assert(df(1L)(1) === df(2L)(3)) // "b c d"
    // distinct grams hash distinct (on this corpus)
    assert(df(1L).distinct.length === 3)
    // digest is a pure function of the token sequence, not the text
    val again = Seq((9L, "a  b   c d e")).toDF("doc_id", "text")
      .select(call_function("graft_gram_hashes",
        Dedup.tokens(col("text")), lit(3)).as("g"))
      .head().getSeq[Long](0)
    assert(again === df(1L))
  }

  test("graft_jaccard_shingles ≡ jaccard(shingles, shingles), incl. edge cases") {
    val pairsDf = Seq(
      ("the quick brown fox jumps over the lazy dog",
        "the quick brown fox leaps over the lazy dog"),
      ("a b c d e", "a b c d e"),                // identical
      ("a b c", "x y z"),                        // disjoint
      ("one two", "one two three four"),         // left too short → empty set
      ("Ω λ Δ Ω λ Δ repeat Ω λ Δ", "Ω λ Δ only"),
      ("a a a a", "a a a")                       // duplicate shingles collapse
    ).toDF("ta", "tb")
    val both = pairsDf.select(
      Dedup.jaccard(Dedup.shingles(col("ta")), Dedup.shingles(col("tb")))
        .as("legacy"),
      Dedup.jaccardTexts(col("ta"), col("tb")).as("native"))
      .collect()
    both.foreach { r =>
      val l = r.getDouble(0); val n = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(l) ===
        java.lang.Double.doubleToRawLongBits(n),
        s"legacy=$l native=$n")
    }
    // random corpus sweep
    val rd = new scala.util.Random(11)
    // ≥ 3 tokens on one side: a both-sides-empty gram union is the
    // ANSI 0/0 throw pinned below, not a comparable value
    val rand = (1 to 200).map(_ =>
      (randText(rd, 3 + rd.nextInt(22)), randText(rd, rd.nextInt(25))))
      .toDF("ta", "tb")
    val diff = rand.select(
      Dedup.jaccard(Dedup.shingles(col("ta")), Dedup.shingles(col("tb")))
        .as("legacy"),
      Dedup.jaccardTexts(col("ta"), col("tb")).as("native"))
      .collect()
      .count(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)) !=
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    assert(diff === 0)
    // both-empty gram sets: the legacy 0/0 THROWS under ANSI (and is
    // unreachable in the pipelines — banding candidates always carry
    // ≥ 1 shingle); the native form guards union == 0 to 0.0 (r22 —
    // a NaN here would pass every >= threshold filter and win desc
    // ranks for external callers). Pin the 0.0 so the divergence
    // stays a documented property, not an accident.
    val zero = Seq(("", "")).toDF("ta", "tb")
      .select(Dedup.jaccardTexts(col("ta"), col("tb"))).head().getDouble(0)
    assert(zero === 0.0)
  }

  test("substringDupSpans digest swap: same spans as the md5 formulation") {
    // hand-built corpus with a shared 4-token run and within-doc repeat
    val d = Seq(
      (1L, "p q r s t u v w"),
      (2L, "z z p q r s k k"),   // shares "p q r s" with doc 1
      (3L, "m m m m m m m m"),   // self-repeating gram
      (4L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupSpans(d, "doc_id", "text", w = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 1 is canonical for "p q r s": no dup tokens
    assert(got(1L) === 0L)
    // doc 2 loses its 4-token copy
    assert(got(2L) === 4L)
    // doc 3: 5 gram positions, position 0 canonical, 1..4 removable,
    // merged span covers tokens 1..7 → 7 tokens
    assert(got(3L) === 7L)
    assert(got(4L) === 0L)
  }
}
