package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup/text hot paths.
  *
  * The builtin formulation of a MinHash signature — explode shingle
  * strings, then a 64-column `min(pmod(h*a+b, P))` hash aggregate —
  * is algorithmically right (map-side partial agg, one shuffle of
  * per-doc state) but pays per SHINGLE ROW: two string concats to
  * build the shingle, a hash-agg probe, and 64 multiply+`pmod`s where
  * `pmod` lowers to two 64-bit `%` ops (§4 of the optimization guide:
  * the per-task work is the target once the shape is right). At the
  * x30 bench scale that is ~30M shingle rows × 64 components — ~100
  * task-seconds of pure signature arithmetic.
  *
  * [[MinhashSig]] computes the identical signature in one fused loop
  * per document row: shingle bytes assembled in a reused buffer
  * (no intermediate concat allocations), the same `xxhash64(seed=42)`
  * base hash, and the same multiply-add permutations reduced mod
  * P = 2^31−1 via Mersenne folding (shift/mask/add — no division)
  * instead of `%`. Values are BIT-IDENTICAL to the aggregate
  * formulation (spec-pinned), so banding, candidate generation, diag
  * counts and recall are unchanged — only the arithmetic route
  * differs. The explode, the 64-column aggregate and its exchange
  * disappear from the plan entirely: signatures become a map-side
  * projection.
  *
  * [[GramHashes]] is the grouping-key analogue for positioned n-gram
  * digests (q122 repeated-ngram mining, q125 substring spans): a
  * per-position 64-bit rolling polynomial over per-token xxhash64
  * values. The digest is used ONLY for equality (grouping /
  * canonical-pick windows / join keys) — never surfaced in a result
  * or replayed by an oracle — so any collision-resistant hash of the
  * token sequence is admissible; equal grams hash equal by
  * construction, and 64-bit collisions between the ≤ 10^8 distinct
  * grams a bench corpus holds are ~10^-4-per-corpus improbable (the
  * same class of risk as the md5-prefix digests it replaces, and far
  * below the seeded-family MinHash miss probability the registry
  * already carries). Replacing `md5(array_join(slice(...)))` — an
  * O(w) string build plus a cryptographic digest per position — with
  * an O(1)-amortized rolling update cuts the q125 gram pass from
  * ~90 task-seconds to low single digits at x30 and shrinks the
  * digest shuffle from 32-char strings to 8-byte longs.
  */
object TextHash {

  /** Mersenne prime modulus shared with [[graft.ext.Dedup]]. */
  val P: Long = 2147483647L

  /** `x mod P` for non-negative x < 2^62 via two Mersenne folds + one
    * conditional subtract — identical to `x % P` (and to Spark's
    * `pmod(x, P)` for non-negative x), with no 64-bit division.
    * Fold 1: x = q·2^31 + r ⇒ x ≡ q + r, bounded < 2^32.
    * Fold 2: bounds the sum ≤ P + 1; one subtract lands in [0, P).
    */
  @inline def modP(x: Long): Long = {
    var y = (x & P) + (x >>> 31)
    y = (y & P) + (y >>> 31)
    if (y >= P) y - P else y
  }

  /** The rolling-polynomial multiplier (odd ⇒ invertible mod 2^64). */
  val RollC: Long = 0x9E3779B97F4A7C15L
}

/** MinHash signature of a token array: `graft_minhash_sig(toks, k)`.
  *
  * Returns the length-`k` array<bigint> signature over the document's
  * word 3-gram shingles — bit-identical to
  * `min(pmod(pmod(xxhash64(shingle), P) * a_j + b_j, P))` grouped per
  * doc over exploded shingles with the seeded
  * [[graft.ext.Dedup.hashFamily]] constants (MinhashSigSpec pins the
  * equality). NULL for documents with no shingle (< 3 tokens, null
  * input) — exactly the docs the explode+aggregate formulation drops.
  */
case class MinhashSig(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  // the seeded multiply-add family — one resolve per expression
  // instance, shared across every row the instance evaluates
  @transient private lazy val fam: (Array[Long], Array[Long]) = {
    val f = graft.ext.Dedup.hashFamily(k)
    (f.map(_._1).toArray, f.map(_._2).toArray)
  }

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Any = {
    val (fa, fb) = fam
    val mins = MinhashSig.sigMins(arr, k, fa, fb)
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sigResult")
      s"""
        Object $r = $ref.compute($c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** The fused signature core: shingle bytes → xxhash64(42) → mod P →
    * k permutation minima. Returns null when no shingle exists.
    * Shared by [[MinhashSig]] (emits the raw signature) and
    * [[MinhashBands]] (folds the banded slices straight into LSH
    * band hashes).
    */
  def sigMins(arr: ArrayData, k: Int,
      fa: Array[Long], fb: Array[Long]): Array[Long] = {
    val m = arr.numElements()
    if (m < 3) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var buf: Array[Byte] = null
    var i = 0
    while (i <= m - 3) {
      // a null token nulls the concat'd shingle in the builtin
      // formulation, and null shingles are filtered before hashing —
      // skip them identically here (split() never emits one in
      // practice)
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1) && !arr.isNullAt(i + 2)) {
        val t0 = arr.getUTF8String(i)
        val t1 = arr.getUTF8String(i + 1)
        val t2 = arr.getUTF8String(i + 2)
        val n0 = t0.numBytes(); val n1 = t1.numBytes(); val n2 = t2.numBytes()
        val total = n0 + n1 + n2 + 2
        if (buf == null || buf.length < total)
          buf = new Array[Byte](math.max(total, 64))
        t0.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET)
        buf(n0) = ' '
        t1.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + n0 + 1)
        buf(n0 + 1 + n1) = ' '
        t2.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + n0 + 1 + n1 + 1)
        val raw = XXH64.hashUTF8String(UTF8String.fromBytes(buf, 0, total), 42L)
        // pmod(xxhash64, P): one fixup for the (possibly negative) raw
        var h = raw % TextHash.P
        if (h < 0) h += TextHash.P
        var j = 0
        while (j < k) {
          // h, a < P = 2^31−1 ⇒ h·a + b < 2^62: no overflow, and
          // modP ≡ pmod for the non-negative product
          val v = TextHash.modP(h * fa(j) + fb(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        any = true
      }
      i += 1
    }
    if (!any) null else mins
  }
}

/** LSH band hashes of a token array:
  * `graft_minhash_bands(toks, k, bands)` → array<bigint> of length
  * `bands`, where element b equals
  * `xxhash64(slice(sig, b·rows + 1, rows), b)` over the
  * [[MinhashSig]] signature — the exact value
  * [[graft.ext.Dedup.lshBands]] computes, reproduced by folding
  * Spark's own XXH64 primitives in the same order (seed 42 → fold
  * hashLong over the slice's components → fold hashInt(b) for the
  * trailing band-id argument; TextHashSpec pins the equality). NULL
  * for documents with no shingle. Exploding this with `posexplode`
  * yields (band_id = pos, band_hash = value) — the signature array,
  * its interpreted slice/transform banding, and the struct building
  * all disappear from the candidate plan.
  */
case class MinhashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with Serializable {
  require(bands >= 1 && bands <= k && k % bands == 0,
    s"bands must divide k: k=$k, bands=$bands")

  override def prettyName: String = "graft_minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  @transient private lazy val fam: (Array[Long], Array[Long]) = {
    val f = graft.ext.Dedup.hashFamily(k)
    (f.map(_._1).toArray, f.map(_._2).toArray)
  }

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Any = {
    val (fa, fb) = fam
    val mins = MinhashSig.sigMins(arr, k, fa, fb)
    if (mins == null) return null
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // xxhash64(array<bigint>, int) = fold hashLong over elements
      // from seed 42, then hashInt of the trailing int argument —
      // Spark's XxHash64Function.hash order, reproduced with the same
      // XXH64 primitives
      var h = 42L
      var r = 0
      while (r < rows) { h = XXH64.hashLong(mins(b * rows + r), h); r += 1 }
      out(b) = XXH64.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashBands", this, classOf[MinhashBands].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("bandsResult")
      s"""
        Object $r = $ref.compute($c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

/** Exact word n-gram Jaccard similarity of two token arrays:
  * `graft_jaccard_shingles(toksA, toksB, n)`.
  *
  * Semantically identical to
  * `size(array_intersect(A, B)) / size(array_union(A, B))` over
  * `A = array_distinct(shingleSeq(toks, n))` (the
  * [[graft.ext.Dedup.jaccard]]∘[[graft.ext.Dedup.shingles]]
  * composition): the gram SETS are built from the actual byte
  * strings (UTF8String equality — no hashing shortcut), the counts
  * are exact, and the division is the same raw double division
  * (0-gram ∕ 0-gram yields NaN in both formulations). What changes
  * is the evaluation route: the interpreted chain — two `zip_with`
  * lambda passes to build each gram array, `array_distinct`,
  * `array_intersect`, `array_union`, each a per-element interpreted
  * dispatch — becomes one fused set-membership loop. On the minhash
  * verify join (the per-candidate-pair hot path) the interpreted
  * chain was ~100 task-seconds at the x30 bench scale; this is ~1.
  * Null gram positions (null tokens — which split() never emits)
  * are skipped, matching the null-propagating concat in shingleSeq.
  */
case class JaccardShingles(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  require(n >= 1, s"graft_jaccard_shingles needs n >= 1, got $n")

  override def prettyName: String = "graft_jaccard_shingles"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _) | org.apache.spark.sql.types.NullType,
            ArrayType(StringType, _) | org.apache.spark.sql.types.NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> arguments, got ${l.sql}, ${r.sql}")
    }

  /** Distinct n-gram strings of a token array as a byte-equality set. */
  private def gramSet(arr: ArrayData): java.util.HashSet[UTF8String] = {
    val out = new java.util.HashSet[UTF8String]()
    val m = arr.numElements()
    if (m < n) return out
    var i = 0
    while (i <= m - n) {
      var ok = true
      var j = 0
      var total = n - 1 // separator spaces
      while (j < n) {
        if (arr.isNullAt(i + j)) { ok = false; j = n }
        else { total += arr.getUTF8String(i + j).numBytes(); j += 1 }
      }
      if (ok) {
        val buf = new Array[Byte](total)
        var off = 0
        j = 0
        while (j < n) {
          val t = arr.getUTF8String(i + j)
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += t.numBytes()
          if (j < n - 1) { buf(off) = ' '; off += 1 }
          j += 1
        }
        out.add(UTF8String.fromBytes(buf)): Unit
      }
      i += 1
    }
    out
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = gramSet(a)
    val sb = gramSet(b)
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    // both-empty guard (r22, ADVICE item): the registered function is
    // reachable by any caller with two sub-n texts, and a raw 0.0/0.0
    // NaN would pass every `>= threshold` filter and win descending
    // ranks under Spark's NaN-is-greatest ordering. Return 0.0 — the
    // same convention as CosineSimilarity's zero-norm guard. (The
    // legacy size/size formulation THROWS here under ANSI; the case is
    // unreachable in the pipelines, where banding candidates always
    // carry ≥ 1 shingle.)
    if (union == 0) 0.0
    else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardShingles", this,
      classOf[JaccardShingles].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardShingles =
    copy(left = newLeft, right = newRight)
}

/** Positioned n-gram digests of a token array:
  * `graft_gram_hashes(toks, n)` → array<bigint> with one 64-bit
  * digest per stride-1 n-gram start position (empty when the doc has
  * fewer than n tokens — the positions the
  * `transform(sequence(...), md5(array_join(slice(...))))`
  * formulation would enumerate, in the same order). GROUPING KEYS
  * ONLY — see the object scaladoc for the collision argument.
  */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"graft_gram_hashes needs n >= 1, got $n")

  override def prettyName: String = "graft_gram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val C = TextHash.RollC
    // C^(n-1) mod 2^64 for the rolling eviction of the oldest token
    var cpow = 1L
    var p = 0
    while (p < n - 1) { cpow *= C; p += 1 }
    // per-token hashes (null tokens — which split() never produces —
    // get a fixed sentinel so the digest stays a pure function of the
    // token sequence)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) =
        if (arr.isNullAt(i)) 0L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    // Horner for the first window, then O(1) rolling updates
    var g = 0L
    i = 0
    while (i < n) { g = g * C + th(i); i += 1 }
    out(0) = g
    var s = 1
    while (s <= m - n) {
      g = (g - th(s - 1) * cpow) * C + th(s + n - 1)
      out(s) = g
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}
