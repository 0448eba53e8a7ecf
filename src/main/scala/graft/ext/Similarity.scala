package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (query side broadcast, neighbor
  * side streamed — no shuffle of the big side; O(|Q|·N·d) map-side
  * work then a per-query top-k window).
  *
  * Scale path: random-hyperplane LSH bucketing — each vector gets a
  * 16-bit bucket signature map-side; candidate generation is an
  * equi-join on the bucket id, exact cosine re-ranks only candidates.
  * At 100 TB the bucket join shuffles on bucket_id instead of
  * cross-joining N².
  *
  * Arithmetic: all accumulation in DOUBLE, sequential in element
  * order (aggregate over zip_with), so results are bit-identical to
  * a DuckDB oracle computing in the same order.
  */
object Similarity {

  /** Candidate-generation evidence from the last [[lshNeighborPairs]]
    * call: same-bucket candidate pairs (what the cosine re-rank
    * actually scored) and the bucket histogram extremes, published to
    * the bench diag so a plan/selectivity change shows up in the round
    * record instead of needing a reproduction hunt (the q72 treatment
    * the minhash verify join got in r4).
    *
    * Published as a THUNK over the staged (on-disk) bucket frame, not
    * an eager result: the histogram is a separate Spark job, and
    * running it inside [[lshNeighborPairs]] would put it inside
    * Bench's timed region — every LSH entry would carry diag overhead
    * that r1–r4 numbers never paid. Bench forces the thunk after the
    * timer stops; the staged dir lives until JVM exit, so the read is
    * always valid.
    */
  final case class LshDiag(nCandidates: Long, nBuckets: Long, maxBucket: Long)
  @volatile var lastLshDiag: Option[() => LshDiag] = None

  /** Diag collection is OPT-IN (Bench flips it on): the histogram is
    * an extra aggregation job per captured [[lshNeighborPairs]] call,
    * and every other caller (the Verify gate, library users) would pay
    * plan-construction cost for a number nobody reads.
    */
  @volatile var collectLshDiag = false

  def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Lambda-builtin formulations: dependency-free but interpreted per
    * element. The pipelines below use the codegen'd native twins from
    * graft.functions (identical sequential-double semantics).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    // zero-norm guard, mirroring CosineSimilarity: NaN would pass every
    // >= threshold filter and win every desc ranking under Spark's
    // NaN-is-greatest semantics
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Native codegen'd twins (register [[graft.functions.GraftFunctions]]
    * on the session first; all entry points here do).
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  def dotNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** 6dp-rounded cosine with IEEE signed zero normalized away: a tiny
    * NEGATIVE cosine rounds to -0.0 under DuckDB's ROUND but +0.0
    * under Spark's HALF_UP BigDecimal path — float-equal yet
    * hash/byte-different (the q145 r5 lesson). `-0.0 + 0.0 = +0.0` in
    * both engines, so every sim_r column (and every SIGNED rounded
    * output column repo-wide — the oracle SQL carries the matching
    * `+ 0.0`) goes through this normalization.
    */
  def simR(a: Column, b: Column): Column =
    round(cosineNative(a, b), 6) + lit(0.0)

  /** Brute-force top-k cosine neighbors for the query vectors.
    * Queries are broadcast; neighbors never shuffle until the
    * (small) per-query top-k.
    */
  def bruteForceKnn(embeddings: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // embeddings stay array<float>: the native expression reads floats
    // directly (no per-row double-array materialization)
    val n = embeddings.select(col("vec_id").as("n_vec"),
      col("embedding").as("nv"))
    val q = queries.select(col("vec_id").as("q_vec"),
      col("embedding").as("qv"))
    val pairs = n.crossJoin(broadcast(q))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("sim_r", simR(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("sim_r").desc, col("n_vec"))
    pairs
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col("q_vec"), col("n_vec"), col("sim_r"), col("rn"))
  }

  /** Contrastive training-pair mining: for each anchor vector, the
    * single most-similar SAME-label vector (the positive) and the
    * `kNeg` most-similar DIFFERENT-label vectors (the hard negatives
    * — the pairs a contrastive/triplet loss learns most from;
    * threshold the negative side at the positive's similarity to get
    * Schroff-style semi-hard mining). Returns
    * (q_vec, kind ∈ {pos, neg}, n_vec, sim_r, rn).
    *
    * Scale shape = [[bruteForceKnn]]: the anchor slice broadcasts, the
    * corpus streams map-side, and the only shuffle is the per-(anchor,
    * kind) top-k ranking window — O(|anchors|·N) work, no N² pair
    * materialization. Full-corpus mining (anchors = corpus) at 100 TB
    * routes candidate generation through [[ivfKnn]]'s probe cells
    * instead and keeps this ranking tail unchanged.
    */
  def contrastivePairs(embeddings: DataFrame, anchors: DataFrame,
      kNeg: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val n = embeddings.select(col("vec_id").as("n_vec"),
      col("label").as("n_label"), col("embedding").as("nv"))
    val a = anchors.select(col("vec_id").as("q_vec"),
      col("label").as("q_label"), col("embedding").as("qv"))
    val pairs = n.crossJoin(broadcast(a))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("sim_r", simR(col("qv"), col("nv")))
      .withColumn("kind", when(col("q_label") === col("n_label"), lit("pos"))
        .otherwise(lit("neg")))
    // rank on the ROUNDED similarity (ties broken by n_vec) so the
    // selected pairs are exactly as engine-stable as sim_r itself
    val w = Window.partitionBy(col("q_vec"), col("kind"))
      .orderBy(col("sim_r").desc, col("n_vec"))
    pairs
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter((col("kind") === "pos" && col("rn") === 1) ||
        (col("kind") === "neg" && col("rn") <= kNeg))
      .select(col("q_vec"), col("kind"), col("n_vec"), col("sim_r"), col("rn"))
  }

  /** Matryoshka truncation study: top-`k` cosine neighbors under each
    * PREFIX dimensionality in `dims`, scored against the full-width
    * ranking — the recall-vs-dimension curve that sizes an MRL
    * (Kusupati et al.) embedding cut before committing the index to
    * it. The last entry of `dims` must be the full width (its overlap
    * is k·|queries| by construction — the built-in sanity row).
    *
    * Scale shape = [[bruteForceKnn]] ×|dims|: queries broadcast, the
    * corpus streams map-side (the dim explode multiplies rows by
    * |dims|, a constant), and the only shuffle is the per-(dim, query)
    * top-k window. This is the exact-baseline path; at 100 TB the
    * candidate set comes from [[ivfKnn]] and this curve is computed
    * over the candidates instead.
    */
  def matryoshkaRecall(embeddings: DataFrame, queries: DataFrame,
      dims: Seq[Int], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    require(dims.nonEmpty && dims == dims.sorted && dims.distinct == dims,
      s"dims must be distinct and ascending, got $dims")
    // the recall baseline is the FULL-width ranking: a dims.last
    // narrower than the actual vectors would silently score every row
    // (sanity row included) against a truncated baseline. One map-side
    // min/max agg validates EVERY row (a first-row probe would bless a
    // mixed-width corpus); null embeddings are skipped by the agg and
    // an empty/all-null frame skips the check (nothing gets scored)
    // ... and BOTH frames must be full-width: a 32-wide QUERY against
    // a validated 64-wide corpus would slice to a 32-element query
    // vector and score every baseline against a truncation just the
    // same, so the corpus and query frames are unioned into one agg
    val widths = embeddings.select(size(col("embedding")).as("w"))
      .unionAll(queries.select(size(col("embedding")).as("w")))
      .agg(min(col("w")), max(col("w"))).head()
    if (!widths.isNullAt(1)) {
      require(widths.getInt(0) == dims.last && widths.getInt(1) == dims.last,
        s"dims.last (${dims.last}) must equal the embedding width of every " +
          s"corpus and query row (found widths " +
          s"${widths.getInt(0)}..${widths.getInt(1)})")
    }
    val full = dims.last
    val n = embeddings.select(col("vec_id").as("n_vec"), col("embedding").as("nv"))
    val q = queries.select(col("vec_id").as("q_vec"), col("embedding").as("qv"))
    // staged: consumed TWICE (fullSets branch + the join's left side),
    // and a broadcast breaks cross-branch exchange reuse — un-staged,
    // the |dims|-multiplied crossJoin/window pipeline (the dominant
    // cost) executes end-to-end twice. The staged frame is
    // output-scale: (dims × queries) rows of k-element sets.
    val ranked = graft.Staging.checkpoint(n.crossJoin(broadcast(q))
      .filter(col("q_vec") =!= col("n_vec"))
      .select(col("q_vec"), col("n_vec"),
        explode(lit(dims.toArray)).as("dim"),
        col("qv"), col("nv"))
      .withColumn("sim_r", simR(
        slice(col("qv"), lit(1), col("dim")),
        slice(col("nv"), lit(1), col("dim"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dim"), col("q_vec"))
          .orderBy(col("sim_r").desc, col("n_vec"))))
      .filter(col("rn") <= k)
      .groupBy(col("dim"), col("q_vec"))
      .agg(collect_set(col("n_vec")).as("nbrs")), "mrl-ranked")
    val fullSets = ranked.filter(col("dim") === full)
      .select(col("q_vec"), col("nbrs").as("full_nbrs"))
    ranked.join(broadcast(fullSets), Seq("q_vec"))
      .withColumn("ov", size(array_intersect(col("nbrs"), col("full_nbrs")))
        .cast("bigint"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("ov")).cast("bigint").as("total_overlap"))
      .select(col("dim").cast("bigint").as("dim"),
        col("n_queries"), col("total_overlap"),
        expr(s"CAST(total_overlap * 1000 DIV ($k * n_queries) AS BIGINT)")
          .as("recall_permille"))
      .orderBy(col("dim"))
  }

  /** Plane-count sizing rule for [[lshNeighborPairs]] at scale: with
    * nPlanes FIXED, per-bucket occupancy grows linearly in the corpus
    * and same-bucket candidate pairs grow quadratically (the r5 bench
    * diag measured exactly this: 9.4k candidates at 1× → 943k at 10×
    * under 8 planes). Choosing nPlanes = ⌈log2(n / targetPerBucket)⌉
    * holds EXPECTED occupancy at `targetPerBucket`, so candidates
    * stay O(n · targetPerBucket) — linear in the corpus. Clamped to
    * [4, 30]: fewer than 4 planes can't separate anything, and 2^30
    * buckets is past any practical shuffle-key cardinality. Callers
    * pass `count` from table statistics; recall drops as planes grow,
    * so near-threshold pipelines should raise bands/OR-repeats along
    * with planes (the standard LSH recall/cost trade).
    */
  def autoPlanes(corpusSize: Long, targetPerBucket: Int = 64): Int = {
    require(targetPerBucket >= 1, "targetPerBucket must be >= 1")
    if (corpusSize <= 0) return 4
    val needed = math.ceil(
      math.log(corpusSize.toDouble / targetPerBucket) / math.log(2.0)).toInt
    math.min(30, math.max(4, needed))
  }

  /** Deterministic random ±1 hyperplane values (seeded, data-
    * independent). Public so the SQL oracle builder can embed the SAME
    * constants as literals — the whole LSH/IVF bucketing then replays
    * exactly in DuckDB.
    */
  def planeValues(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** The same hyperplanes as literal array columns. */
  private def planes(nPlanes: Int, dim: Int): Seq[Column] =
    planeValues(nPlanes, dim).map(p => array(p.map(lit): _*))

  /** 16-bit random-hyperplane bucket signature for LSH-based ANN. */
  def hyperplaneBucket(v: Column, dim: Int, nPlanes: Int = 16): Column = {
    // hoisted: planes(...) inside the per-plane map would regenerate
    // the whole seeded family (nPlanes × dim literal nodes) once PER
    // plane — O(nPlanes² · dim) plan construction for the same tree
    val ps = planes(nPlanes, dim)
    (0 until nPlanes).map { j =>
      when(dotNative(v, ps(j)) >= 0,
        shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nCells` centroids
    * learned from a deterministic sample, each vector assigned to its
    * nearest centroid map-side; a query probes the `nProbe` nearest
    * cells and re-ranks exactly inside them. At 100 TB the cell
    * assignment is a map-side pass, candidate generation an equi-join
    * on cell_id — the scan never goes N², and recall is tunable via
    * nProbe without re-indexing.
    *
    * Centroid "training" is one k-means-style refinement pass over the
    * sample (seeded initial pick → mean of assigned) — deterministic,
    * driver-side on ≤ `sampleN` vectors only.
    */
  def ivfIndex(embeddings: DataFrame, nCells: Int, sampleN: Int = 2048)
      : (DataFrame, Array[Array[Double]]) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // null embeddings are skipped (the matryoshkaRecall convention) —
    // one null row sorting into the sample would otherwise NPE the
    // driver-side k-means
    val sample = embeddings.select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull)
      .orderBy(pmod(xxhash64(col("vec_id")), lit(997)), col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val k = math.min(nCells, sample.length)
    var centroids = sample.take(k)
    // one refinement pass (driver-side, sample only)
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val assigned = sample.groupBy(v => nearest(v, centroids))
    centroids = centroids.indices.map { c =>
      assigned.get(c) match {
        case Some(vs) =>
          val m = new Array[Double](vs.head.length)
          vs.foreach(v => (0 until m.length).foreach(i => m(i) += v(i)))
          m.map(_ / vs.length)
        case None => centroids(c)
      }
    }.toArray
    // map-side cell assignment: best cell by dot − ½‖c‖² (∝ −½·euclid²)
    val withCell = embeddings
      .withColumn("__cents", centroidsLit(centroids))
      .withColumn("cell_id",
        probeCellsExpr("embedding", centroids.length, 1).getItem(0))
      .drop("__cents")
    (withCell, centroids)
  }

  private def centroidsLit(cs: Array[Array[Double]]): Column =
    array(cs.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)

  /** array<int> of the `nProbe` best cell ids for vector column `v`
    * (expects a bound `__cents` column of centroid literals). Sorting
    * structs of (−score, idx) gives a deterministic argmax chain.
    */
  private def probeCellsExpr(v: String, nCents: Int, nProbe: Int): Column =
    expr(
      s"""transform(slice(array_sort(
            transform(sequence(0, ${nCents - 1}), i ->
              struct(-(graft_dot($v, element_at(__cents, i + 1))
                - 0.5 * graft_dot(element_at(__cents, i + 1),
                    element_at(__cents, i + 1))) AS negs,
                i AS idx))), 1, $nProbe), s -> s.idx)""")

  /** IVF query: probe the nProbe best cells per query vector, exact
    * cosine re-rank inside them.
    */
  def ivfKnn(indexed: DataFrame, centroids: Array[Array[Double]],
      queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(indexed.sparkSession)
    // per-query top-nProbe cells by the same maximized score used for
    // assignment (dot − ½‖c‖² ∝ −½·euclidean²)
    val q2 = queries
      .select(col("vec_id").as("q_vec"), col("embedding").as("qv"))
      .withColumn("__cents", centroidsLit(centroids))
      .withColumn("cell_id",
        explode(probeCellsExpr("qv", centroids.length, nProbe)))
      .select(col("q_vec"), col("qv"), col("cell_id").cast("int").as("cell_id"))
    val cands = q2.join(indexed.select(col("cell_id"),
        col("vec_id").as("n_vec"), col("embedding").as("nv")),
      Seq("cell_id"))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("sim_r", simR(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("sim_r").desc, col("n_vec"))
    cands.withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col("q_vec"), col("n_vec"), col("sim_r"), col("rn"))
  }

  /** IVF with a HYPERPLANE coarse quantizer: cell = sign signature of
    * the vector against `nPlanes` fixed ±1 hyperplanes (2^nPlanes
    * cells); a query probes the `nProbe` cells with the highest signed
    * margin Σ_j (bit_j(cell) ? d_j : −d_j) where d_j = ⟨q, plane_j⟩
    * (its own cell maximizes this at Σ|d_j|, neighbors follow by how
    * cheap the sign flips are). Exact cosine re-ranks inside probed
    * cells.
    *
    * Same inverted-file scale shape as [[ivfKnn]] — map-side cell
    * assignment, equi-join on cell_id, no N² — but the quantizer is
    * data-INDEPENDENT and training-free, so results are fully
    * deterministic and the complete index+query replays in a SQL
    * oracle (the k-means variant trades that for data-adapted cells).
    * The margin sums are fixed left-to-right chains, bit-identical in
    * both engines.
    */
  def hyperplaneIvfKnn(embeddings: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int, dim: Int, nPlanes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val ps = planes(nPlanes, dim)
    def cellOf(v: Column): Column =
      (0 until nPlanes).map(j =>
        when(dotNative(v, ps(j)) >= 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
    val indexed = embeddings
      .select(col("vec_id").as("n_vec"), col("embedding").as("nv"))
      .withColumn("cell_id", cellOf(col("nv")))
    val qd = queries.select(
      col("vec_id").as("q_vec") +: col("embedding").as("qv") +:
        (0 until nPlanes).map(j =>
          dotNative(col("embedding"), ps(j)).as(s"d$j")): _*)
    val scored = qd
      .withColumn("cell_id",
        explode(sequence(lit(0L), lit((1L << nPlanes) - 1))))
      .withColumn("score",
        (0 until nPlanes).map(j =>
          when(shiftright(col("cell_id"), j).bitwiseAND(1L) === 1L,
            col(s"d$j")).otherwise(-col(s"d$j"))).reduce(_ + _))
    val probeW = Window.partitionBy(col("q_vec"))
      .orderBy(col("score").desc, col("cell_id"))
    val probed = scored
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("q_vec"), col("qv"), col("cell_id"))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("sim_r").desc, col("n_vec"))
    probed.join(indexed, Seq("cell_id"))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("sim_r", simR(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col("q_vec"), col("n_vec"), col("sim_r"), col("rn"))
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4× compression for vector stores / ANN shipping. Per vector:
    * scale = max|x| / 127, q_i = round(x_i / scale) ∈ [−127, 127]
    * (zero vectors quantize to scale 0 + all-zero codes). Returns a
    * struct column {scale: double, q: array<int>}. Map-side column
    * arithmetic; the scale is let-bound so the max-abs pass runs once
    * per row (see [[Dedup.bound]]).
    */
  def quantizeInt8(v: Column): Column =
    graft.ext.Dedup.bound(
      array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)) { scale =>
      struct(
        scale.as("scale"),
        when(scale > 0,
          transform(v, x => round(x.cast("double") / scale).cast("int")))
          .otherwise(transform(v, _ => lit(0)))
          .as("q"))
    }

  /** Inverse of [[quantizeInt8]]: q_i · scale, as array<double>. */
  def dequantizeInt8(quant: Column): Column =
    graft.ext.Dedup.bound(quant.getField("scale")) { scale =>
      transform(quant.getField("q"), q => q.cast("double") * scale)
    }

  /** SemDeDup-style semantic dedup DECISION on top of the bucketed
    * pair search: a vector is dropped when a LOWER-ID near-duplicate
    * (cosine ≥ threshold) shares its hyperplane cell; the reported
    * keeper is the smallest such id (greedy lowest-id-wins — one
    * deterministic pass, no transitive closure; chain cases where the
    * keeper is itself dropped resolve to ITS keeper on re-application,
    * and [[graft.ext.Dedup.dedupClusters]] is the closure-complete
    * alternative when full clusters are wanted). Returns
    * (dropped_id, kept_id, kept_sim).
    *
    * Scale shape = [[lshNeighborPairs]]: cell equi-join for
    * candidates, exact cosine on candidates only, then ONE
    * output-scale aggregate keyed on the dropped id.
    */
  def semanticDedup(embeddings: DataFrame, dim: Int, threshold: Double,
      nPlanes: Int = 0): DataFrame =
    lshNeighborPairs(embeddings, dim, threshold, nPlanes)
      .groupBy(col("vec_b").as("dropped_id"))
      .agg(
        min(col("vec_a")).as("kept_id"),
        min_by(col("sim_r"), col("vec_a")).as("kept_sim"))

  /** Plane count the LAST [[lshNeighborPairs]] call actually bucketed
    * with — observable evidence for the auto-sizing default (specs and
    * the bench diag read it; same diag-var pattern as [[lastLshDiag]]).
    */
  @volatile var lastResolvedPlanes: Int = 0

  /** LSH-bucketed near-neighbor pairs: same bucket ⇒ candidate; exact
    * cosine filters at `threshold`. Recall trades off with nPlanes.
    *
    * `nPlanes <= 0` (the default) auto-sizes the plane family via
    * [[autoPlanes]] from a corpus count — the scale-safe default: a
    * FIXED family saturates (occupancy grows linearly with the corpus,
    * same-bucket candidates quadratically — measured in the r5 bench
    * diag), while the auto-sized family holds expected occupancy
    * constant so candidates stay linear. The count is one extra
    * column-pruned job over the input (cheap next to the pair
    * search); callers that already know the corpus size, or whose
    * oracle embeds plane constants (q72/q102/q106), pass an explicit
    * positive nPlanes and skip both the count and the sizing.
    * Precondition: `vec_id` values are unique — duplicate ids yield
    * duplicate candidate pairs (single-band LSH emits each a<b bucket
    * pair exactly once only when ids are distinct).
    */
  def lshNeighborPairs(embeddings: DataFrame, dim: Int,
      threshold: Double, nPlanes: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // Both paths stage the vectors ONCE (the self-join reads the stage
    // twice; no cross-branch exchange reuse, and one row per vector is
    // small relative to a scan).
    // - explicit planes: the bucket is computed before the stage, so
    //   the hashing runs once and the staged file carries it.
    // - auto planes: the plane count needs a corpus count FIRST, so
    //   the raw projection is staged (a derived input pipeline thus
    //   executes once, not once for a count plus once for the write),
    //   the count reads parquet footers, and the bucket column is
    //   computed ON READ — nPlanes dot products per row per read is
    //   far cheaper than a second full write+read of the corpus, and
    //   no second staged copy accumulates in a long-lived session.
    // r21: the vector NORM is precomputed once per vector alongside
    // the bucket (sqrt of the same sequential self-dot the fused
    // cosine would run), so the per-candidate re-rank pays one dot +
    // one division instead of the full three-accumulator cosine —
    // values stay bit-identical (same sequential double accumulation,
    // same sqrt-product divisor, same zero-norm guard; the parquet
    // stage round-trips the double exactly).
    val projected = embeddings.select(col("vec_id"), col("embedding").as("v"))
    def withNorm(df: DataFrame): DataFrame =
      df.withColumn("nrm", sqrt(dotNative(col("v"), col("v"))))
    val e =
      if (nPlanes > 0) {
        lastResolvedPlanes = nPlanes
        graft.Staging.checkpoint(
          withNorm(projected.withColumn("bucket",
            hyperplaneBucket(col("v"), dim, nPlanes))),
          "lsh-vecs")
      } else {
        // footer-counted stage (no count() job — r21): the corpus size
        // the auto-sizer needs is exactly the staged row count
        val (raw, nVecs) = graft.Staging.checkpointCounted(projected, "lsh-vecs")
        val np = autoPlanes(nVecs)
        lastResolvedPlanes = np
        withNorm(raw.withColumn("bucket", hyperplaneBucket(col("v"), dim, np)))
      }
    // diag over the staged 1-row-per-vector frame (vec_id only — the
    // embedding column never re-reads): candidate count Σ n·(n−1)/2
    // and the largest bucket, the two numbers that move if the
    // hyperplane family or the data distribution shifts. Deferred —
    // the caller (Bench) forces it outside its timed region.
    if (collectLshDiag) lastLshDiag = Some { () =>
      val h = e.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("cand"),
          count(lit(1)).as("nb"), coalesce(max(col("n")), lit(0L)).as("mx"))
        .head()
      LshDiag(h.getLong(0), h.getLong(1), h.getLong(2))
    }
    val a = e.select(col("bucket"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("bucket"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    // precomputed-norm cosine: same divisor product, same zero guard,
    // same 6dp signed-zero normalization as simR — see withNorm above
    val d = col("na") * col("nb")
    val simPre =
      round(when(d === 0.0, 0.0)
        .otherwise(dotNative(col("va"), col("vb")) / d), 6) + lit(0.0)
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim_r", simPre)
      .filter(col("sim_r") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim_r"))
    // no distinct: one bucket signature per vector (single-band LSH),
    // so the a<b self-join emits each candidate pair exactly once — a
    // dedup here would only add an output-scale shuffle
  }
}
