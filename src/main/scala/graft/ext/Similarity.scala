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

  def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Lambda-builtin formulations: dependency-free but interpreted per
    * element. The pipelines below use the codegen'd native twins from
    * graft.functions (identical sequential-double semantics).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd twins (register [[graft.functions.GraftFunctions]]
    * on the session first; all entry points here do).
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  def dotNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

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
      .withColumn("sim_r", round(cosineNative(col("qv"), col("nv")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("sim_r").desc, col("n_vec"))
    pairs
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col("q_vec"), col("n_vec"), col("sim_r"), col("rn"))
  }

  /** Deterministic random hyperplanes (seeded) as literal columns. */
  private def planes(nPlanes: Int, dim: Int): Seq[Column] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(array(
      Seq.fill(dim)(lit(if (rnd.nextBoolean()) 1.0 else -1.0)): _*))
  }

  /** 16-bit random-hyperplane bucket signature for LSH-based ANN. */
  def hyperplaneBucket(v: Column, dim: Int, nPlanes: Int = 16): Column =
    (0 until nPlanes).map { j =>
      when(dotNative(v, planes(nPlanes, dim)(j)) >= 0,
        shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed near-neighbor pairs: same bucket ⇒ candidate; exact
    * cosine filters at `threshold`. Recall trades off with nPlanes.
    */
  def lshNeighborPairs(embeddings: DataFrame, dim: Int,
      threshold: Double, nPlanes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, nPlanes))
    val a = e.select(col("bucket"), col("vec_id").as("vec_a"), col("v").as("va"))
    val b = e.select(col("bucket"), col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim_r", round(cosineNative(col("va"), col("vb")), 6))
      .filter(col("sim_r") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim_r"))
      .distinct()
  }
}
