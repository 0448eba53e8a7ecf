package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames (the 100 TB
  * posture: equi-joins on vertex keys only — never an all-pairs or
  * adjacency materialization). Complements [[Dedup.connectedComponents]]
  * (min-label propagation) with the counting side of graph analytics.
  */
object Graphs {

  /** Per-vertex triangle participation counts via degree-ordered
    * orientation. Input: undirected edge list with BIGINT columns
    * `ia < ib`, one row per edge (no duplicates). Output:
    * `(item, deg, n_triangles)` — one row per vertex that closes at
    * least one triangle.
    *
    * Every edge is oriented from its lower-(degree, id) endpoint to
    * the higher; each triangle then appears EXACTLY once, as a wedge
    * at its lowest-rank vertex closed by one oriented edge. The
    * orientation bounds wedge fan-out by the graph's arboricity
    * instead of the max degree — a power-law celebrity vertex (degree
    * d) never enumerates its d² wedge pairs, because almost all of
    * its edges orient TOWARD it. All stages are equi-joins on vertex
    * keys, so the shuffle plan scales with edges, not wedge pairs.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("ia").as("node"))
      .unionAll(edges.select(col("ib").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("ia"), col("deg").as("da")), Seq("ia"))
      .join(deg.select(col("node").as("ib"), col("deg").as("db")), Seq("ib"))
    val ltAB = struct(col("da"), col("ia")) < struct(col("db"), col("ib"))
    val oriented = withDeg.select(
      when(ltAB, col("ia")).otherwise(col("ib")).as("src"),
      when(ltAB, col("ib")).otherwise(col("ia")).as("dst"),
      when(ltAB, col("db")).otherwise(col("da")).as("dd"))
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
    tris.select(col("x").as("item"))
      .unionAll(tris.select(col("y").as("item")))
      .unionAll(tris.select(col("z").as("item")))
      .groupBy(col("item")).agg(count(lit(1)).as("n_triangles"))
      .join(deg, col("item") === col("node"))
      .select(col("item"), col("deg"), col("n_triangles"))
  }

  /** Fixed-iteration PageRank over a directed edge list — INTEGER
    * fixed-point throughout, which is what makes a distributed rank
    * hash-comparable across engines and partitionings: total mass is
    * `massUnits` (10¹²), every per-edge contribution is an integer
    * `DIV` of the source's mass by its out-degree, and each
    * iteration's score is
    * `((1000−damp)·(massUnits DIV n) + damp·Σcontrib) DIV 1000` —
    * BIGINT sums are exactly associative, so the result is
    * independent of aggregation order (a double-valued PageRank
    * would differ in the last ulps between runs AND between engines).
    * Dangling-node mass is dropped (the standard simplified variant);
    * every value stays ≤ 10¹⁵, far from Long overflow under ANSI.
    *
    * Shape at 100 TB: the classic join-based power iteration — each
    * round is one equi-join of the score vector with the edge list on
    * the source key plus one hash aggregate on the destination key;
    * shuffles carry O(edges) rows, no adjacency ever materializes,
    * and a bounded iteration count keeps the plan finite (callers
    * wanting convergence detection can stage scores per round the way
    * [[Dedup.connectedComponents]] does).
    *
    * Input: `(src, dst)` BIGINT pairs, one row per distinct edge.
    * Output: `(item, pr_units)` — one row per vertex, rank in units
    * of 10⁻¹² of the total mass.
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
      dampPermille: Long = 850L,
      massUnits: Long = 1000000000000L): DataFrame = {
    val nodes = edges.select(col("src").as("item"))
      .union(edges.select(col("dst").as("item"))).distinct()
    // vertex count rides a broadcast 1-row frame — no driver collect
    val nRow = nodes.agg(count(lit(1)).as("n_nodes"))
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val base = expr(s"$massUnits DIV n_nodes")
    var scores = nodes.crossJoin(broadcast(nRow))
      .select(col("item"), base.as("pr_units"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(scores.select(col("item").as("src"), col("pr_units")), Seq("src"))
        .join(outd, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr_units DIV outdeg")).as("c"))
      scores = nodes.crossJoin(broadcast(nRow))
        .join(contrib, col("item") === col("dst"), "left")
        .select(col("item"), expr(
          s"(${1000L - dampPermille} * ($massUnits DIV n_nodes) + " +
            s"$dampPermille * coalesce(c, 0)) DIV 1000").as("pr_units"))
    }
    scores
  }
}
