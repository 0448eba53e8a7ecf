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
}
