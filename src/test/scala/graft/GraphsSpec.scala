package graft

import org.apache.spark.sql.functions._

import graft.ext.Graphs

/** Known-answer tests for the degree-oriented triangle counter —
  * independent of the q132 oracle (which replays a NAIVE a<b<c
  * enumeration in DuckDB); here the answers are hand-derived.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: (Long, Long)*): Map[Long, (Long, Long)] =
    Graphs.triangleCounts(
      edges.toDF("ia", "ib"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("K4: every vertex has degree 3 and sits in 3 of the 4 triangles") {
    val k4 = tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(k4 === Map(1L -> (3L, 3L), 2L -> (3L, 3L),
      3L -> (3L, 3L), 4L -> (3L, 3L)))
  }

  test("a path has no triangles; output is empty, not zero rows per vertex") {
    assert(tri((1L, 2L), (2L, 3L), (3L, 4L)).isEmpty)
  }

  test("bowtie: the cut vertex counts both triangles, wings count one") {
    // triangles {1,2,3} and {3,4,5} sharing vertex 3
    val bow = tri((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    assert(bow === Map(1L -> (2L, 1L), 2L -> (2L, 1L),
      3L -> (4L, 2L), 4L -> (2L, 1L), 5L -> (2L, 1L)))
  }

  test("star + one chord: exactly the chord triangle, despite the hub's degree") {
    // hub 1 connected to 2..6; single chord (2,3) — one triangle
    val star = tri((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (2L, 3L))
    assert(star === Map(1L -> (5L, 1L), 2L -> (2L, 1L), 3L -> (2L, 1L)))
  }
}
