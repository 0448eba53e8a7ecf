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

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replay of the integer fixed-point recurrence — an
    * independent single-threaded twin of Graphs.pageRank.
    */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val mass = 1000000000000L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var s = nodes.map(v => v -> mass / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => s(e._1) / outdeg(e._1)).sum
      }
      s = nodes.map(v => v -> (150L * (mass / n) +
        850L * contrib.getOrElse(v, 0L)) / 1000L).toMap
    }
    s
  }

  private def spark_pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    graft.ext.Graphs.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("cycle: uniform mass is a fixed point") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = spark_pr(cycle, 3)
    assert(got === reference(cycle, 3))
    // symmetric graph → equal scores, and each ≈ mass/3 (fixed point)
    assert(got.values.toSet.size === 1)
    assert(math.abs(got(1L) - 1000000000000L / 3) < 5)
  }

  test("hub-and-authority: the sink of many edges outranks its sources") {
    // 1..5 all point at 6; 6 points back at 1 only
    val edges = (1L to 5L).map(i => (i, 6L)) :+ (6L, 1L)
    val got = spark_pr(edges, 3)
    assert(got === reference(edges, 3))
    assert(got(6L) > got(1L))
    assert(got(1L) > got(2L)) // 1 gets 6's mass back; 2..5 only the base
    assert(got(2L) === got(5L))
  }

  test("bit-identical under repartitioning (integer fixed-point, order-free)") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val df = edges.toDF("src", "dst")
    val a = graft.ext.Graphs.pageRank(df.repartition(1), 3)
      .as[(Long, Long)].collect().toMap
    val b = graft.ext.Graphs.pageRank(df.repartition(13), 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a === reference(edges, 3))
  }
}
