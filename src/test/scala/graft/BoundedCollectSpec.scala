package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedCollect

/** BoundedCollect guards q65's candidate generation — its contract
  * must hold exactly: groups at or under the cap keep EVERY member
  * (any loss silently drops near-dup pairs), groups over the cap
  * finish empty (any leak re-opens the skew blowup).
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("boundary exactness: n=cap keeps all, n=cap+1 empties — across partitionings") {
    val cap = 16
    // group g has g members (1..40), so groups 1..16 are ≤ cap and
    // 17..40 must empty; values encode (group, ordinal)
    val rows = for { g <- 1 to 40; i <- 1 to g } yield (g, g.toLong * 1000 + i)
    for (parts <- Seq(1, 3, 17)) { // exercise different partial-merge shapes
      val got = rows.toDF("g", "v").repartition(parts)
        .groupBy(col("g"))
        .agg(BoundedCollect.collectIds(col("v"), cap).as("ids"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      (1 to 40).foreach { g =>
        val want = if (g <= cap) (1 to g).map(i => g.toLong * 1000 + i).toSet
          else Set.empty[Long]
        assert(got(g).toSet === want, s"group $g at parts=$parts")
        assert(got(g).distinct.size === got(g).size, s"dup leak in group $g")
      }
    }
  }

  test("equivalence with collect_list + size filter on random data") {
    val rnd = new scala.util.Random(21)
    val cap = 10
    val rows = (1 to 2000).map(_ => (rnd.nextInt(50), rnd.nextLong()))
    val df = rows.toDF("g", "v").repartition(7)
    val bounded = df.groupBy(col("g"))
      .agg(BoundedCollect.collectIds(col("v"), cap).as("ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    val reference = df.groupBy(col("g"))
      .agg(collect_list(col("v")).as("ids"))
      .collect().map { r =>
        val all = r.getSeq[Long](1)
        r.getInt(0) -> (if (all.size <= cap) all.toSet else Set.empty[Long])
      }.toMap
    assert(bounded === reference)
  }

  test("NULL ids are skipped like collect_list, not collected as id 0") {
    // a primitive-Long input would decode null rows as 0L: a phantom
    // document 0 in candidate pairs AND count inflation toward the cap
    val cap = 3
    val rows = Seq[(Int, Option[Long])](
      (1, Some(10L)), (1, None), (1, Some(11L)), (1, None), (1, Some(12L)),
      (2, None), (2, None))
    val got = rows.toDF("g", "v").repartition(3)
      .groupBy(col("g"))
      .agg(BoundedCollect.collectIds(col("v"), cap).as("ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    // group 1: three real ids, nulls neither retained nor counted —
    // without the skip the count would be 5 > cap and the group empties
    assert(got(1) === Set(10L, 11L, 12L))
    assert(got(2) === Set.empty[Long]) // all-null group collects nothing
  }
}
