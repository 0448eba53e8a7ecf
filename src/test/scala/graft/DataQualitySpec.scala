package graft

import org.apache.spark.sql.functions._
import graft.ext.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("each check counts its violations; clean data reports zero") {
    val child = Seq(
      (1L, Some(10L), "A"), (1L, Some(10L), "B"), // dup key (1,10)
      (2L, None, "A"),                            // null FK
      (3L, Some(99L), "Z")                        // orphan FK + bad value
    ).toDF("id", "fk", "status")
    val parent = Seq(10L).toDF("pk")
    val got = report(Seq(
      uniqueCheck("uniq", child, Seq("id", "fk")),
      notNullCheck("notnull", child, "fk"),
      fkCheck("fk", child.filter(col("fk").isNotNull), "fk", parent, "pk"),
      acceptedValuesCheck("vals", child, "status", Seq("A", "B")),
      expressionCheck("expr_id_pos", child, col("id") <= 0)))
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "uniq" -> 1L,      // one duplicated key combination
      "notnull" -> 1L,
      "fk" -> 1L,
      "vals" -> 1L,
      "expr_id_pos" -> 0L))
  }

  test("q110 suite on the corpus: finds the real key collisions, rest green") {
    val rows = SparkEntry.queries("q110_dq_checks")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toMap
    assert(rows.size === 4)
    // (l_orderkey, l_linenumber) is genuinely non-unique in the driver
    // corpus (q03's sort-key comment documents it) — the check's job
    // is to SURFACE that, not to be green
    assert(rows("unique_lineitem_key") > 0L)
    assert(rows("not_null_o_custkey") === 0L)
    assert(rows("fk_orders_customer") === 0L)
    assert(rows("accepted_values_o_orderstatus") === 0L)
  }
}
