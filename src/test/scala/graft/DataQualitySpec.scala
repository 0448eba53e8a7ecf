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
      // NULL child keys are notnull's finding, NOT fk orphans —
      // fkCheck excludes them itself (no caller pre-filter needed)
      fkCheck("fk", child, "fk", parent, "pk"),
      acceptedValuesCheck("vals", child, "status", Seq("A", "B")),
      expressionCheck("expr_id_pos", child, col("id") <= 0)))
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "uniq" -> 1L,      // one duplicated key combination
      "notnull" -> 1L,
      "fk" -> 1L,        // only the non-null orphan, not the NULL row
      "vals" -> 1L,
      "expr_id_pos" -> 0L))
  }

  test("enforce quarantines NULL-evaluating expectations instead of passing them") {
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0)))
      .toDF("id", "price")
    val (passed, quarantined) = enforce(df,
      Seq("price_nonneg" -> (col("price") >= 0)))
    assert(passed.select("id").as[Long].collect().toSeq === Seq(1L))
    // the NULL-price row must land in quarantine, tagged with the
    // expectation whose verdict was NULL
    assert(quarantined.select("id", "violation").as[(Long, String)]
      .collect().toSet === Set((2L, "price_nonneg"), (3L, "price_nonneg")))
  }

  test("enforce: rows split by first failing expectation, in order") {
    val df = Seq(
      (1L, 10.0, "A"),   // clean
      (2L, -5.0, "A"),   // fails price_nonneg
      (3L, -1.0, "Z"),   // fails BOTH → first declared wins
      (4L, 20.0, "Z")    // fails status_known
    ).toDF("id", "price", "status")
    val (passed, quarantined) = enforce(df, Seq(
      "price_nonneg" -> (col("price") >= 0),
      "status_known" -> col("status").isin("A", "B")))
    assert(passed.select("id").as[Long].collect().toSet === Set(1L))
    assert(quarantined.select("id", "violation").as[(Long, String)]
      .collect().toSet === Set(
        (2L, "price_nonneg"), (3L, "price_nonneg"), (4L, "status_known")))
    // passed side carries no bookkeeping column
    assert(!passed.columns.contains("violation"))
  }

  test("enforce works on a streaming frame (map-side only)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    stream.addData(Seq((1L, 5.0), (2L, -1.0)))
    val (passed, _) = enforce(stream.toDF().toDF("id", "price"),
      Seq("price_nonneg" -> (col("price") >= 0)))
    val q = passed.writeStream.format("memory").queryName("dq_pass")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dq_pass").select("id").as[Long].collect().toSeq === Seq(1L))
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

  test("fkCheck handles a SELF-referential hierarchy (child eq parent)") {
    // the canonical dbt relationships use case — previously tripped
    // Spark's ambiguous-self-join detection
    import graft.ext.DataQuality
    val employees = Seq(
      (1L, Option.empty[Long]), (2L, Some(1L)), (3L, Some(1L)),
      (4L, Some(99L)) // orphan: manager 99 does not exist
    ).toDF("emp_id", "manager_id")
    val got = DataQuality.fkCheck("mgr_fk", employees, "manager_id",
      employees, "emp_id").head()
    assert(got.getString(0) === "mgr_fk")
    assert(got.getLong(1) === 1L) // only the orphan; NULL manager skips
  }

  test("enforce refuses an input that already has a 'violation' column") {
    import graft.ext.DataQuality
    val df = Seq((1L, "x")).toDF("id", "violation")
    val e = intercept[IllegalArgumentException] {
      DataQuality.enforce(df, Seq("always" -> lit(true)))
    }
    assert(e.getMessage.contains("violation"))
  }

  test("report refuses an empty suite with a named error") {
    import graft.ext.DataQuality
    val e = intercept[IllegalArgumentException] {
      DataQuality.report(Seq.empty)
    }
    assert(e.getMessage.contains("no checks"))
  }
}
