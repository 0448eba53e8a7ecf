package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-style data-quality checks as composable operators. The
  * reference's README claims its models are "validated through dbt
  * tests (unique, not_null)" but ships none (SURVEY.md §5 — verified
  * absent across its whole `pipeline/dbt` tree); this module
  * implements that claimed surface for real, plus the relationship
  * and accepted-values checks dbt users reach for next.
  *
  * Each check returns a 1-row (check_name, n_violations) frame;
  * [[report]] unions a suite into one result. Shapes at 100 TB:
  * uniqueness is one hash aggregate on the key; not-null and
  * accepted-values are map-side conditional counts; the FK check is
  * an anti-join that broadcasts the dimension when small.
  */
object DataQuality {

  private def one(name: String, violations: DataFrame): DataFrame =
    violations.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Rows whose `keyCols` combination appears more than once. */
  def uniqueCheck(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    one(name, df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1))

  /** Rows where `c` is NULL. */
  def notNullCheck(name: String, df: DataFrame, c: String): DataFrame =
    one(name, df.filter(col(c).isNull))

  /** NON-NULL child rows whose `childKey` has no match in
    * `parent.parentKey` (referential integrity; dbt `relationships`).
    * NULL child keys are excluded — they are [[notNullCheck]]'s
    * finding, and an anti-join would otherwise count every NULL as an
    * orphan (dbt's relationships test likewise ignores NULLs).
    *
    * No broadcast hint: the parent is a DIMENSION in the common case
    * but nothing enforces that, and a forced broadcast of a large
    * parent would OOM the driver. Left unhinted, Catalyst/AQE
    * broadcasts a small parent anyway (runtime size stats) and plans
    * a shuffled anti-join for a large one — both complete.
    */
  def fkCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    // the parent side is re-projected under a fresh name so a
    // SELF-referential check (child eq parent — the canonical
    // hierarchy-table relationships test) does not trip Spark's
    // ambiguous-self-join detection
    val pk = "__graft_fk_parent_key__"
    require(!child.columns.contains(pk),
      s"fkCheck: child must not already have a $pk column")
    one(name, child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(pk)),
        col(childKey) === col(pk), "left_anti"))
  }

  /** Rows where `c` falls outside `allowed` (dbt `accepted_values`). */
  def acceptedValuesCheck(name: String, df: DataFrame, c: String,
      allowed: Seq[String]): DataFrame =
    one(name, df.filter(!col(c).isin(allowed: _*)))

  /** Rows failing an arbitrary predicate (dbt singular test). */
  def expressionCheck(name: String, df: DataFrame, violated: Column): DataFrame =
    one(name, df.filter(violated))

  /** Union a suite into one (check_name, n_violations) report. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    // an all-disabled config-driven suite would otherwise die in an
    // unhelpful empty.reduceLeft far from the cause
    require(checks.nonEmpty, "report: no checks given")
    checks.reduce(_ unionByName _).orderBy(col("check_name"))
  }

  /** Row-level expectations (Delta Live Tables style): each named
    * predicate must evaluate to TRUE per row — a NULL verdict (the
    * predicate touched a NULL) QUARANTINES the row, it does not pass
    * it; a DQ gate that waves NULLs through is not a gate. Failing
    * rows carry a `violation` column naming the FIRST failing
    * expectation (declaration order — deterministic reasons, same
    * precedence idea as [[TextAnalysis.qualityFilter]]).
    *
    * Returns (passed, quarantined) — map-side expression filters, no
    * shuffle, streaming-safe (use inside foreachBatch or directly on
    * a streaming frame). The two frames are independent plans: a
    * caller consuming BOTH should persist the input (or run inside
    * foreachBatch where the batch is already materialized) to avoid
    * scanning the source twice.
    */
  def enforce(df: DataFrame, expectations: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    require(expectations.nonEmpty, "need at least one expectation")
    // the quarantine contract RESERVES this column name; silently
    // overwriting a business column called "violation" (and dropping
    // it from the passed side) would be silent data loss
    require(!df.columns.contains("violation"),
      "enforce: input already has a 'violation' column — rename it " +
        "(the quarantine output reserves that name for the reason)")
    val reason = expectations.foldRight(lit(null).cast("string")) {
      // null-safe: `holds <=> true` is false (not NULL) for a NULL
      // verdict, so the row gets this expectation's name
      case ((name, holds), rest) =>
        when(!(holds <=> lit(true)), lit(name)).otherwise(rest)
    }
    val tagged = df.withColumn("violation", reason)
    (tagged.filter(col("violation").isNull).drop("violation"),
      tagged.filter(col("violation").isNotNull))
  }
}
