package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-style data-quality checks as composable operators. The
  * reference's README claims its models are "validated through dbt
  * tests (unique, not_null)" but ships none (SURVEY.md §5 — verified
  * absent across its whole `pipeline/dbt` tree); this module
  * implements that
  * claimed surface for real, plus the relationship and
  * accepted-values checks dbt users reach for next.
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

  /** Rows where `c` is NULL (map-side conditional count). */
  def notNullCheck(name: String, df: DataFrame, c: String): DataFrame =
    df.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (referential integrity; dbt `relationships`).
    */
  def fkCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    one(name, child.join(broadcast(parent),
      child(childKey) === parent(parentKey), "left_anti"))

  /** Rows where `c` falls outside `allowed` (dbt `accepted_values`). */
  def acceptedValuesCheck(name: String, df: DataFrame, c: String,
      allowed: Seq[String]): DataFrame =
    one(name, df.filter(!col(c).isin(allowed: _*)))

  /** Rows failing an arbitrary predicate (dbt singular test). */
  def expressionCheck(name: String, df: DataFrame, violated: Column): DataFrame =
    one(name, df.filter(violated))

  /** Union a suite into one (check_name, n_violations) report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy(col("check_name"))

  /** Row-level expectations (Delta Live Tables style): each named
    * predicate must HOLD per row; rows failing any expectation are
    * split off with a `violation` column naming the FIRST failing
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
    val reason = expectations.foldRight(lit(null).cast("string")) {
      case ((name, holds), rest) => when(!holds, lit(name)).otherwise(rest)
    }
    val tagged = df.withColumn("violation", reason)
    (tagged.filter(col("violation").isNull).drop("violation"),
      tagged.filter(col("violation").isNotNull))
  }
}
