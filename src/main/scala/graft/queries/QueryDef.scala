package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle with IDENTICAL
  * output column names and a deterministic ORDER BY, so the driver's
  * hash compare (sorts columns by name, hashes values) is stable.
  *
  * Determinism rules applied everywhere:
  *  - every query ends in an ORDER BY over a unique key prefix;
  *  - floating aggregates are ROUND()ed (2dp money, 4dp ratios/scores,
  *    6dp similarities) so engine-order summation noise stays far from
  *    the rounding granularity;
  *  - derived integer columns are kept at BIGINT on both sides
  *    (DuckDB COUNT/ROW_NUMBER are BIGINT).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times at sf0.1 */
    headline: Boolean = false)

object QueryDef {
  /** Registry assembled by SparkEntry from each module. */
  def toMaps(qs: Seq[QueryDef])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val runs = qs.map(q => q.name -> q.run).toMap
    val oracles = qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
    (runs, oracles)
  }
}
