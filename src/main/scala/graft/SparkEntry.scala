package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2 mapped
  * onto the driver testdata corpus); each entry with an `oracleSql`
  * twin is hash-checked against DuckDB at sf0.01 by the driver.
  */
object SparkEntry {

  /** Full registry, one QueryDef per implemented operator. */
  def registry: Seq[QueryDef] =
    RelationalQueries.all ++ AdvancedQueries.all ++ EventQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ CurationQueries.all ++ Sf0Queries.all ++
      Sf1RowQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * revenue by region — the purchases⋈dims star join the reference's BI
    * layer implies (SURVEY.md §2.7).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q21_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toMaps(registry)._1

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  val oracleSql: Map[String, String] =
    QueryDef.toMaps(registry)._2

  /** Queries Bench times at sf0.1. */
  def headlines: Seq[String] = registry.filter(_.headline).map(_.name)
}
