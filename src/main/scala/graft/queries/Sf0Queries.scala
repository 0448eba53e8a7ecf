package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

/** Degenerate-scale (0-row) oracle variants — the r4 verdict's ask #7.
  *
  * The r4 `EmptyCorpusSpec`/`DegenerateCorpusSpec` nets prove every
  * registered query survives an empty corpus Spark-side; this group
  * puts a representative slice of that boundary under the DRIVER's
  * cross-engine gate too, so empty-frame schema agreement (column
  * names, types, 0-vs-1-row aggregate semantics) is hash-checked
  * against DuckDB every round, not just spec-asserted.
  *
  * Mechanics: each `sf0_*` entry runs the ORIGINAL registered query
  * unmodified against a memoized directory of schema-preserving 0-row
  * copies of every table, and its oracle is the ORIGINAL oracle SQL
  * with shadow CTEs prepended — `<table> AS (SELECT * FROM
  * main.<table> WHERE FALSE)` — which DuckDB resolves in place of the
  * base views (the `main.` qualifier avoids the circular-CTE error).
  * Both engines therefore execute their full original plans over
  * empty inputs; nothing is special-cased.
  *
  * The slice spans the operator families: scan-agg (q01), time-series
  * agg (q10), window (q31), text analysis (q61), multi-stage MinHash
  * dedup (q65), broadcast kNN (q70), LM scoring (q96), and the
  * fixed-point DSIR weights (q145).
  */
object Sf0Queries {

  /** Memoized per (session, source dir): a temp dir in the SF layout
    * holding a 0-row, schema-identical copy of every table (the
    * `filter(false)` write preserves schema — the r4 empty-overwrite
    * work). Built once; every sf0 entry reads from it.
    */
  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def emptySfDir(s: SparkSession, dir: String): String =
    dirCache.computeIfAbsent(
      // applicationId key, same rationale as DedupQueries.truthPairs:
      // never resolve a dir built by a stopped context's session
      s.sparkContext.applicationId + "|" + dir,
      _ => {
        val out = java.nio.file.Files.createTempDirectory("graft-sf0-")
        Tables.names.foreach { t =>
          Tables.load(s, dir, t).filter(lit(false))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$out/$t.parquet")
        }
        out.toString
      })

  /** Prepend shadow CTEs that rebind every table name to a 0-row
    * projection of the base view (shared machinery: [[DegenShadow]]).
    */
  private def shadowEmpty(sql: String): String =
    DegenShadow.shadow(sql, t => s"SELECT * FROM main.$t WHERE FALSE")

  val all: Seq[QueryDef] =
    DegenShadow.picks.map { name =>
      val orig = DegenShadow.baseByName(name)
      QueryDef(
        s"sf0_$name",
        (s, dir) => orig.run(s, emptySfDir(s, dir)),
        orig.oracle.map(shadowEmpty))
    }
}
