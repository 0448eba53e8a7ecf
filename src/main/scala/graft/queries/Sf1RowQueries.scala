package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Degenerate-scale shadow-CTE machinery shared by the driver-gated
  * boundary groups ([[Sf0Queries]] 0-row, [[Sf1RowQueries]] 1-row):
  * prepend CTEs that rebind every table name to a degenerate
  * projection of the base view, so the ORIGINAL oracle SQL runs
  * unmodified over the shrunken inputs (the `main.` qualifier avoids
  * the circular-CTE error in DuckDB).
  */
private[graft] object DegenShadow {

  /** The shared 8-query representative slice BOTH degenerate groups
    * run (one place, so the boundary nets cannot desynchronize):
    * scan-agg, time-series agg, window, text analysis, MinHash dedup,
    * broadcast kNN, LM scoring, fixed-point DSIR weights.
    */
  val picks: Seq[String] = Seq(
    "q01_pricing_summary", "q10_daily_sales", "q31_running_total",
    "q61_doc_stats", "q65_minhash_dedup", "q70_knn_bruteforce",
    "q96_unigram_surprisal", "q145_dsir_weights")

  /** Name → QueryDef over every non-degenerate registry group. Lazy:
    * the group objects' `all` initializers must run first.
    */
  lazy val baseByName: Map[String, QueryDef] =
    (RelationalQueries.all ++ AdvancedQueries.all ++
      EventQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++
      CurationQueries.all).map(q => q.name -> q).toMap

  /** `perTable(t)` must be a standalone SELECT over `main.<t>`. */
  def shadow(sql: String, perTable: String => String): String = {
    // fail FAST at registry build if a pick's oracle defines a CTE
    // named like a table (the shadow would collide) — a future pick
    // with `WITH part AS (...)` must break here with a clear message,
    // not at gate time with a DuckDB binder error
    Tables.names.foreach { t =>
      require(!s"(?is)\\b$t\\s+AS\\s*\\(".r.findFirstIn(sql).isDefined,
        s"degenerate-group oracle defines a CTE shadowing table '$t'; " +
          "rename the CTE")
    }
    val shadows = Tables.names
      .map(t => s"$t AS (${perTable(t)})")
      .mkString(", ")
    val trimmed = sql.trim
    val up = trimmed.toUpperCase(java.util.Locale.ROOT)
    if (up.startsWith("WITH RECURSIVE"))
      s"WITH RECURSIVE $shadows, " + trimmed.drop("WITH RECURSIVE".length).trim
    else if (up.startsWith("WITH"))
      s"WITH $shadows, " + trimmed.drop("WITH".length).trim
    else
      s"WITH $shadows $trimmed"
  }
}

/** Single-row-corpus oracle variants — the r5 verdict's ask #6, the
  * other degenerate boundary from [[Sf0Queries]]' 0-row group: windows
  * over one row, stddev/variance over n=1 (NULL under n−1), percentile
  * of a singleton, self-pair dedup/kNN with no second vector, LM
  * models built from one document. Each `sf1row_*` entry runs the
  * ORIGINAL registered query unmodified against a memoized directory
  * where every table holds exactly its first row under a TOTAL order
  * (sort by ALL columns ascending NULLS FIRST — the leading key column
  * is unique per table, so both engines deterministically pick the
  * same row), and its oracle is the ORIGINAL oracle SQL behind shadow
  * CTEs `<table> AS (SELECT * FROM main.<table> ORDER BY ALL NULLS
  * FIRST LIMIT 1)`. Nothing is special-cased in either engine.
  *
  * Same 8-query slice as sf0: scan-agg (q01), time-series agg (q10),
  * window (q31), text analysis (q61), MinHash dedup (q65), broadcast
  * kNN (q70), LM scoring (q96), fixed-point DSIR weights (q145).
  */
object Sf1RowQueries {

  /** Memoized per (session, source dir): a temp dir in the SF layout
    * holding a deterministic 1-row copy of every table.
    */
  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def oneRowSfDir(s: SparkSession, dir: String): String =
    dirCache.computeIfAbsent(
      // applicationId key, same rationale as DedupQueries.truthPairs:
      // never resolve a dir built by a stopped context's session
      s.sparkContext.applicationId + "|" + dir,
      _ => {
        val out = java.nio.file.Files.createTempDirectory("graft-sf1row-")
        Tables.names.foreach { t =>
          val d = Tables.load(s, dir, t)
          d.orderBy(d.columns.toIndexedSeq.map(c => col(c).asc_nulls_first): _*)
            .limit(1)
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$out/$t.parquet")
        }
        out.toString
      })

  val all: Seq[QueryDef] =
    DegenShadow.picks.map { name =>
      val orig = DegenShadow.baseByName(name)
      QueryDef(
        s"sf1row_$name",
        (s, dir) => orig.run(s, oneRowSfDir(s, dir)),
        orig.oracle.map(DegenShadow.shadow(_,
          t => s"SELECT * FROM main.$t ORDER BY ALL NULLS FIRST LIMIT 1")))
    }
}
