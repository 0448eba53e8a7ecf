package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Decontam, Sampling}

/** Corpus-curation operators beyond dedup: benchmark decontamination
  * (train/eval n-gram leakage sweep) and deterministic domain-mixture
  * resampling. Both fully DuckDB-hash-checked — gram construction and
  * the md5-gated keep decision replay exactly in SQL.
  */
object CurationQueries {

  /** Target corpus mixture for q90 (parts per million): English-heavy
    * with the four minority languages equal — chosen to force real
    * downsampling against the corpus' natural skew.
    */
  private val MixturePpm: Map[String, Long] = Map(
    "en" -> 400000L, "de" -> 150000L, "zh" -> 150000L,
    "fr" -> 150000L, "es" -> 150000L)

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q89_decontamination",
      (s, dir) => {
        // deterministic eval split: every 20th doc plays the benchmark
        // set; the rest is the training corpus to sweep. 4-grams are
        // long enough to be meaningful on this short-doc corpus while
        // producing a non-trivial overlap report.
        val docs = Tables.load(s, dir, "documents")
        val evalSet = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
        Decontam.contaminationPairs(train, evalSet, "doc_id", "text", n = 4)
          .orderBy(col("train_id"), col("eval_id"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
              AS g
          FROM toks),
        ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
        ev AS (SELECT doc_id AS eval_id, gram FROM ex WHERE doc_id % 20 = 0),
        tr AS (SELECT doc_id AS train_id, gram FROM ex WHERE doc_id % 20 != 0)
        SELECT train_id, eval_id, COUNT(DISTINCT gram) AS n_shared_grams
        FROM tr JOIN ev USING (gram)
        GROUP BY train_id, eval_id
        ORDER BY train_id, eval_id""")),

    QueryDef(
      "q90_domain_mixture",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
        val kept = Sampling.mixtureResample(docs, "lang", "doc_id", MixturePpm)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        totals.join(kept, Seq("lang"), "left")
          .select(col("lang"), col("n_total"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH c AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY 1),
        w(lang, w_ppm) AS (VALUES ('en', 400000), ('de', 150000),
                                  ('zh', 150000), ('fr', 150000),
                                  ('es', 150000)),
        cw AS (SELECT c.lang, n_stratum, w_ppm FROM c JOIN w USING (lang)),
        nt AS (SELECT MIN(n_stratum * 1000000 // w_ppm) AS n_target_total
               FROM cw),
        g AS (SELECT lang, n_stratum,
                     w_ppm * n_target_total // 1000000 AS n_target
              FROM cw, nt),
        k AS (SELECT d.lang,
                CASE WHEN (CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),
                             1,15)) AS BIGINT) % 1000000) * g.n_stratum
                       < g.n_target * 1000000
                     THEN 1 ELSE 0 END AS kept
              FROM documents d JOIN g USING (lang))
        SELECT lang, COUNT(*) AS n_total, CAST(SUM(kept) AS BIGINT) AS n_kept
        FROM k GROUP BY lang ORDER BY lang""")),

    QueryDef(
      "q97_group_sample",
      (s, dir) => {
        // fixed-size per-language inspection sample (the "eyeball 20
        // docs per stratum" QA step), deterministic via the md5-ranked
        // reservoir — membership replays exactly in SQL.
        val docs = Tables.load(s, dir, "documents")
        Sampling.groupHashSample(docs, "lang", "doc_id", k = 20)
          .select(col("lang"), col("sample_rank"), col("doc_id"))
          .orderBy(col("lang"), col("sample_rank"))
      },
      Some("""
        WITH h AS (
          SELECT lang, doc_id,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              AS h60
          FROM documents),
        r AS (
          SELECT lang, doc_id,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h60, doc_id)
              AS sample_rank
          FROM h)
        SELECT lang, sample_rank, doc_id
        FROM r WHERE sample_rank <= 20
        ORDER BY lang, sample_rank"""))
  )
}
