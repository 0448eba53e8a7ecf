package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Near-duplicate detection over `documents` (graft.ext.Dedup).
  * q64 (exact n-gram Jaccard on a bounded candidate slice) carries a
  * DuckDB oracle; the MinHash-LSH and SimHash variants are
  * non-SQL-expressible → rows-only driver check + ScalaTest goldens.
  */
object DedupQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q64_ngram_jaccard",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val withSh = docs.select(col("doc_id"), col("lang"),
          Dedup.shingles(col("text")).as("sh"))
        val a = withSh.filter(col("doc_id") < 100)
          .select(col("doc_id").as("doc_id_a"), col("lang"), col("sh").as("sh_a"))
        val b = withSh
          .select(col("doc_id").as("doc_id_b"), col("lang"), col("sh").as("sh_b"))
        broadcast(a).join(b, Seq("lang"))
          .filter(col("doc_id_a") < col("doc_id_b"))
          .withColumn("jaccard_sim",
            round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6))
          .filter(col("jaccard_sim") >= 0.05)
          .select(col("doc_id_a"), col("doc_id_b"), col("jaccard_sim"))
          .orderBy(col("doc_id_a"), col("doc_id_b"))
      },
      Some("""
        WITH sh AS (
          SELECT doc_id, lang,
            list_distinct(
              list_transform(range(1, len(regexp_split_to_array(trim(lower(text)), '\s+')) - 1),
                i -> regexp_split_to_array(trim(lower(text)), '\s+')[i] || ' ' ||
                     regexp_split_to_array(trim(lower(text)), '\s+')[i+1] || ' ' ||
                     regexp_split_to_array(trim(lower(text)), '\s+')[i+2])) AS s
          FROM documents),
        p AS (
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
            ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6)
              AS jaccard_sim
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE a.doc_id < 100)
        SELECT doc_id_a, doc_id_b, jaccard_sim
        FROM p
        WHERE jaccard_sim >= 0.05
        ORDER BY doc_id_a, doc_id_b"""),
      headline = true),

    QueryDef(
      "q65_minhash_dedup",
      (s, dir) =>
        Dedup.minhashDupPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          k = 64, bands = 16, threshold = 0.3)
          .orderBy(col("doc_id_a"), col("doc_id_b")),
      None,
      headline = true),

    QueryDef(
      "q66_simhash_dedup",
      (s, dir) =>
        Dedup.simhashDupPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text", maxDist = 3)
          .orderBy(col("doc_id_a"), col("doc_id_b")),
      None)
  )
}
