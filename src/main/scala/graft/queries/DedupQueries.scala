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
        // inverted-index formulation: explode shingles, equi-join on
        // (lang, shingle), count matches per pair in a codegen'd hash
        // aggregate — |A∩B| without per-pair interpreted array ops;
        // |A∪B| = |A|+|B|−|A∩B| from the pre-computed sizes. Pairs
        // sharing no shingle can't clear the 0.05 floor, so dropping
        // them (inherent to the index join) is lossless.
        val docs = Tables.load(s, dir, "documents")
        val exploded = Dedup.explodedShingles(docs, "doc_id", "text",
          extraCols = Seq("lang"))
        // per-doc DISTINCT shingle-set size (set semantics for Jaccard)
        val szs = exploded.groupBy(col("doc_id"), col("lang"))
          .agg(count_distinct(col("s")).as("sz"))
        val ax = exploded.filter(col("doc_id") < 100)
          .select(col("doc_id").as("doc_id_a"), col("lang"), col("s"))
        val bx = exploded
          .select(col("doc_id").as("doc_id_b"), col("lang"), col("s"))
        broadcast(ax).join(bx, Seq("lang", "s"))
          .filter(col("doc_id_a") < col("doc_id_b"))
          .groupBy(col("doc_id_a"), col("doc_id_b"))
          .agg(count_distinct(col("s")).as("inter"))
          // unhinted: AQE broadcasts szs when small; at 100 TB this is
          // a shuffle join on doc_id against the (large) per-doc sizes
          .join(szs.select(col("doc_id").as("doc_id_a"), col("sz").as("sz_a")),
            Seq("doc_id_a"))
          .join(szs.select(col("doc_id").as("doc_id_b"), col("sz").as("sz_b")),
            Seq("doc_id_b"))
          .withColumn("jaccard_sim",
            round(col("inter").cast("double")
              / (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6))
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
      "q76_dedup_clusters",
      (s, dir) =>
        Dedup.dedupClusters(Tables.load(s, dir, "documents"),
          "doc_id", "text", threshold = 0.3)
          .orderBy(col("cluster_id")),
      None),

    QueryDef(
      "q66_simhash_dedup",
      (s, dir) =>
        Dedup.simhashDupPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text", maxDist = 3)
          .orderBy(col("doc_id_a"), col("doc_id_b")),
      None)
  )
}
