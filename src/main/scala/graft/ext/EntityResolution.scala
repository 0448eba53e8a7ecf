package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: all pairs of strings within a small edit
  * distance, at corpus scale. The reference's dimension data carries
  * free-text entity names (products.csv `product_name`,
  * `pipeline/generator/data/products.csv:1`) that an ingest pipeline
  * must reconcile across feeds — the classic fuzzy-join.
  *
  * Shape (the part that must survive 100 TB):
  *  1. `distinct()` the name column — one hash-agg shuffle whose
  *     output is the DICTIONARY, orders of magnitude smaller than the
  *     corpus. Everything after runs at dictionary scale; corpus rows
  *     are never shuffled again.
  *  2. Deletion-neighborhood blocking (the SymSpell bound): if
  *     lev(a,b) ≤ d then a and b share a common string reachable by
  *     deleting ≤ d characters from each (align an optimal edit
  *     script; drop each edited position from its side). Each name
  *     expands map-side into its O(L^d) delete-variants — pure
  *     builtin `transform`/`sequence`/`substr` array expressions, no
  *     UDF, fully codegen'd.
  *  3. One equi-join of the variant table with itself → candidate
  *     pairs. Skew is bounded by how many dictionary entries share a
  *     variant (dictionary density), not by corpus row counts.
  *  4. Verify with the codegen'd `levenshtein` builtin on candidate
  *     pairs only (output-scale work). Blocking is recall-lossless by
  *     the bound above, so the verify filter is exact — any recall
  *     regression shows up as a missing oracle row, not silent loss.
  */
object EntityResolution {

  /** `array` of every string reachable from `name` by deleting at most
    * `maxDist` characters (the string itself, all 1-deletes, and — for
    * maxDist = 2 only — all 2-deletes), de-duplicated. The 2-delete
    * arm is O(L²) variants per name vs O(L) for 1-deletes, and the
    * SymSpell bound needs only d-deletes for distance-d recall, so
    * emitting it under maxDist = 1 would inflate the variant table
    * ~L/2× and the self-join candidate set quadratically, all to
    * produce distance-2 pairs the verify filter then discards. Guards
    * keep `sequence` ascending for short inputs (Spark's
    * `sequence(0, -1)` would yield a DESCENDING range).
    */
  private def deleteVariantsSql(maxDist: Int): String = {
    val d2Arm = """,
      |  if(length(name) >= 2,
      |     flatten(transform(sequence(0, length(name) - 2),
      |       i -> transform(sequence(i + 1, length(name) - 1),
      |         j -> concat(substr(name, 1, i),
      |                     substr(name, i + 2, j - i - 1),
      |                     substr(name, j + 2))))),
      |     array())""".stripMargin
    """array_distinct(concat(
      |  array(name),
      |  if(length(name) >= 1,
      |     transform(sequence(0, length(name) - 1),
      |       i -> concat(substr(name, 1, i), substr(name, i + 2))),
      |     array())""".stripMargin +
      (if (maxDist == 2) d2Arm else "") + "))"
  }

  /** All unordered pairs of DISTINCT values of `nameCol` with
    * Levenshtein distance ≤ `maxDist` (1 or 2). Columns:
    * `name_a < name_b`, `edit_dist` (bigint).
    */
  def fuzzySelfPairs(df: DataFrame, nameCol: String, maxDist: Int = 2)
      : DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion blocking is built for d<=2, got $maxDist")
    val dict = df.select(col(nameCol).as("name")).na.drop().distinct()
    val variants = dict
      .select(col("name"), explode(expr(deleteVariantsSql(maxDist))).as("v"))
    val a = variants.select(col("name").as("name_a"), col("v"))
    val b = variants.select(col("name").as("name_b"), col("v"))
    a.join(b, Seq("v"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b")
      .distinct()
      // threshold form runs the banded DP (O(d·n) per pair, not
      // O(n²)) and returns -1 past the bound
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("bigint"))
      .filter(col("edit_dist") >= 0)
  }
}
