package graft

import org.apache.spark.sql.functions._
import graft.ext.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(names: Seq[String], d: Int): Set[(String, String)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    (for {
      a <- names; b <- names
      if a < b && lev(a, b) <= d
    } yield (a, b)).toSet
  }

  private val names = Seq(
    "small ring", "small rings", "smal ring",  // 1-delete / 1-insert
    "smell rung",                              // 2 substitutions of "small ring"
    "red widget", "red widgte",                // transposition = 2 (sub+sub)
    "blue bolt", "blue bolt", "bolt blue",     // dup row + far reordering
    "hot gear", "a", "")                       // shorts + empty (guard path)

  test("fuzzySelfPairs d=2: exact recall+precision vs brute force, incl. short strings") {
    val got = EntityResolution.fuzzySelfPairs(names.toDF("n"), "n", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === bruteForce(names.distinct, 2))
    assert(got.contains(("small ring", "small rings")))
    assert(got.contains(("red widget", "red widgte")))
    assert(!got.exists(p => p._1 == "bolt blue" && p._2 == "hot gear"))
  }

  test("fuzzySelfPairs d=1 is the distance-1 subset with correct distances") {
    val rows = EntityResolution.fuzzySelfPairs(names.toDF("n"), "n", maxDist = 1)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows.keySet === bruteForce(names.distinct, 1))
    assert(rows(("small ring", "small rings")) === 1L)
  }

  test("blocking is dictionary-scale: corpus duplicates collapse before the variant join") {
    // 1000 corpus rows over a 3-name dictionary: the variant table must
    // be built from the 3 distinct names, not the 1000 rows
    val corpus = (1 to 1000).map(i => Seq("aaa", "aab", "zzz")(i % 3)).toDF("n")
    val out = EntityResolution.fuzzySelfPairs(corpus, "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("aaa", "aab", 1L)))
  }
}
