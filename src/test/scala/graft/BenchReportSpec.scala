package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's driver contract: BENCH_r04.json came back
  * `parsed: null` because the stdout line outgrew the driver's tail
  * capture — this spec makes both failure modes (oversized line,
  * unparseable JSON) a red test instead of a silently lost round.
  * Strict-parses with Jackson (no NaN/Infinity leniency — the driver
  * uses Python json.load, which rejects nothing JSON forbids... but
  * accepts bare NaN, so strictness HERE is the stronger gate).
  */
class BenchReportSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(s: String): JsonNode = mapper.readTree(s)

  private val results = Seq(
    "q01_pricing_summary" -> 0.5, "q93_incremental_mv" -> 3.0,
    "q93a_mv_maintain" -> 2.4, "q93b_mv_read" -> 0.6,
    "ingest_parse_write_100k" -> 1.5,
    "x10_q65_minhash_dedup" -> 4.3, "x30_q65_minhash_dedup" -> 10.0,
    "x10_q72_lsh_auto" -> 1.3)

  test("contract line: valid single-line JSON with the driver's fields") {
    val line = BenchReport.contractLine(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    val j = parse(line)
    assert(j.get("metric").asText() === "total")
    assert(j.get("unit").asText() === "sec")
    assert(j.get("sf").asText() === "/root/testdata/sf0.1")
    assert(j.get("queries").size() === results.size)
    assert(j.get("value").isNumber)
  }

  test("total excludes probe entries and q93 components, skips failures") {
    // headline subset of `results`: q01 (0.5) + q93 (3.0) + ingest (1.5)
    assert(math.abs(BenchReport.totalOf(results) - 5.0) < 1e-9)
    // a failed headline (-1.0 marker) must not drag the sum
    val withFail = results :+ ("q99_broken" -> -1.0)
    assert(math.abs(BenchReport.totalOf(withFail) - 5.0) < 1e-9)
  }

  test("non-finite timings are sanitized — the line still parses") {
    val poisoned = results ++ Seq("q98_nan" -> Double.NaN,
      "q97_inf" -> Double.PositiveInfinity)
    val line = BenchReport.contractLine(poisoned, "/sf")
    val j = parse(line)
    assert(j.get("queries").get("q98_nan").asDouble() === -1.0)
    assert(j.get("queries").get("q97_inf").asDouble() === -1.0)
    // NaN entries read as failures, not as part of the total
    assert(j.get("value").asDouble() === BenchReport.totalOf(results))
  }

  test("sfDir with JSON-hostile characters is escaped") {
    val line = BenchReport.contractLine(results, "/tmp/a\"b\\c\nd")
    assert(parse(line).get("sf").asText() === "/tmp/a\"b\\c\nd")
  }

  test("contract line stays within the driver's tail capture at full scale") {
    // ~50 entries with long names ≈ the real bench's shape; the r4
    // regression shipped a line two orders of magnitude larger
    val big = (1 to 50).map(i => f"x10_q$i%03d_some_longish_entry_name" -> 1.234567890123)
    val line = BenchReport.contractLine(big, "/root/testdata/sf0.1")
    assert(line.length < 4096, s"contract line ${line.length}B risks tail-capture truncation")
    parse(line): Unit
  }

  test("diag json parses with all five sections") {
    val diag = BenchReport.diagJson(
      rawRuns = scala.collection.mutable.LinkedHashMap(
        "q01" -> Seq(0.9, 0.5), "x10_q65" -> Seq(6.1, 4.3, Double.NaN)),
      heapMb = scala.collection.mutable.LinkedHashMap("q01" -> 127L),
      minhashDiag = scala.collection.mutable.LinkedHashMap(
        "q65" -> """{"n_pairs":265,"verify_join":"broadcast"}"""),
      lshDiag = scala.collection.mutable.LinkedHashMap(
        "q72" -> """{"n_candidates":9354,"n_buckets":252,"max_bucket":23}"""),
      corpusBuild10 = 2.15, corpusBuild30 = Double.NaN)
    val j = parse(diag)
    assert(j.get("runs").get("x10_q65").get(2).asDouble() === -1.0)
    assert(j.get("heap_mb_before").get("q01").asLong() === 127L)
    assert(j.get("minhash").get("q65").get("n_pairs").asLong() === 265L)
    assert(j.get("lsh").get("q72").get("max_bucket").asLong() === 23L)
    assert(j.get("corpus_build_sec").get("x30").asDouble() === -1.0)
  }
}
