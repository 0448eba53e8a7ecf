package graft

/** Pure assembly of the bench's two output documents — the compact
  * driver contract line (the LAST stdout line, the only thing the
  * driver parses into `BENCH_r{N}.json`) and the diagnostics JSON
  * (`BENCH_DIAG.json` / stderr twin).
  *
  * Extracted from [[Bench]] so the contract can be spec-pinned: round
  * 4's official bench record came back `parsed: null` because the
  * then-inline diag pushed the one stdout line past the driver's tail
  * capture — a silent, round-losing failure mode that a unit test on
  * the assembled string would have caught. BenchReportSpec now
  * asserts both documents parse as JSON, the contract line stays
  * single-line and small, and non-finite timings can never corrupt
  * the record (JSON has no NaN/Infinity literal; a bare `NaN` in the
  * line would fail the driver's json.load and zero the round again).
  */
object BenchReport {

  /** A timing rendered for JSON: non-finite → -1.0, the bench's
    * existing "this entry failed" marker, so the line stays parseable
    * no matter what a timer produced.
    */
  private def num(v: Double): String =
    if (java.lang.Double.isFinite(v)) v.toString else "-1.0"

  /** Headline total: probe entries (x10_/x30_) and the q93 split
    * components are reported per-query but excluded, so the figure
    * stays comparable round to round; failed entries (< 0) don't
    * drag the sum.
    */
  def totalOf(results: Seq[(String, Double)]): Double =
    results.filter(r => !r._1.startsWith("x10_") &&
        !r._1.startsWith("x30_") && !r._1.startsWith("q93a") &&
        !r._1.startsWith("q93b"))
      .map(_._2).filter(v => v >= 0 && java.lang.Double.isFinite(v)).sum

  /** The driver contract line: {"metric","value","unit","queries","sf"}.
    * Keys are code literals (no user text), so the only escape surface
    * is `sfDir`, which is JSON-string-escaped.
    */
  def contractLine(results: Seq[(String, Double)], sfDir: String): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${num(totalOf(results))},"unit":"sec","queries":$qs,"sf":${jstr(sfDir)}}"""
  }

  /** Diag document: raw per-run times, pre-entry heap, minhash verify
    * decisions, LSH bucket histograms, corpus build costs. The
    * minhash/lsh values arrive pre-rendered as JSON objects.
    */
  def diagJson(rawRuns: collection.Map[String, Seq[Double]],
               heapMb: collection.Map[String, Long],
               minhashDiag: collection.Map[String, String],
               lshDiag: collection.Map[String, String],
               corpusBuild10: Double, corpusBuild30: Double): String = {
    // Locale.ROOT: the default-locale f"" interpolator renders 0.9 as
    // "0,900" under comma-decimal locales — still JSON, but four ints
    // where two doubles belong, silently corrupting the record
    val runsJson = rawRuns.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(t =>
        if (java.lang.Double.isFinite(t))
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
        else "-1.0")
        .mkString(",") + "]"
    }.mkString("{", ",", "}")
    val heapJson = heapMb.map { case (k, m) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val mhJson = minhashDiag.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val lshJson = lshDiag.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"runs":$runsJson,"heap_mb_before":$heapJson,""" +
      s""""minhash":$mhJson,"lsh":$lshJson,"corpus_build_sec":""" +
      s"""{"x10":${num(corpusBuild10)},"x30":${num(corpusBuild30)}}}"""
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
