package graft

/** Audit of the banked bench evidence (`bench_diag/run_*.json`)
  * against the `stormed` stamp's documented semantics (r11 ADVICE,
  * both findings).
  *
  * The stamp exists so the floor history ([[Bench.diagFloors]] /
  * `scripts/adjudicate_bench.py` `history_floors`) can exclude runs
  * measured inside a degraded-delivery window — their per-entry bests
  * are storm-inflated, and admitting them drifts the medians upward,
  * silently loosening the 3× task-floor and 1.5× wall-floor gates in
  * the bench-favorable direction. Round 11 introduced the stamp for
  * NEW runs (the bench self-stamps when its in-process discount
  * mirror counts ≥ 2 entries) and hand-stamped four r10 rehearsals,
  * but never audited the older history; this audit closes that gap
  * and pins the semantics:
  *
  *   - `stormed: true` with ≥ 2 recomputed discounts — the rule-based
  *     stamp, reproducible from the file alone;
  *   - `stormed: true` with < 2 recomputed discounts — allowed ONLY
  *     with a `stormed_reason` field naming the manual evidence (a
  *     storm rehearsal run by hand, or a storm witnessed by a
  *     committed contract / canary readings that the current rule's
  *     recompute cannot see — e.g. pre-r10 files carry no stamped
  *     wall floors, so the wall witness is blind there);
  *   - unstamped with ≥ 2 recomputed discounts — a violation:
  *     storm-inflated bests silently sitting in the floor basis.
  *
  * "Recomputed discounts" means [[BenchReport.discountedEntries]] —
  * the exact in-process mirror the live bench stamps with — replayed
  * over the file's OWN evidence: its `runs`/`host_env` arrays, its
  * stamped `nominal_par_ms`, and its stamped per-entry
  * `task_floor`/`wall_floor` (the floors the run itself was judged
  * against at bench time). Replaying against the file's own stamped
  * floors, not today's history, keeps the audit stable: a later
  * stamping or banking of other files can never flip this file's
  * verdict, so the invariant DiagAuditSpec pins holds round to round.
  * The recorded number per entry is reconstructed with the shared
  * selection rule ([[BenchReport.selectedIndex]]), which is how the
  * live bench derived it.
  *
  * Run as a main to audit (and, with `--stamp`, to retro-stamp
  * rule-violating files in place): `sbt "runMain graft.DiagAudit
  * [--stamp] [dir]"`. Stamping is additive JSON field insertion —
  * the evidence arrays are never touched.
  */
object DiagAudit {
  import org.json4s._
  import org.json4s.jackson.JsonMethods.parse

  /** One banked diag file's stamp state + recomputed discount set. */
  final case class Audit(file: String, stormed: Boolean,
                         reason: Option[String], discounts: Seq[String]) {
    /** True when the file violates the stamp semantics: unstamped
      * with ≥ 2 recomputed discounts, or stamped below the rule's
      * threshold with no manual reason on record.
      */
    def violation: Boolean =
      (!stormed && discounts.size >= 2) ||
        (stormed && discounts.size < 2 && reason.forall(_.trim.isEmpty))
  }

  private def nums(v: JValue): Seq[Double] = v match {
    case JArray(xs) => xs.collect {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
    }
    case _ => Nil
  }
  private def longs(v: JValue): Seq[Long] = v match {
    case JArray(xs) => xs.collect {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d.toLong
    }
    case _ => Nil
  }
  private def dbl(v: JValue, dflt: Double = -1.0): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case _ => dflt
  }

  /** The discount mirror replayed over one diag document's own
    * evidence (see the object scaladoc for the basis). Entries whose
    * `host_env` row is missing are unadjudicable and skipped, exactly
    * as [[BenchReport.discountedEntries]] skips them live.
    */
  def recomputedDiscounts(json: String): Seq[String] = {
    val j = parse(json)
    val nominal = dbl(j \ "nominal_par_ms")
    val rawRuns: Seq[(String, Seq[Double])] = j \ "runs" match {
      case JObject(fields) => fields.map { case (k, v) => k -> nums(v) }
      case _ => Nil
    }
    val env: Map[String, BenchReport.EntryEnv] = (j \ "host_env" match {
      case JObject(fields) => fields.map { case (entry, v) =>
        entry -> BenchReport.EntryEnv(Nil, Nil, Nil, Nil,
          taskSec = nums(v \ "task_sec"),
          janino = longs(v \ "janino_compiles"),
          canaryParMs = nums(v \ "canary_par_ms"),
          taskFloor = dbl(v \ "task_floor"),
          wallFloor = dbl(v \ "wall_floor"))
      }
      case _ => Nil
    }).toMap
    // the recorded number per entry, reconstructed with the shared
    // selection rule — the same derivation the live bench used
    val results = rawRuns.collect { case (name, runs)
        if runs.nonEmpty && env.contains(name) =>
      name -> runs(BenchReport.selectedIndex(runs, env(name), nominal))
    }
    val runsMap = rawRuns.toMap
    BenchReport.discountedEntries(results, runsMap, env, nominal)
  }

  /** Audit every `run_<digits>.json` under `dir` (the same file-name
    * gate as [[Bench.diagFloors]]), sorted by run id. Malformed files
    * are skipped — they never feed the floor basis either.
    */
  def auditDir(dir: java.nio.file.Path): Seq[Audit] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val re = "run_(\\d+)\\.json".r
    val stream = java.nio.file.Files.list(dir)
    val files =
      try stream.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case re(id) => Some(id.toLong -> p)
          case _ => None
        }
      }.toList.sortBy(_._1)
      finally stream.close()
    files.flatMap { case (_, p) =>
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val j = parse(txt)
        val stormed = j \ "stormed" match {
          case JBool(b) => b
          case _ => false
        }
        val reason = j \ "stormed_reason" match {
          case JString(s) => Some(s)
          case _ => None
        }
        Some(Audit(p.getFileName.toString, stormed, reason,
          recomputedDiscounts(txt)))
      } catch { case _: Throwable => None }
    }
  }

  /** Insert `"stormed":true,"stormed_reason":<reason>` into a diag
    * document, preserving every existing byte of evidence: a file
    * already carrying a `stormed` literal gets it rewritten in place;
    * a pre-r11 file (no stamp) gets the pair inserted right after the
    * opening brace. A document ALREADY carrying a `stormed_reason`
    * never gains a second one (r12 ADVICE: inserting beside an
    * existing reason produced a duplicate JSON key) — the existing
    * reason is itself evidence, so it is kept verbatim and only the
    * stamp is flipped true. Returns the stamped text.
    */
  def stampText(txt: String, reason: String): String = {
    val t = "\"stormed\":true"
    if (txt.contains("\"stormed_reason\":")) {
      if (txt.contains(t)) txt // fully stamped already: no-op
      else if (txt.contains("\"stormed\":false"))
        txt.replaceFirst("\"stormed\":false",
          java.util.regex.Matcher.quoteReplacement(t))
      else txt.replaceFirst("\\{",
        java.util.regex.Matcher.quoteReplacement("{" + t + ","))
    } else {
      val r = "\"stormed_reason\":" + jstr(reason)
      if (txt.contains(t))
        txt.replaceFirst(t,
          java.util.regex.Matcher.quoteReplacement(t + "," + r))
      else if (txt.contains("\"stormed\":false"))
        txt.replaceFirst("\"stormed\":false",
          java.util.regex.Matcher.quoteReplacement(t + "," + r))
      else txt.replaceFirst("\\{",
        java.util.regex.Matcher.quoteReplacement("{" + t + "," + r + ","))
    }
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val apply = args.contains("--stamp")
    val dir = java.nio.file.Paths.get(
      args.filterNot(_.startsWith("--")).headOption.getOrElse("bench_diag"))
    val audits = auditDir(dir)
    audits.foreach { a =>
      val state =
        if (a.violation && !a.stormed) "NEEDS-STAMP"
        else if (a.violation) "NEEDS-REASON"
        else if (a.stormed) "stormed"
        else "clean"
      println(f"${a.file}%-28s ${a.discounts.size}%2d discounts  $state%-12s " +
        a.discounts.mkString(", "))
    }
    val toStamp = audits.filter(a => a.violation && !a.stormed)
    if (apply) toStamp.foreach { a =>
      val p = dir.resolve(a.file)
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val reason = s"retro-audit r12: ${a.discounts.size} recomputed " +
        s"discounts (${a.discounts.mkString(", ")}) — storm-inflated " +
        "bests excluded from the floor basis"
      java.nio.file.Files.write(p, stampText(txt, reason)
        .getBytes("UTF-8")): Unit
      println(s"stamped ${a.file}")
    } else if (toStamp.nonEmpty)
      println(s"\n${toStamp.size} file(s) need a stamp — rerun with --stamp")
    reportFloorCoverage(dir)
  }

  /** Floor-coverage report (r12 ADVICE): storm-stamping evicts whole
    * files from the floor basis, and an entry whose non-stormed
    * coverage falls below [[Bench.diagFloors]]'s ≥3-file minimum
    * silently loses its 3× task-floor / 1.5× wall-floor gate — the
    * bench-favorable direction, invisible without this report (the r12
    * retro-stamp dropped q80_media_features from 4 to 2 contributing
    * files). Prints, at the official scale, every entry whose
    * non-stormed coverage sits under the minimum while its any-file
    * coverage meets it — i.e. entries whose gate the eviction (not a
    * thin history) disabled.
    */
  def reportFloorCoverage(dir: java.nio.file.Path): Unit = {
    val sf = Some(Bench.legacyDiagSf)
    val (task, wall) = Bench.diagFloorCoverage(dir, sf)
    val (taskAll, wallAll) =
      Bench.diagFloorCoverage(dir, sf, includeStormed = true)
    def lost(cov: Map[String, Int], all: Map[String, Int]): Seq[String] =
      all.collect { case (e, n) if n >= 3 && cov.getOrElse(e, 0) < 3 =>
        f"$e%-28s ${cov.getOrElse(e, 0)}%d/3 non-stormed ($n%d incl. stormed)"
      }.toSeq.sorted
    val lostTask = lost(task, taskAll)
    val lostWall = lost(wall, wallAll)
    if (lostTask.nonEmpty || lostWall.nonEmpty) {
      println("\nfloor coverage lost to storm eviction (gate disabled " +
        "until 3 clean runs bank):")
      lostTask.foreach(l => println(s"  task  $l"))
      lostWall.foreach(l => println(s"  wall  $l"))
    } else println("\nfloor coverage: no entry lost its >=3-file " +
      "minimum to storm eviction")
  }
}
