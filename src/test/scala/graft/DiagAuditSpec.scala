package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `stormed` stamp's semantics over the REAL banked bench
  * evidence (r11 ADVICE, both findings): every `bench_diag/run_*.json`
  * must satisfy
  *
  *   recomputed discounts ≥ 2  ⇒  `stormed: true`
  *   `stormed: true` ∧ recomputed discounts < 2  ⇒  `stormed_reason`
  *
  * where "recomputed" is [[DiagAudit.recomputedDiscounts]] — the live
  * discount mirror ([[BenchReport.discountedEntries]]) replayed over
  * the file's own evidence and stamped floors, so the check is stable
  * against later history growth. Without this, a storm-measured run's
  * inflated per-entry bests sit silently in the floor basis, drifting
  * the medians upward and loosening the 3× task-floor and 1.5×
  * wall-floor degradation gates in the bench-favorable direction.
  */
class DiagAuditSpec extends AnyFunSuite {

  /** A minimal diag document with two entries whose evidence makes
    * both discounted: each entry's only run breaches its stamped wall
    * floor at ≥ 1.5× (the delivery-collapse witness), which
    * [[BenchReport.needsDiscount]] counts as min-run-degraded.
    */
  private def envRow(q: String): String =
    s""""$q":{"task_sec":[5.0],"janino_compiles":[0],""" +
      s""""canary_par_ms":[50.0],"task_floor":4.8,"wall_floor":4.0}"""

  private def stormyDiag(stormed: Boolean, reason: Option[String],
                         envOf: Seq[String] = Seq("qA", "qB")) = {
    val stamp = s""""stormed":$stormed,""" +
      reason.map(r => s""""stormed_reason":"$r",""").getOrElse("")
    s"""{"run_id":1,$stamp"nominal_par_ms":49.0,""" +
      s""""runs":{"qA":[6.5],"qB":[7.1]},""" +
      s""""host_env":{${envOf.map(envRow).mkString(",")}}}"""
  }

  test("recomputedDiscounts replays the live mirror over a file's own" +
    " evidence") {
    assert(DiagAudit.recomputedDiscounts(stormyDiag(false, None))
      === Seq("qA", "qB"))
    // healthy walls against the same floors -> no discounts
    val clean = stormyDiag(false, None)
      .replace("[6.5]", "[4.1]").replace("[7.1]", "[4.2]")
    assert(DiagAudit.recomputedDiscounts(clean).isEmpty)
    // an entry with runs but no host_env row is unadjudicable and
    // skipped, exactly as the live mirror skips it
    val noEnv = stormyDiag(false, None, envOf = Seq("qA"))
    assert(DiagAudit.recomputedDiscounts(noEnv) === Seq("qA"))
  }

  test("violation: unstamped >=2 discounts, or stamped <2 without a" +
    " reason") {
    import DiagAudit.Audit
    assert(Audit("f", stormed = false, None, Seq("qA", "qB")).violation)
    assert(!Audit("f", stormed = true, None, Seq("qA", "qB")).violation)
    // a manual stamp below the rule threshold needs its reason
    assert(Audit("f", stormed = true, None, Seq("qA")).violation)
    assert(Audit("f", stormed = true, Some("  "), Seq("qA")).violation)
    assert(!Audit("f", stormed = true,
      Some("storm rehearsal run by hand"), Seq("qA")).violation)
    // the common cases: clean file, single localized blip
    assert(!Audit("f", stormed = false, None, Nil).violation)
    assert(!Audit("f", stormed = false, None, Seq("qA")).violation)
  }

  test("stampText inserts the stamp without touching evidence") {
    // pre-r11 file: no stormed key at all
    val old = """{"run_id":7,"runs":{"qA":[1.0]}}"""
    val stamped = DiagAudit.stampText(old, "why")
    assert(stamped ===
      """{"stormed":true,"stormed_reason":"why","run_id":7,""" +
        """"runs":{"qA":[1.0]}}""")
    // r11+ file with a false stamp gets it flipped in place
    val r11 = """{"run_id":8,"stormed":false,"runs":{}}"""
    assert(DiagAudit.stampText(r11, "x") ===
      """{"run_id":8,"stormed":true,"stormed_reason":"x","runs":{}}""")
    // an already-true stamp only gains the reason
    val t = """{"run_id":9,"stormed":true,"runs":{}}"""
    assert(DiagAudit.stampText(t, "x") ===
      """{"run_id":9,"stormed":true,"stormed_reason":"x","runs":{}}""")
    // all three parse and audit as stamped-with-reason
    for (s <- Seq(stamped, DiagAudit.stampText(r11, "x")))
      assert(org.json4s.jackson.JsonMethods.parse(s) \ "stormed" ===
        org.json4s.JBool(true))
    // r12 ADVICE: a document ALREADY carrying a stormed_reason never
    // gains a second one (duplicate JSON key) — the existing reason is
    // evidence and is kept verbatim; only the stamp flips
    val withReason =
      """{"run_id":10,"stormed":false,"stormed_reason":"hand","runs":{}}"""
    assert(DiagAudit.stampText(withReason, "x") ===
      """{"run_id":10,"stormed":true,"stormed_reason":"hand","runs":{}}""")
    val full =
      """{"run_id":11,"stormed":true,"stormed_reason":"hand","runs":{}}"""
    assert(DiagAudit.stampText(full, "x") === full) // fully stamped: no-op
    // reason but no stormed literal (hand-edited file): gains only the
    // stamp, right after the opening brace
    val reasonOnly = """{"run_id":12,"stormed_reason":"hand","runs":{}}"""
    assert(DiagAudit.stampText(reasonOnly, "x") ===
      """{"stormed":true,"run_id":12,"stormed_reason":"hand","runs":{}}""")
    // stamping is idempotent end-to-end now
    assert(DiagAudit.stampText(DiagAudit.stampText(old, "why"), "again")
      === stamped)
  }

  test("diagFloorCoverage reports the gates storm-eviction disabled") {
    // r12 ADVICE: retro-stamping evicts whole files from the floor
    // basis, and an entry whose non-stormed coverage falls below the
    // >=3-file minimum silently loses its 3x task-floor gate (the live
    // case: q80_media_features dropped 4 -> 2). The coverage pair
    // (non-stormed vs any-file) makes the eviction visible.
    val dir = java.nio.file.Files.createTempDirectory("floor-cov")
    def put(id: Long, stormed: Boolean, qs: Map[String, Double]): Unit = {
      val env = qs.map { case (e, t) => s""""$e":{"task_sec":[$t]}""" }
        .mkString("{", ",", "}")
      val runs = qs.map { case (e, t) => s""""$e":[${t * 2}]""" }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(dir.resolve(s"run_$id.json"),
        (s"""{"run_id":$id,"stormed":$stormed,"runs":$runs,""" +
          s""""host_env":$env}""").getBytes("UTF-8")): Unit
    }
    put(1, stormed = false, Map("qA" -> 5.0, "qB" -> 5.0))
    put(2, stormed = false, Map("qA" -> 5.0, "qB" -> 5.0, "qC" -> 5.0))
    put(3, stormed = true, Map("qA" -> 9.0))
    put(4, stormed = false, Map("qB" -> 5.0))
    put(5, stormed = true, Map("qA" -> 9.0, "qC" -> 9.0))
    val sf = Some(Bench.legacyDiagSf)
    val (task, wall) = Bench.diagFloorCoverage(dir, sf)
    // qA: 2 of its 4 files survive the storm filter — gate lost;
    // qB: 3 clean files — gate intact; qC: 2 files even counting the
    // stormed one — thin history, never had the gate
    assert(task("qA") === 2 && task("qB") === 3 && task("qC") === 1)
    assert(wall("qA") === 2 && wall("qB") === 3)
    val (taskAll, _) = Bench.diagFloorCoverage(dir, sf,
      includeStormed = true)
    assert(taskAll("qA") === 4 && taskAll("qB") === 3 &&
      taskAll("qC") === 2)
    // the floors themselves honor the minimum: qB keeps a floor, qA
    // (evicted below 3) and qC (thin) do not
    val floors = Bench.taskFloors(dir, sf)
    assert(floors.contains("qB") && !floors.contains("qA") &&
      !floors.contains("qC"))
    // the report runs without throwing over the same fixture
    DiagAudit.reportFloorCoverage(dir)
  }

  test("auditDir flags exactly the semantics violations") {
    val dir = java.nio.file.Files.createTempDirectory("diag-audit")
    def put(name: String, txt: String): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        txt.getBytes("UTF-8")): Unit
    put("run_1.json", stormyDiag(stormed = false, None)) // violation
    put("run_2.json", stormyDiag(stormed = true, None)) // rule-based ok
    put("run_3.json", DiagAudit.stampText(
      stormyDiag(false, None).replace("[6.5]", "[4.1]")
        .replace("[7.1]", "[4.2]"), "manual rehearsal")) // reason ok
    put("run_x.json", stormyDiag(false, None)) // name gate: ignored
    put("run_4.json", "{malformed") // skipped, as the floors skip it
    val audits = DiagAudit.auditDir(dir)
    assert(audits.map(_.file) === Seq("run_1.json", "run_2.json",
      "run_3.json"))
    assert(audits.filter(_.violation).map(_.file) === Seq("run_1.json"))
  }

  test("every banked diag file satisfies the stamp semantics") {
    val dir = java.nio.file.Paths.get("bench_diag")
    val audits = DiagAudit.auditDir(dir)
    // the history is real in this worktree — don't let a stray CWD
    // make this vacuously green
    assume(audits.size >= 10, s"bench_diag/ not present (got " +
      s"${audits.size} files) — run from the repo root")
    val bad = audits.filter(_.violation)
    assert(bad.isEmpty, "stamp-semantics violations in bench_diag/: " +
      bad.map(a => s"${a.file} (stormed=${a.stormed}, " +
        s"${a.discounts.size} recomputed discounts)").mkString("; ") +
      " — run `sbt \"runMain graft.DiagAudit --stamp\"` for rule " +
      "violations, or add a stormed_reason for manual stamps")
  }
}
