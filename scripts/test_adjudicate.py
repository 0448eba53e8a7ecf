#!/usr/bin/env python3
"""Self-test for scripts/adjudicate_bench.py over synthetic fixtures.

Covers every verdict path the classifier can emit plus the round-8
external references (history floors with sf filtering, cross-scale
with its tolerance band). Run directly:

    python3 scripts/test_adjudicate.py

Exits non-zero on the first failed expectation. No third-party deps —
this is a plain-assert harness, mirroring how the adjudicator itself
is dependency-free.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import adjudicate_bench as ab  # noqa: E402


def env(task=None, pars=None, jan=None):
    e = {}
    if task is not None:
        e["task_sec"] = task
    if pars is not None:
        e["canary_par_ms"] = pars
    if jan is not None:
        e["janino_compiles"] = jan
    return e


def check(name, got, want):
    assert got == want, f"{name}: got {got!r}, want {want!r}"
    print(f"ok  {name:55s} {want}")


def main():
    nominal = 50.0

    # clean: healthy canaries, no compiles, flat task ratios
    v, _ = ab.classify("q", [1.0, 0.9],
                       env([5.0, 5.1], [52.0, 55.0], [0, 0]), nominal, None)
    check("clean", v, "clean")

    # warmup-absorbed: run-1 janino, min run clean
    v, _ = ab.classify("q", [2.0, 0.9],
                       env([10.0, 5.0], [52.0, 55.0], [30, 0]), nominal, None)
    check("warmup-absorbed (janino run 1)", v, "warmup-absorbed")

    # min-run-degraded: the RECORDED run (value-matched from the
    # contract) is the task-inflated one — a legacy artifact whose
    # selection recorded the degraded raw min
    v, _ = ab.classify("q", [2.0, 1.5],
                       env([5.0, 12.0], [52.0, 55.0], [0, 0]), nominal,
                       None, None, 1.5)
    check("min-run-degraded (recorded run degraded)", v, "min-run-degraded")

    # ...but when the recorded number came from the CLEAN run (the
    # round-10 selection rule steers away from degraded runs), the
    # entry is no longer condemned for the degraded run's sins
    v, _ = ab.classify("q", [2.0, 1.5],
                       env([5.0, 12.0], [52.0, 55.0], [0, 0]), nominal,
                       None, None, 2.0)
    check("recorded-from-clean-run stands", v, "warmup-absorbed")

    # with no recorded value the fallback IS the selection rule, which
    # avoids the degraded run — same verdict as the clean-run case
    v, _ = ab.classify("q", [2.0, 1.5],
                       env([5.0, 12.0], [52.0, 55.0], [0, 0]), nominal, None)
    check("selection-rule fallback judges the clean run", v,
          "warmup-absorbed")

    # degraded (intra-entry): every run >=2x the entry's best... needs
    # a best to compare against, so one good task row and all runs
    # still >=2x it is impossible intra-entry — the all-degraded path
    # needs the canary fallback (no usable task rows)
    v, _ = ab.classify("q", [1.0, 1.1],
                       env([0.2, 0.2], [150.0, 140.0], [0, 0]), nominal, None)
    check("degraded (canary fallback, no usable task)", v, "degraded")

    # degraded via HISTORY floor: intra-entry ratios all ~1x (the r7
    # x10_q122 blind spot) but every run >=3x the historical median
    v, notes = ab.classify("q", [89.0, 67.0, 50.0],
                           env([1057.0, 1844.0, 1298.0],
                               [92.0, 64.0, 92.0], [0, 0, 0]),
                           nominal, 36.7)
    check("degraded (history floor, uniform stretch)", v, "degraded")
    assert any("history-floor" in n for n in notes), notes

    # NOT degraded when best run sits under 3x the floor
    v, _ = ab.classify("q", [2.9, 9.8, 3.0],
                       env([40.1, 220.9, 44.7], [65.0, 68.0, 58.0],
                           [0, 0, 0]), nominal, 37.8)
    check("clean-ish best under 3x floor", v, "warmup-absorbed")

    # suspect-uniform: flat 1x ratios, every post-run canary >=2x the
    # GLOBAL nominal, nothing else wrong
    v, _ = ab.classify("q", [1.0, 1.0],
                       env([5.0, 5.1], [120.0, 130.0], [0, 0]), nominal, None)
    check("suspect-uniform", v, "suspect-uniform")

    # ... and run-1 janino warmup (present on most entries) must NOT
    # suppress it — the canary witness is independent of compilation
    v, _ = ab.classify("q", [2.0, 1.0],
                       env([5.0, 5.1], [120.0, 130.0], [92, 0]), nominal,
                       None)
    check("suspect-uniform despite run-1 janino", v, "suspect-uniform")

    # a run whose OWN task row is sub-1s (aliased) falls back to its
    # canary even when a sibling run has a usable row — a screaming
    # canary on the recorded run must not be masked by the usable
    # sibling's task branch
    v, _ = ab.classify("q", [1.2, 5.0],
                       env([0.8, 2.5], [400.0, 52.0], [0, 0]), nominal,
                       None, None, 1.2)
    check("sub-1s recorded run judged by its canary", v, "min-run-degraded")

    # floor breach forces the verdict into the discount total even when
    # the min-time run carries only a sub-1s aliased task row judged by
    # a clean canary — a history-floor note must never sit beside a
    # non-discounted verdict (round-8 ADVICE item)
    v, notes = ab.classify("q", [1.2, 5.0],
                           env([0.9, 120.0], [52.0, 55.0], [0, 0]),
                           nominal, 36.7, None, 1.2)
    check("floor breach forces min-run-degraded", v, "min-run-degraded")
    assert any("history-floor" in n for n in notes), notes

    # wall-floor witness (round 10): a recorded wall >= 1.5x the
    # entry's history wall floor condemns the entry even when every
    # work witness reads clean — the r9 x30_q65 delivery-collapse
    # shape (healthy task_sec, clean canary, 2x honest wall)
    v, notes = ab.classify("q", [12.48, 23.0],
                           env([10.6, 11.0], [60.4, 73.4], [0, 0]),
                           nominal, None, 6.767, 12.48)
    check("wall breach condemns work-clean stall", v, "degraded")
    assert any("wall-floor" in n for n in notes), notes
    # ... under the 1.5x gate the number stands (recorded 9.0 < 10.15)
    v, _ = ab.classify("q", [9.0, 23.0],
                       env([10.6, 11.0], [60.4, 73.4], [0, 0]),
                       nominal, None, 6.767, 9.0)
    check("wall under gate stands", v, "warmup-absorbed")
    # a wall floor below the 0.2s quality gate is scheduler-jitter
    # noise and must read as absent
    v, _ = ab.classify("q", [0.3, 0.25],
                       env([0.1, 0.1], [52.0, 55.0], [0, 0]),
                       nominal, None, 0.15, 0.25)
    check("sub-0.2s wall floor ignored", v, "clean")
    # the wall witness is PER-RUN too: one wall-stalled run beside a
    # clean one -> selection records the clean one, entry stands
    v, _ = ab.classify("q", [12.48, 6.1],
                       env([10.6, 11.0], [60.4, 73.4], [0, 0]),
                       nominal, None, 6.767, 6.1)
    check("clean run escapes a wall-stalled sibling", v, "warmup-absorbed")

    # selected_index: value match wins; fallback avoids degraded and
    # janino-contaminated runs; a failed run poisons to the max
    check("selected_index value match",
          ab.selected_index([2.0, 1.5], env([5.0, 12.0], [52.0, 55.0],
                                            [0, 0]), nominal, None,
                            None, 1.5), 1)
    check("selected_index avoids degraded min",
          ab.selected_index([2.0, 1.5], env([5.0, 12.0], [52.0, 55.0],
                                            [0, 0]), nominal, None), 0)
    check("selected_index avoids janino-contaminated min",
          ab.selected_index([1.0, 1.2], env([5.0, 5.0], [52.0, 55.0],
                                            [30, 0]), nominal, None), 1)
    check("selected_index all-condemned falls back to raw min",
          ab.selected_index([1.0, 1.2], env([0.2, 0.2], [150.0, 140.0],
                                            [0, 0]), nominal, None), 0)
    check("selected_index failure poisons to max",
          ab.selected_index([1.0, -1.0, 3.0], env([5.0, 5.0, 5.0],
                                                  [52.0, 55.0, 52.0],
                                                  [0, 0, 0]),
                            nominal, None), 2)

    # cache-thrash is an ANNOTATION beside the verdict, never a verdict
    v, notes = ab.classify("q", [1.0, 1.0],
                           env([5.0, 5.0], [52.0, 52.0], [40, 41]),
                           nominal, None)
    assert any(n.startswith("cache-thrash") for n in notes), notes
    check("cache-thrash annotated, verdict separate", v, "warmup-absorbed")

    # cross-scale: x10 best > 1.25x x30 best flags the x10 entry;
    # near-equality inside the band does not (8.3 vs 8.1 observed
    # honest); x30 > 8x x10 flags the x30 entry (honest q65 ratios
    # reach 6.2x, stalls start at 10x — the gate sits between)
    diag = {"host_env": {
        "x10_qA": env([40.0]), "x30_qA": env([10.0]),     # 4x  -> flag x10
        "x10_qB": env([8.3]), "x30_qB": env([8.1]),       # band -> no flag
        "x10_qC": env([10.0]), "x30_qC": env([90.0]),     # 9x  -> flag x30
        "x10_qD": env([10.0]), "x30_qD": env([62.0]),     # 6.2x honest tail
    }}
    flags = ab.cross_scale_flags(diag)
    check("cross-scale flags", sorted(flags), ["x10_qA", "x30_qC"])
    # large-side flag defers to the x30's own history floor when one
    # exists: an honest-honest 9x ratio (x10 in an exceptionally clean
    # window) must not condemn an x30 sitting inside its honest range
    # (the r9 lsh_auto false positive: 12.0 vs 1.3 = 9.2x with x30's
    # floor at 14.5); a stalled x30 breaches its floor and stays flagged
    check("large-side gate floor-corroborated",
          sorted(ab.cross_scale_flags(diag, {"x30_qC": 40.0})), ["x10_qA"])
    check("large-side gate stands when floor breached",
          sorted(ab.cross_scale_flags(diag, {"x30_qC": 20.0})),
          ["x10_qA", "x30_qC"])
    # ...and the small-side (physically impossible) flag never needs one
    check("small-side gate ignores floors",
          "x10_qA" in ab.cross_scale_flags(diag, {"x30_qA": 100.0}), True)

    # history_floors: median of per-file bests, sf filter, exclusion of
    # the run under adjudication, malformed file tolerated — for both
    # the task floors and the round-10 wall floors
    with tempfile.TemporaryDirectory() as d:
        def write(rid, best, sf=None, wall=None):
            doc = {"run_id": rid,
                   "host_env": {"qA": {"task_sec": [best, best * 3]}}}
            if wall is not None:
                # a failed run (-1) must not become a file's best wall
                doc["runs"] = {"qA": [wall, wall * 2, -1.0]}
            if sf:
                doc["sf"] = sf
            with open(os.path.join(d, f"run_{rid}.json"), "w") as f:
                json.dump(doc, f)
        for rid, best, wall in [(1, 3.7, 0.9), (2, 28.6, 4.1),
                                (3, 35.6, 5.2), (4, 94.0, 9.9),
                                (5, 1057.1, 60.0)]:
            write(rid, best, wall=wall)
        write(6, 1.1, sf="/sf0.01")         # other scale — filtered out
        write(9, 1.2, sf="/sf0.01")         # second stray of that scale
        write(7, 2.0)                        # the run under adjudication
        with open(os.path.join(d, "run_8.json"), "w") as f:
            f.write("{not json")
        # unstamped files default to the driver's official scale, so
        # they are admitted at that sf and excluded at any other
        floors, walls = ab.history_floors(d, exclude_run_id=7,
                                          sf=ab.LEGACY_DIAG_SF)
        check("history floor median", floors["qA"], 35.6)
        check("wall floor median (per-file best wall)", walls["qA"], 5.2)
        check("unstamped excluded at a new scale",
              ab.history_floors(d, exclude_run_id=7, sf="/sf1.0"),
              ({}, {}))
        # without the sf filter the stray files join and shift the
        # median down a slot
        floors2, _ = ab.history_floors(d, exclude_run_id=7)
        check("unfiltered median shifts", floors2["qA"], 28.6)

        # a non-numeric-suffixed file (hand-copied run_old.json) must be
        # ignored — Bench.diagFloors admits only run_<digits>.json, and
        # the adjudicator's floor must be the SAME statistic
        with open(os.path.join(d, "run_old.json"), "w") as f:
            json.dump({"run_id": 99,
                       "host_env": {"qA": {"task_sec": [9999.0]}}}, f)
        floors3, _ = ab.history_floors(d, exclude_run_id=7,
                                       sf=ab.LEGACY_DIAG_SF)
        check("non-numeric diag file ignored", floors3["qA"], 35.6)

        # a "stormed": true self-stamped file (round 11 — the bench
        # stamps runs whose own discount mirror found >= 2 discounted
        # entries) is excluded from the basis: its storm-inflated bests
        # would drift the medians upward and loosen the degradation
        # gates (mirrors Bench.diagFloors)
        with open(os.path.join(d, "run_10.json"), "w") as f:
            json.dump({"run_id": 10, "stormed": True,
                       "host_env": {"qA": {"task_sec": [9999.0]}},
                       "runs": {"qA": [999.0]}}, f)
        floors4, walls4 = ab.history_floors(d, exclude_run_id=7,
                                            sf=ab.LEGACY_DIAG_SF)
        check("stormed diag excluded from task floors",
              floors4["qA"], 35.6)
        check("stormed diag excluded from wall floors",
              walls4["qA"], 5.2)

    # the history dir must follow the DIAG file, not the contract file
    # (r9 ADVICE, high): graft.Bench self-adjudicates by passing the
    # contract via a /tmp temp file — deriving the history from the
    # contract's directory scanned a nonexistent bench_diag and
    # silently disabled every history-floor verdict
    with tempfile.TemporaryDirectory() as repo, \
            tempfile.TemporaryDirectory() as elsewhere:
        dd = os.path.join(repo, "bench_diag")
        os.makedirs(dd)
        for rid, best in [(1, 10.0), (2, 12.0), (3, 11.0)]:
            with open(os.path.join(dd, f"run_{rid}.json"), "w") as f:
                json.dump({"run_id": rid,
                           "host_env": {"q": {"task_sec": [best]}}}, f)
        # the run under adjudication: task 40s >= 3x the 11s median —
        # only visible if the floors actually loaded
        with open(os.path.join(dd, "run_4.json"), "w") as f:
            json.dump({"run_id": 4, "nominal_par_ms": 50.0,
                       "runs": {"q": [5.0]},
                       "host_env": {"q": {"task_sec": [40.0],
                                          "canary_par_ms": [52.0],
                                          "janino_compiles": [0]}}}, f)
        contract = os.path.join(elsewhere, "bench-contract-tmp.json")
        with open(contract, "w") as f:
            json.dump({"queries": {"q": 5.0}, "run_id": 4, "value": 5.0,
                       "sf": ab.LEGACY_DIAG_SF}, f)
        lines, meta = ab.adjudicate(contract,
                                    os.path.join(dd, "run_4.json"))
        check("explicit diag path keeps the floor history",
              any("history-floor" in ln for ln in lines), True)
        check("temp-file contract still condemns the floor breach",
              meta["discounted"], ["q"])

    # --md emission: a BENCH_r{N}.json input derives ADJUDICATION_r{N}.md
    # next to it, self-contained (provenance header + the report body)
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "bench_diag"))
        with open(os.path.join(d, "bench_diag", "run_5.json"), "w") as f:
            json.dump({"run_id": 5, "nominal_par_ms": 50.0,
                       "runs": {"q": [1.0, 0.9]},
                       "host_env": {"q": env([5.0, 5.1], [52.0, 55.0],
                                             [0, 0])}}, f)
        bench = os.path.join(d, "BENCH_r42.json")
        with open(bench, "w") as f:
            json.dump({"queries": {"q": 0.9}, "run_id": 5, "value": 0.9,
                       "sf": "/sf"}, f)
        ab.main([bench, "--md"])
        out = os.path.join(d, "ADJUDICATION_r42.md")
        assert os.path.exists(out), "ADJUDICATION_r42.md not written"
        with open(out) as f:
            body = f.read()
        assert "summary: clean=1" in body, body
        assert "Run id: 5" in body, body
        check("--md writes the round-named report",
              "needs environment discount: 0" in body, True)

    # ── regression over the committed round-9 artifacts (run from the
    # repo root; skipped gracefully elsewhere): the r9 storm run must
    # now condemn the two delivery-collapse entries the work witnesses
    # exonerated, and the committed clean rehearsal must stay at zero
    # discounts — the wall witness's two calibration anchors ──────────
    storm_bench = "BENCH_r09.json"
    storm_diag = "bench_diag/run_1786821204845.json"
    clean_diag = "bench_diag/run_1786816951295.json"
    if os.path.exists(storm_bench) and os.path.exists(storm_diag):
        _, meta = ab.adjudicate(storm_bench, storm_diag)
        for entry in ("x30_q65_minhash_dedup", "x10_q86_curation_pipeline"):
            check(f"r9 storm condemns {entry}",
                  entry in meta["discounted"], True)
    if os.path.exists(clean_diag):
        with open(clean_diag) as f:
            d = json.load(f)
        floors, wfloors = ab.history_floors("bench_diag", d["run_id"],
                                            d.get("sf"))
        nom = d.get("nominal_par_ms") or 0
        queries = {}
        for e, runs in d["runs"].items():
            env_e = d["host_env"].get(e, {})
            sel = ab.selected_index(runs, env_e, nom, floors.get(e),
                                    wfloors.get(e))
            queries[e] = runs[sel]
        with tempfile.TemporaryDirectory() as td:
            cpath = os.path.join(td, "contract.json")
            with open(cpath, "w") as f:
                json.dump({"queries": queries, "run_id": d["run_id"],
                           "value": -1, "sf": d.get("sf")}, f)
            _, meta = ab.adjudicate(cpath, clean_diag)
        check("r9 clean rehearsal stays at zero discounts",
              meta["discounted"], [])

    # criterion-(b) band check line (ADVICE r19): the constants are the
    # single source of truth, the line states in/out explicitly, and a
    # non-sf0.1 or headline-less contract gets not-applicable prose
    check("band check: mid-band headline is IN",
          ab.band_check_line((ab.BAND_LO + ab.BAND_HI) / 2, ab.BAND_SF),
          f"Criterion-(b) band check: headline "
          f"{(ab.BAND_LO + ab.BAND_HI) / 2:g}s is IN the "
          f"{ab.BAND_LO:g}-{ab.BAND_HI:g} s band.")
    check("band check: boundary headline is IN (inclusive)",
          "is IN" in ab.band_check_line(ab.BAND_HI, ab.BAND_SF), True)
    check("band check: fast outlier is OUT",
          "is OUT OF" in ab.band_check_line(ab.BAND_LO - 0.001, ab.BAND_SF),
          True)
    check("band check: slow outlier is OUT",
          "is OUT OF" in ab.band_check_line(ab.BAND_HI + 0.001, ab.BAND_SF),
          True)
    check("band check: other sf is not-applicable",
          "not applicable" in ab.band_check_line(20.0, "/root/testdata/sf0.01"),
          True)
    check("band check: missing headline is not evaluated",
          "not evaluated" in ab.band_check_line(None, ab.BAND_SF), True)
    # ADVICE r20: an UNSTAMPED (pre-r8) contract defaults to the
    # official scale before the comparison — same default the report
    # preamble and history_floors document — instead of reading as
    # not-applicable
    check("band check: unstamped contract defaults to official sf",
          "is IN" in ab.band_check_line(20.0, None), True)
    # ADVICE r20: the machine-readable verdict mirrors the prose
    check("band verdict: in", ab.band_verdict(20.0, ab.BAND_SF), "in")
    check("band verdict: out", ab.band_verdict(ab.BAND_LO - 1, ab.BAND_SF),
          "out")
    check("band verdict: other sf is n/a",
          ab.band_verdict(20.0, "/root/testdata/sf0.01"), "n/a")
    check("band verdict: unstamped defaults to official sf",
          ab.band_verdict(20.0, None), "in")
    check("band verdict: non-numeric is n/a", ab.band_verdict(None, ab.BAND_SF),
          "n/a")
    # the report preamble must carry the same constants it checks
    rpt = ab.md_report("BENCH_r0.json", ["body"],
                       {"run_id": 1, "diag_path": "x", "sf": ab.BAND_SF,
                        "value": 22.0, "contract": "{}", "bad": 0,
                        "discounted": []})
    check("report interpolates band constants into criterion prose",
          f"{ab.BAND_LO:g}-{ab.BAND_HI:g} s sf0.1 band" in rpt, True)
    check("report emits the explicit band line",
          "Criterion-(b) band check: headline 22s is IN" in rpt, True)

    print("\nall adjudicator self-tests passed")


if __name__ == "__main__":
    main()
