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

    # min-run-degraded: the min run is the task-inflated one
    v, _ = ab.classify("q", [2.0, 1.5],
                       env([5.0, 12.0], [52.0, 55.0], [0, 0]), nominal, None)
    check("min-run-degraded", v, "min-run-degraded")

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
    # canary on the recorded min must not be masked by the usable
    # sibling's task branch
    v, _ = ab.classify("q", [1.2, 5.0],
                       env([0.8, 2.5], [400.0, 52.0], [0, 0]), nominal, None)
    check("sub-1s min run judged by its canary", v, "min-run-degraded")

    # floor breach forces the verdict into the discount total even when
    # the min-time run carries only a sub-1s aliased task row judged by
    # a clean canary — a history-floor note must never sit beside a
    # non-discounted verdict (round-8 ADVICE item)
    v, notes = ab.classify("q", [1.2, 5.0],
                           env([0.9, 120.0], [52.0, 55.0], [0, 0]),
                           nominal, 36.7)
    check("floor breach forces min-run-degraded", v, "min-run-degraded")
    assert any("history-floor" in n for n in notes), notes

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
    # the run under adjudication, malformed file tolerated
    with tempfile.TemporaryDirectory() as d:
        def write(rid, best, sf=None):
            doc = {"run_id": rid,
                   "host_env": {"qA": {"task_sec": [best, best * 3]}}}
            if sf:
                doc["sf"] = sf
            with open(os.path.join(d, f"run_{rid}.json"), "w") as f:
                json.dump(doc, f)
        for rid, best in [(1, 3.7), (2, 28.6), (3, 35.6), (4, 94.0),
                          (5, 1057.1)]:
            write(rid, best)
        write(6, 1.1, sf="/sf0.01")         # other scale — filtered out
        write(9, 1.2, sf="/sf0.01")         # second stray of that scale
        write(7, 2.0)                        # the run under adjudication
        with open(os.path.join(d, "run_8.json"), "w") as f:
            f.write("{not json")
        # unstamped files default to the driver's official scale, so
        # they are admitted at that sf and excluded at any other
        floors = ab.history_floors(d, exclude_run_id=7,
                                   sf=ab.LEGACY_DIAG_SF)
        check("history floor median", floors["qA"], 35.6)
        check("unstamped excluded at a new scale",
              ab.history_floors(d, exclude_run_id=7, sf="/sf1.0"), {})
        # without the sf filter the stray files join and shift the
        # median down a slot
        floors2 = ab.history_floors(d, exclude_run_id=7)
        check("unfiltered median shifts", floors2["qA"], 28.6)

        # a non-numeric-suffixed file (hand-copied run_old.json) must be
        # ignored — Bench.taskFloors admits only run_<digits>.json, and
        # the adjudicator's floor must be the SAME statistic
        with open(os.path.join(d, "run_old.json"), "w") as f:
            json.dump({"run_id": 99,
                       "host_env": {"qA": {"task_sec": [9999.0]}}}, f)
        floors3 = ab.history_floors(d, exclude_run_id=7,
                                    sf=ab.LEGACY_DIAG_SF)
        check("non-numeric diag file ignored", floors3["qA"], 35.6)

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

    print("\nall adjudicator self-tests passed")


if __name__ == "__main__":
    main()
