#!/usr/bin/env python3
"""Adjudicate a bench record from its own diag evidence.

Reads a BENCH_r{N}.json (or any bench contract line / JSON file with
"queries" and "run_id") plus the matching bench_diag/run_<id>.json and
classifies every entry:

  clean              min run measured under healthy delivery, no
                     recompilation churn
  warmup-absorbed    non-min runs carried JIT/Janino warmup or a
                     degraded-delivery episode; the min run is clean —
                     the recorded number stands
  degraded           EVERY run shows the stall signature (task_sec
                     inflated vs the entry's best, or parallel canary
                     >= 2x nominal) — the recorded number is an
                     environment artifact, not a plan property
  cache-thrash       repeat runs kept recompiling generated classes
                     (janino_compiles > 0 past run 1) — codegen cache
                     too small for the working set

Usage: python3 scripts/adjudicate_bench.py <BENCH_rN.json> [diag.json]
If the diag path is omitted, bench_diag/run_<run_id>.json is used.
"""
import json
import os
import sys


def load_contract(path):
    with open(path) as f:
        doc = json.load(f)
    # driver records sometimes wrap the line under "parsed"
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc


def classify(entry, runs, env, nominal_par):
    task = env.get("task_sec") or []
    pars = env.get("canary_par_ms") or []
    jan = env.get("janino_compiles") or []
    n = len(runs)
    notes = []
    # cache-thrash: SUBSTANTIAL recompilation persisting past the first
    # run (a couple of fragments past run 1 is path-literal churn, e.g.
    # a sink writing to a fresh temp dir each run — not thrash)
    if any(j > 5 for j in jan[1:]):
        notes.append(f"cache-thrash({jan})")
    # per-run health. task_sec spans the run body (same tasks +
    # inflated task_sec = slow cores), so where it is usable — the best
    # run did >=1s of task work, below which the 0.1s-rounded rows
    # alias to ratios — it is the authoritative signal: degraded means
    # task_sec >=2x the entry's best. The post-run parallel canary is
    # a point sample (an episode can start after the body finishes and
    # still stamp a high reading on a clean run), so it only decides
    # when no usable task row exists.
    best_task = min((t for t in task if t > 0), default=None)
    if best_task is not None and best_task < 1.0:
        best_task = None
    degraded = []
    for i in range(n):
        if best_task and i < len(task):
            degraded.append(task[i] >= 2 * best_task)
        elif nominal_par and i < len(pars):
            degraded.append(pars[i] >= 2 * nominal_par)
        else:
            degraded.append(False)
    min_i = min(range(n), key=lambda i: runs[i] if runs[i] >= 0 else 1e18)
    if all(degraded) and n > 0:
        return "degraded", notes
    if degraded[min_i]:
        return "min-run-degraded", notes
    if any(degraded) or (jan and jan[0] > 0):
        return "warmup-absorbed", notes
    return "clean", notes


def main(bench_path, diag_path=None):
    contract = load_contract(bench_path)
    run_id = contract.get("run_id")
    if diag_path is None:
        diag_path = os.path.join(
            os.path.dirname(os.path.abspath(bench_path)),
            "bench_diag", f"run_{run_id}.json")
    try:
        with open(diag_path) as f:
            diag = json.load(f)
    except FileNotFoundError:
        print(f"no diag evidence at {diag_path} — records from before the "
              "round-7 witness panel (no run_id) cannot be adjudicated")
        sys.exit(1)
    if run_id and diag.get("run_id") not in (None, run_id):
        print(f"WARNING: contract run_id {run_id} != diag run_id "
              f"{diag.get('run_id')} — evidence may describe another run")
    nominal = diag.get("nominal_par_ms") or 0
    counts = {}
    for name, sec in contract.get("queries", {}).items():
        runs = diag.get("runs", {}).get(name)
        env = diag.get("host_env", {}).get(name)
        if name in ("q93a_mv_maintain", "q93b_mv_read"):
            # derived split of the q93 entry's best run — its evidence
            # rows live under q93_incremental_mv
            verdict, notes = "component-of-q93", []
        elif not runs or not env:
            verdict, notes = "no-evidence", []
        else:
            verdict, notes = classify(name, runs, env, nominal)
        counts[verdict] = counts.get(verdict, 0) + 1
        flag = ("" if verdict in ("clean", "warmup-absorbed",
                                  "component-of-q93") else "  <<<")
        extra = (" " + " ".join(notes)) if notes else ""
        print(f"{name:35s} {sec:8.3f}s  {verdict}{extra}{flag}")
    print()
    print("summary:", ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    bad = counts.get("degraded", 0) + counts.get("min-run-degraded", 0)
    print(f"entries whose recorded number needs environment discount: {bad}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
