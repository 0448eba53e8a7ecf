#!/usr/bin/env python3
"""Adjudicate a bench record from its own diag evidence.

Reads a BENCH_r{N}.json (or any bench contract line / JSON file with
"queries" and "run_id") plus the matching bench_diag/run_<id>.json and
classifies every entry:

  clean              the recorded run measured under healthy delivery,
                     no recompilation churn
  warmup-absorbed    other runs carried JIT/Janino warmup or a
                     degraded-delivery episode; the run that owns the
                     recorded number is clean — the number stands
  min-run-degraded   the run that OWNS the recorded number (located by
                     value match against the contract, falling back to
                     the selection rule) shows the stall signature, or
                     an external reference — the entry's history task
                     floor or history WALL floor — condemns the entry
                     no matter which run owned the min (counted in the
                     "needs environment discount" total)
  degraded           EVERY run shows the stall signature (task_sec
                     inflated vs the entry's best run, vs the entry's
                     HISTORICAL floor across bench_diag/, or vs its
                     sibling scale probe; parallel canary >= 2x
                     nominal; or wall >= 1.5x the entry's history wall
                     floor — the round-10 delivery-collapse witness) —
                     the recorded number is an environment artifact,
                     not a plan property
  suspect-uniform    the recorded min run is not condemned by any
                     per-run ratio, but EVERY post-run parallel canary
                     sat >= 2x the run-wide nominal — a uniformly
                     stretched entry that per-entry ratios cannot see
                     (run-1 janino warmup does not suppress this);
                     treat the number as unconfirmed

Annotations (appended beside a verdict, never a verdict themselves):
  cache-thrash(...)  repeat runs kept recompiling generated classes
                     (janino_compiles > 5 past run 1) — codegen cache
                     too small for the working set
  history-floor(...) / cross-scale(...)  which external reference
                     condemned a degraded entry

External references (the round-8 additions — the r7 artifact shipped
x10_q122 at 50 s / 1298 task-sec as "clean" because every intra-entry
ratio was ~1x; both of these catch it):

  * history floor: per entry, the MEDIAN across all OTHER
    bench_diag/run_*.json files of that file's best usable (>= 1 s)
    task_sec row. Median, not min — the history holds stall-inflated
    runs and mid-round experiment builds of since-reverted variants.
    An entry whose best task_sec >= 3x its floor is degraded.
  * history WALL floor (round 10): per entry, the median across all
    OTHER diag files of that file's best non-negative wall in `runs`.
    A recorded wall >= 1.5x it is a delivery-collapse stall — honest
    work delivered over a fraction of the cores, which every work
    witness (task_sec, canary, janino) exonerates (the r9 x30_q65
    blind spot: 12.48s wall, healthy 10.6 task-sec, 6.06s honest).
  * cross-scale: the x10_/x30_ probes run the SAME query over corpora
    where x30 is ~3x the x10 data, so x10's best task_sec exceeding
    x30's is physically impossible for a healthy run (flags the x10
    entry); x30 exceeding 8x the x10 best flags the x30 entry when the
    x30 also breaches its own history floor — or unconditionally when
    no floor exists (see cross_scale_flags for the calibration
    history, including the honest 9.2x lsh_auto ratio that makes the
    floor corroboration necessary).

Usage: python3 scripts/adjudicate_bench.py <BENCH_rN.json> [diag.json]
                                           [--md | --out FILE.md] [--json]
If the diag path is omitted, bench_diag/run_<run_id>.json next to the
bench file is used; the history scan always covers the DIAG file's own
directory minus the run under adjudication (so a temp-file contract —
graft.Bench's self-adjudication — still gets the full floor history).
--json prints one machine-readable verdict line instead of the report. --md additionally writes the report as
ADJUDICATION_r{N}.md next to a BENCH_r{N}.json input (round number
taken from the file name); --out names the markdown path explicitly
(what graft.Bench uses to self-adjudicate at run end, when no BENCH
file exists yet to derive a name from).
"""
import glob
import json
import os
import re
import signal
import sys

# default SIGPIPE so `... | head` truncates quietly instead of
# stack-tracing (not available on Windows; harmless to skip)
try:
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
except (AttributeError, ValueError):
    pass

USABLE_TASK_SEC = 1.0   # below this the 0.1s-rounded rows alias
HISTORY_RATIO = 3.0     # best task_sec >= 3x historical floor => degraded
MIN_HISTORY_FILES = 3   # fewer files than this -> no floor for the entry
LEGACY_DIAG_SF = "/root/testdata/sf0.1"  # scale of pre-r8 unstamped files
# the round-10 delivery-collapse (wall) witness, shared constants with
# BenchReport.{WallRatio,MinWallFloor}: a recorded wall >= 1.5x the
# entry's history wall floor is a stall the work witnesses cannot see
# (the r9 x30_q65 blind spot: 12.48s wall / healthy task_sec beside a
# 6.06s honest wall). 1.5x calibrated over the 45-file sf0.1 history:
# it condemns exactly the storm run run_1786821204845's stalled entries
# (x30_q65 1.84x, x10_q86 1.57x - so the gate must sit <= 1.57) and
# flags nothing in the clean rehearsal run_1786816951295. Floors under
# 0.2s are scheduler-jitter noise and read as absent.
WALL_RATIO = 1.5
MIN_WALL_FLOOR = 0.2
# Criterion-(b) acceptance band for the official sf0.1 headline total
# (settled r19: 18-25 s widened to 18-26 s so the band contains its own
# cited envelope — ~25.6 s clean-cluster median, 25.7 s observed top).
# These constants are the single source of truth: md_report interpolates
# them into the criterion prose AND emits an explicit in-band /
# out-of-band line for the headline, so the documented and checked
# values cannot drift (ADVICE r19).
BAND_LO, BAND_HI = 18.0, 26.0
BAND_SF = "/root/testdata/sf0.1"  # the band is calibrated at this scale


def band_verdict(value, sf):
    """Machine-readable band status: "in" / "out" / "n/a". An
    unstamped contract (sf absent/None) gets the same LEGACY_DIAG_SF
    default the report preamble and history_floors document for
    pre-r8 records (ADVICE r20) — an official-scale contract must
    never read as not-applicable just because the stamp predates r8."""
    if not isinstance(value, (int, float)):
        return "n/a"
    if (sf or LEGACY_DIAG_SF) != BAND_SF:
        return "n/a"
    return "in" if BAND_LO <= value <= BAND_HI else "out"


def band_check_line(value, sf):
    """One explicit criterion-(b) line for the report: compares the
    contract's headline total against [BAND_LO, BAND_HI]. The band is
    an sf0.1 calibration, so a run at any other scale gets a
    not-applicable line instead of a misleading comparison; unstamped
    contracts default to the official scale (see band_verdict)."""
    v = band_verdict(value, sf)
    if v == "n/a":
        if not isinstance(value, (int, float)):
            return ("Criterion-(b) band check: no numeric headline in the "
                    "contract — band not evaluated.")
        return (f"Criterion-(b) band check: not applicable — band is "
                f"calibrated for {BAND_SF}, this run's sf is {sf}.")
    verdict = "IN" if v == "in" else "OUT OF"
    return (f"Criterion-(b) band check: headline {value:g}s is {verdict} "
            f"the {BAND_LO:g}-{BAND_HI:g} s band.")


def load_contract(path):
    with open(path) as f:
        doc = json.load(f)
    # driver records sometimes wrap the line under "parsed"
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc


def best_usable_task(env):
    tasks = [t for t in (env.get("task_sec") or []) if t >= USABLE_TASK_SEC]
    return min(tasks) if tasks else None


def history_floors(diag_dir, exclude_run_id, sf=None):
    """Per-entry (task_floors, wall_floors) across every diag file
    except the run under adjudication — each the median of per-file
    bests. Mirrors Bench.diagFloors (same statistic, same thresholds)
    so the harness retries on exactly what this script would flag:
    task floors from each file's best usable (>= 1s) task_sec row;
    wall floors (round 10) from each file's best non-negative wall in
    the `runs` arrays (walls are ms-precise, so no usable cutoff — the
    quality gate MIN_WALL_FLOOR applies at the consumer). Files
    stamped with a different sf are excluded (a local sf0.01 run must
    not poison the sf0.1 floors); pre-round-8 files carry no stamp and
    default to the driver's official scale — floors from another scale
    are systematically wrong, not a stray the median can absorb.
    Files self-stamped "stormed": true (round 11 — the bench stamps a
    run whose own adjudication mirror found >= 2 discounted entries)
    are excluded too: their per-entry bests were measured inside a
    degraded-delivery window, and admitting them drifts the medians
    upward, silently loosening the 3x history-floor and 1.5x
    wall-floor gates for every future run (r10 ADVICE)."""
    per_task, per_wall = {}, {}
    for p in sorted(glob.glob(os.path.join(diag_dir, "run_*.json"))):
        # admit exactly what Bench.diagFloors admits (run_<digits>.json):
        # the glob alone would also pick up a hand-copied run_old.json,
        # breaking the documented "same statistic" mirror between the
        # harness's retry floor and this adjudication floor
        if not re.fullmatch(r"run_\d+\.json", os.path.basename(p)):
            continue
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if d.get("run_id") == exclude_run_id:
            continue
        if sf and (d.get("sf") or LEGACY_DIAG_SF) != sf:
            continue
        if d.get("stormed"):
            continue
        for entry, env in (d.get("host_env") or {}).items():
            t = best_usable_task(env)
            if t is not None:
                per_task.setdefault(entry, []).append(t)
        for entry, runs in (d.get("runs") or {}).items():
            ok = [r for r in runs if isinstance(r, (int, float)) and r >= 0]
            if ok:
                per_wall.setdefault(entry, []).append(min(ok))

    def medians(per_entry):
        floors = {}
        for entry, ts in per_entry.items():
            if len(ts) >= MIN_HISTORY_FILES:
                s = sorted(ts)
                floors[entry] = s[len(s) // 2]
        return floors
    return medians(per_task), medians(per_wall)


def degraded_flags(runs, env, nominal_par, floor, wall_floor=None):
    """Per-run degraded flags — the mirror of
    BenchReport.degradedRuns. task_sec spans the run body (same tasks +
    inflated task_sec = slow cores), so where it is usable — the best
    run did >=1s of task work, below which the 0.1s-rounded rows
    alias to ratios — it is the authoritative WORK signal: degraded
    means task_sec >=2x the entry's best, OR >= HISTORY_RATIO x the
    entry's historical floor (the cross-run reference that catches an
    entry whose EVERY run this time was uniformly stretched — intra-
    entry ratios then all read ~1x, the r7 x10_q122 blind spot). The
    post-run parallel canary is a point sample (an episode can start
    after the body finishes and still stamp a high reading on a clean
    run), so it only decides when no usable task row exists.
    Independently (round 10), a run whose WALL sits >= WALL_RATIO x
    the entry's history wall floor is degraded — the delivery-collapse
    witness that sees precisely the stalls the task row exonerates."""
    task = env.get("task_sec") or []
    pars = env.get("canary_par_ms") or []
    best_task = best_usable_task(env)
    wf = wall_floor if wall_floor and wall_floor >= MIN_WALL_FLOOR else None
    flags = []
    for i in range(len(runs)):
        if best_task and i < len(task) and task[i] >= USABLE_TASK_SEC:
            d = task[i] >= 2 * best_task
            if floor and task[i] >= HISTORY_RATIO * floor:
                d = True
        elif nominal_par and i < len(pars):
            # no usable task row FOR THIS RUN (sub-1s rows alias under
            # the 0.1s rounding, even when a sibling run has a usable
            # row) — the point-sampled canary decides
            d = pars[i] >= 2 * nominal_par
        else:
            d = False
        if wf and runs[i] >= 0 and runs[i] >= WALL_RATIO * wf:
            d = True
        flags.append(d)
    return flags


def selected_index(runs, env, nominal_par, floor, wall_floor=None,
                   sec=None):
    """The index of the run that OWNS the recorded number. Located by
    value match against the contract's recorded seconds (both sides
    render at 3 decimals) — robust even against artifacts recorded by
    an older selection rule — falling back to the selection rule
    itself, the mirror of BenchReport.selectedIndex: a failed run
    poisons the entry to its max; otherwise the min over runs neither
    degraded nor janino-warmup-contaminated (> 5 compiles), falling
    back to the min over all when every run is condemned."""
    if sec is not None:
        for i, r in enumerate(runs):
            if abs(r - sec) < 5e-4:
                return i
    if any(r < 0 for r in runs):
        return max(range(len(runs)), key=lambda i: runs[i])
    jan = env.get("janino_compiles") or []
    deg = degraded_flags(runs, env, nominal_par, floor, wall_floor)
    clean = [i for i in range(len(runs))
             if not deg[i] and not (i < len(jan) and jan[i] > 5)]
    pool = clean if clean else range(len(runs))
    return min(pool, key=lambda i: runs[i])


def classify(entry, runs, env, nominal_par, floor, wall_floor=None,
             sec=None):
    pars = env.get("canary_par_ms") or []
    jan = env.get("janino_compiles") or []
    n = len(runs)
    notes = []
    # cache-thrash annotation: SUBSTANTIAL recompilation persisting past
    # the first run (a couple of fragments past run 1 is path-literal
    # churn, e.g. a sink writing to a fresh temp dir each run)
    if any(j > 5 for j in jan[1:]):
        notes.append(f"cache-thrash({jan})")
    best_task = best_usable_task(env)
    degraded = degraded_flags(runs, env, nominal_par, floor, wall_floor)
    floor_breach = bool(floor and best_task
                        and best_task >= HISTORY_RATIO * floor)
    if floor_breach:
        notes.append(f"history-floor(best task {best_task}s >= "
                     f"{HISTORY_RATIO:g}x median {floor}s)")
    # the judged run is the one that OWNS the recorded number (round
    # 10, mirroring BenchReport.needsDiscount): min-selection steers
    # away from degraded runs, so condemning the raw argmin would
    # condemn numbers the selection rule already avoided
    sel = selected_index(runs, env, nominal_par, floor, wall_floor, sec)
    wall_breach = bool(wall_floor and wall_floor >= MIN_WALL_FLOOR
                       and runs[sel] >= 0
                       and runs[sel] >= WALL_RATIO * wall_floor)
    if wall_breach:
        notes.append(f"wall-floor(recorded {runs[sel]}s >= "
                     f"{WALL_RATIO:g}x median best wall {wall_floor}s)")
    if all(degraded) and n > 0:
        return "degraded", notes
    if degraded[sel]:
        return "min-run-degraded", notes
    # a floor-condemning note beside a non-discounted verdict would
    # contradict itself (the recorded run can carry a sub-1s aliased
    # task row judged by a clean canary while the entry's BEST usable
    # run still did 3x its historical work) — when an external
    # reference condemns the entry (work floor or wall floor), the
    # verdict must count it in the environment-discount total no
    # matter which run owned the recorded number
    if floor_breach or wall_breach:
        return "min-run-degraded", notes
    verdict = ("warmup-absorbed" if any(degraded) or (jan and jan[0] > 0)
               else "clean")
    # suspect-uniform: per-run ratios all ~1x, but every post-run
    # parallel canary sat >= 2x the run-wide nominal (a GLOBAL
    # reference) — a uniformly stretched entry the per-entry ratios
    # cannot see. Checked for warmup-absorbed too: run-1 janino warmup
    # is present on most entries and is independent of the canary
    # witness, so it must not suppress the uniform-stretch check.
    if verdict in ("clean", "warmup-absorbed") \
            and nominal_par and pars and len(pars) >= n \
            and all(p >= 2 * nominal_par for p in pars[:n]):
        return "suspect-uniform", notes
    return verdict, notes


def cross_scale_flags(diag, floors=None):
    """x10 vs x30 task_sec sanity for the shared probe queries: x30 runs
    ~3x the x10 data, so x10's best task clearly exceeding x30's is
    impossible for a healthy x10 run; x30 exceeding 8x the x10 best is
    an inflated x30. Both bands are calibrated from the committed diag
    history: the q65 family's honest clean-window ratios span 2.0-6.2x
    (super-linear banding constants on 3x data) while its stall-window
    ratios read 10x/14x/73x, so the large-side gate sits at 8x —
    between the honest tail and the stall floor; the 1.25x band on the
    small side keeps noise-level near-equality out.

    The large-side flag additionally requires the x30 entry to breach
    its OWN history floor (HISTORY_RATIO x) when a floor exists: the
    r9 run_1786805199594 evidence shows the lsh_auto probe's honest-
    honest ratio reaching 9.2x (x10 best 1.3s in an exceptionally
    clean revisit window vs x30's 12.0s — both better than their
    committed r8 values) while a stalled-x30-beside-stalled-x10 window
    reads 10.8x, so the ratio ALONE cannot separate the two; the floor
    can (honest x30 reads 8-22s against a 14.5s floor, stalled reads
    60-140s >= 3x it). With no floor (fresh repo, <3 history files)
    the raw 8x gate stands. The small-side flag needs no floor — an
    x10 outworking its 3x-data sibling is impossible regardless of
    history. Returns {entry: note}."""
    env = diag.get("host_env", {})
    floors = floors or {}
    flags = {}
    for name in env:
        if not name.startswith("x10_"):
            continue
        sib = "x30_" + name[len("x10_"):]
        if sib not in env:
            continue
        t10 = best_usable_task(env[name])
        t30 = best_usable_task(env[sib])
        if t10 is None or t30 is None:
            continue
        sib_floor = floors.get(sib)
        if t10 > 1.25 * t30:
            flags[name] = (f"cross-scale(best task {t10}s > sibling x30's "
                           f"{t30}s on 3x the data)")
        elif t30 > 8 * t10 and (not sib_floor
                                or t30 >= HISTORY_RATIO * sib_floor):
            flags[sib] = (f"cross-scale(best task {t30}s > 8x sibling "
                          f"x10's {t10}s on 3x the data)")
    return flags


def adjudicate(bench_path, diag_path=None):
    """Classify every entry of one bench record. Returns
    (report_lines, meta) — the plain-text report plus the fields a
    caller needs to frame it (run id, diag path, discount total)."""
    lines = []
    contract = load_contract(bench_path)
    run_id = contract.get("run_id")
    if diag_path is None:
        diag_path = os.path.join(os.path.dirname(os.path.abspath(bench_path)),
                                 "bench_diag", f"run_{run_id}.json")
    # the history dir is wherever the DIAG evidence lives, not wherever
    # the contract file happens to sit (r9 ADVICE, high): graft.Bench's
    # self-adjudication passes the contract via a /tmp temp file, and
    # deriving the history from ITS directory silently scanned the
    # nonexistent /tmp/bench_diag — every history-floor verdict in the
    # self-emitted ADJUDICATION was disabled
    diag_dir = os.path.dirname(os.path.abspath(diag_path))
    try:
        with open(diag_path) as f:
            diag = json.load(f)
    except FileNotFoundError:
        print(f"no diag evidence at {diag_path} — records from before the "
              "round-7 witness panel (no run_id) cannot be adjudicated")
        sys.exit(1)
    if run_id and diag.get("run_id") not in (None, run_id):
        lines.append(f"WARNING: contract run_id {run_id} != diag run_id "
                     f"{diag.get('run_id')} — evidence may describe "
                     "another run")
    nominal = diag.get("nominal_par_ms") or 0
    floors, wall_floors = history_floors(diag_dir, diag.get("run_id"),
                                         contract.get("sf"))
    xscale = cross_scale_flags(diag, floors)
    counts = {}
    discounted = []
    for name, sec in contract.get("queries", {}).items():
        runs = diag.get("runs", {}).get(name)
        env = diag.get("host_env", {}).get(name)
        if name in ("q93a_mv_maintain", "q93b_mv_read"):
            # derived split of the q93 entry's recorded run — its
            # evidence rows live under q93_incremental_mv
            verdict, notes = "component-of-q93", []
        elif not runs or not env:
            verdict, notes = "no-evidence", []
        else:
            verdict, notes = classify(name, runs, env, nominal,
                                      floors.get(name),
                                      wall_floors.get(name), sec)
            if name in xscale:
                # a physically impossible work ratio vs the sibling
                # scale condemns the whole entry no matter what the
                # intra-entry ratios said
                verdict = "degraded"
                notes.append(xscale[name])
        counts[verdict] = counts.get(verdict, 0) + 1
        if verdict in ("degraded", "min-run-degraded", "suspect-uniform"):
            discounted.append(name)
        flag = ("" if verdict in ("clean", "warmup-absorbed",
                                  "component-of-q93") else "  <<<")
        extra = (" " + " ".join(notes)) if notes else ""
        lines.append(f"{name:35s} {sec:8.3f}s  {verdict}{extra}{flag}")
    lines.append("")
    lines.append("summary: " +
                 ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    bad = len(discounted)
    lines.append("entries whose recorded number needs environment "
                 f"discount: {bad}")
    return lines, {"run_id": run_id, "diag_path": diag_path, "bad": bad,
                   "discounted": discounted,
                   "sf": contract.get("sf"), "value": contract.get("value"),
                   "contract": json.dumps(contract, separators=(",", ":"))}


def md_report(bench_path, lines, meta):
    """The report framed as a self-contained markdown document — same
    body a terminal run prints, plus the provenance a judge needs to
    re-run it: which run, which diag file, and the full contract line
    (so the document can be re-adjudicated even before the driver
    writes the round's BENCH_r{N}.json). A graft.Bench self-emission
    passes the contract via a temp file, so the title keys on the
    run id, not the throwaway file name."""
    name = os.path.basename(bench_path)
    title = (f"bench run {meta['run_id']} (self-emitted at run end)"
             if name.startswith("bench-contract") else name)
    return "\n".join([
        f"# ADJUDICATION of {title}",
        "",
        "Generated by: python3 scripts/adjudicate_bench.py",
        f"Run id: {meta['run_id']}  (evidence: {meta['diag_path']}; "
        f"sf: {meta['sf']}; headline total: {meta['value']}s)",
        "History basis: bench_diag/run_<digits>.json minus the run under",
        "adjudication, sf-filtered (unstamped pre-r8 files default to the",
        "official sf0.1).",
        "",
        "Acceptance criterion (revised r18, per VERDICT r17 item 3): an",
        "official run is acceptable EITHER (a) with `stormed: false` and",
        "`discounted_n: 0` — a storm-free window that outlasted the whole",
        "roster — OR (b) with the roster-start gate passed, every",
        "deviation adjudicated below, and the headline inside the",
        f"{BAND_LO:g}-{BAND_HI:g} s sf0.1 band (widened from 18-25 s per "
        "ADVICE r18 so it",
        "contains the cited clean envelope: ~25.6 s clean-cluster",
        "median, 25.7 s top of the observed official spread; the band is",
        "defined once as BAND_LO/BAND_HI in this script and checked",
        "explicitly below).",
        "",
        band_check_line(meta.get("value"), meta.get("sf")),
        "The prior r16 criterion (unconditional",
        "stormed:false + zero discounts) was unachievable by",
        "construction: credit-throttle storms trail ~8 min of sustained",
        "burn while the roster burns ~29 min, so a clean START cannot",
        "buy a clean 29-minute WINDOW. This paragraph is the criterion",
        "record only — no verdict class, floor, or ratio changed.",
        "",
        "Contract line under adjudication:",
        "",
        "```json",
        meta["contract"],
        "```",
        "",
        "```",
        *lines,
        "```",
        "",
    ])


def main(argv):
    out_path, md, as_json, pos = None, False, False, []
    it = iter(argv)
    for a in it:
        if a == "--out":
            out_path = next(it, None)
            if out_path is None:
                print("--out needs a file path")
                sys.exit(2)
        elif a == "--md":
            md = True
        elif a == "--json":
            as_json = True
        else:
            pos.append(a)
    if not pos:
        print(__doc__)
        sys.exit(2)
    bench_path = pos[0]
    diag_path = pos[1] if len(pos) > 1 else None
    if md and out_path is None:
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(bench_path))
        if not m:
            print("--md needs a BENCH_r{N}.json input to derive the round "
                  "number; use --out FILE.md for other inputs")
            sys.exit(2)
        out_path = os.path.join(os.path.dirname(bench_path),
                                f"ADJUDICATION_r{m.group(1)}.md")
    lines, meta = adjudicate(bench_path, diag_path)
    if as_json:
        # machine-readable verdict line for the Scala parity spec
        # (AdjudicationParitySpec asserts this set equals
        # BenchReport.discountedEntries over the same artifacts).
        # "band" (ADVICE r20): the criterion-(b) status the markdown
        # report states in prose, machine-visible for automated
        # consumers — "in" / "out" / "n/a".
        print(json.dumps({"run_id": meta["run_id"], "bad": meta["bad"],
                          "discounted": meta["discounted"],
                          "band": band_verdict(meta.get("value"),
                                               meta.get("sf"))},
                         separators=(",", ":")))
    else:
        print("\n".join(lines))
    if out_path:
        with open(out_path, "w") as f:
            f.write(md_report(bench_path, lines, meta))
        if not as_json:
            print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
