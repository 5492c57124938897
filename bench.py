"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the flagship sketch-dedup pipeline (sketch build +
LSH candidates + verify + clustering) over ``documents``, plus the
SQL-surface operators. ``docs_per_sec`` reports end-to-end dedup
throughput (the BASELINE.json metric)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def host_probe() -> float:
    """Single-process kernel throughput (docs/sec) — host-phase evidence.

    This VM's hypervisor phases drift identical code up to 4x across
    minutes; embedding the probe in every bench record lets a reader
    separate engine changes from host phases (calm baseline ~347
    docs/s for this kernel mix; <=200 means a depressed window)."""
    import numpy as np

    from cuda_selection_criteria_spark.corpus import generate_pages
    from cuda_selection_criteria_spark.sketchlib.batch import (
        hll_cards_encode_batch,
        superminhash_batch,
    )
    from cuda_selection_criteria_spark.sketchlib.hashes import shingle_hashes

    rows, _ = generate_pages(1024, 42)
    texts = [r.text for r in rows]
    t0 = time.time()
    sets = [shingle_hashes(t, 31) for t in texts]
    counts = np.array([s.size for s in sets], dtype=np.int64)
    items = np.concatenate([s for s in sets if s.size])
    didx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    hll_cards_encode_batch(items, didx, len(texts), 14)
    superminhash_batch(items, didx, len(texts), 64)
    return round(len(texts) / (time.time() - t0), 1)


def main() -> None:
    import __spark_entry__ as entrymod
    from cuda_selection_criteria_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "dup_pairs_smh",
        "dup_clusters_smh",
        "exact_dup_groups",
        "ngram_jaccard_pairs",
        "token_stats",
        "doc_fingerprints",
        "lang_id_scores",
        "embedding_knn",
        "embedding_lsh_candidates",
        "events_windowed",
    ]
    probe_before = host_probe()
    qs = entrymod.queries()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    # warm-up (UNTIMED): run every headline query once at the smallest
    # scale factor. This spawns all python workers, imports every
    # module worker-side, JITs the join/aggregate codegen, and
    # first-touches malloc arenas — the one-time costs a long-lived
    # cluster's executors never pay per query. Measured: the FIRST
    # pipeline query pays ~20s of these costs at sf0.01 while an
    # 8x-heavier variant run right after takes 2.7s; the timed loop
    # below measures steady-state walls.
    # warm-up dir: the sibling sf0.001 of SF_DIR (not a hardcoded path,
    # so the warm-up works on any host layout); override with
    # SPARK_GRAFT_WARMUP_DIR. A missing dir falls back to SF_DIR itself
    # — slower warm-up, but never a silently-cold headline.
    warm_sf = os.environ.get("SPARK_GRAFT_WARMUP_DIR") or os.path.join(
        os.path.dirname(SF_DIR.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warm_sf):
        print(
            f"# WARNING: warm-up dir {warm_sf} missing; warming at {SF_DIR}",
            file=sys.stderr,
        )
        warm_sf = SF_DIR
    warmup_errors: list[str] = []
    cold_first_query_sec = None
    for name in headline + ["dup_pairs_smh_m512"]:
        t0 = time.time()
        ok = True
        try:
            qs[name](spark, warm_sf).count()
        except Exception as e:  # warm-up must never fail the bench...
            # ...but a failed warm-up silently re-colds the first timed
            # query, so it is recorded IN the result JSON, not swallowed
            ok = False
            warmup_errors.append(f"{name}: {e}")
            print(f"# WARMUP ERROR {name}: {e}", file=sys.stderr)
        if name == headline[0] and ok:
            # the flagship's COLD wall (worker spawn + imports + codegen
            # JIT + malloc first-touch, at warm-up scale): quantifies
            # per-record what the untimed warm-up absorbs, keeping warm
            # headlines comparable across records AND to cold runs.
            # Stays None if the warm-up errored — time-to-exception is
            # not a cold wall.
            cold_first_query_sec = round(time.time() - t0, 3)
    def timed_pass() -> dict:
        timings: dict[str, float] = {}
        for name in headline:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = df.count()  # force full execution
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        total = round(sum(timings.values()), 3)
        dedup_wall = timings["dup_pairs_smh"] + timings["dup_clusters_smh"]
        # reference bench config m=512 (run_time_experiment.sh:10), timed
        # OUTSIDE the headline total so `value` stays round-comparable
        t0 = time.time()
        n512 = qs["dup_pairs_smh_m512"](spark, SF_DIR).count()
        m512_sec = round(time.time() - t0, 3)
        print(f"# dup_pairs_smh_m512: {n512} rows in {m512_sec}s", file=sys.stderr)
        return {
            "value": total,
            "queries": timings,
            "docs_per_sec_dedup": round(n_docs / dedup_wall, 1) if dedup_wall else None,
            "dedup_m512_sec": m512_sec,
        }

    first = timed_pass()
    probe_after = host_probe()
    probes = [probe_before, probe_after]
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_total_sec",
        "unit": "sec",
        "sf": float(sf),
        "cpus": int(CPUS),
        **first,
        # single-proc kernel docs/s before/after the timed loop (calm
        # ~347; <=200 = depressed hypervisor phase — see NOTES_r3.md)
        "host_probe_docs_per_sec": probes,
        # cold wall of the first warm-up flagship run (at warmup_sf):
        # the one-time costs the untimed warm-up keeps out of the
        # headline, measured per record rather than asserted
        "cold_first_query_sec": cold_first_query_sec,
        "warmup_sf_dir": warm_sf,
        "warmup_errors": warmup_errors,
    }
    if probe_after <= 200:
        # depressed hypervisor phase DURING the timed loop (r4: the
        # driver record landed at probe 103 and stood alone as a 2.7x
        # phantom regression). Re-run the timed loop ONCE and append
        # both — the first pass stays the official `value` (never
        # replaced), the rerun + its probes make the record
        # self-documenting about the phase.
        print(
            f"# post-run probe {probe_after} <= 200 (depressed phase): "
            "re-running timed loop once; recording both",
            file=sys.stderr,
        )
        rerun = timed_pass()
        rerun["host_probe_docs_per_sec"] = [probe_after, host_probe()]
        result["depressed_phase_rerun"] = rerun
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
