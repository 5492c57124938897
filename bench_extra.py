"""Extra benchmarks for optimization work (guide §1): per-query
noop-sink isolation, repeatable timing, and .explain("formatted")
capture. bench.py stays FROZEN; this file cites its own numbers in
OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py time   [query ...]   # noop-sink wall per query
  python bench_extra.py plan   [query ...]   # dump formatted plans
  python bench_extra.py all                  # headline set

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPEATS (default 2),
     BENCH_EXTRA_PLANDIR (default plans/r06 when plan mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
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
    "dup_pairs_smh_m512",
]


def get_session():
    from cuda_selection_criteria_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:] or HEADLINE
    qs = entrymod.queries()
    spark = get_session()

    if mode == "plan":
        plandir = os.environ.get("BENCH_EXTRA_PLANDIR", "plans/r06")
        suffix = os.environ.get("BENCH_EXTRA_PLAN_SUFFIX", "before")
        os.makedirs(plandir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(plandir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.stop()
        return

    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    # warm-up: one untimed pass at the smallest sf (same reasoning as
    # bench.py — worker spawn/imports/codegen are one-time costs)
    warm_sf = os.environ.get("SPARK_GRAFT_WARMUP_DIR") or os.path.join(
        os.path.dirname(SF_DIR.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warm_sf):
        warm_sf = SF_DIR
    for name in names:
        try:
            qs[name](spark, warm_sf).count()
        except Exception as e:
            print(f"# WARMUP ERROR {name}: {e}", file=sys.stderr)
    out: dict[str, list[float]] = {}
    for r in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            noop(qs[name](spark, SF_DIR))
            dt = round(time.time() - t0, 3)
            out.setdefault(name, []).append(dt)
            print(f"# pass{r} {name}: {dt}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    summary = {k: {"min": min(v), "samples": v} for k, v in out.items()}
    print(json.dumps({"sf_dir": SF_DIR, "cpus": int(CPUS), "queries": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
