"""Cluster-size scaling evidence: the same dedup job at local[N] and
local[4N] on the same input (the sandbox stand-in for N vs 4N executor
clusters — per driver instruction).

Writes BENCH/BASELINE.md with throughput at both parallelism levels and
the scaling efficiency (target >= 0.8 per BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/tmp/scaling_corpus.parquet"
N_ROWS = int(os.environ.get("SCALING_ROWS", "40000"))
RUNNER = """
import json, sys, time
sys.path.insert(0, "/root/repo")
from cuda_selection_criteria_spark.session import get_spark
from cuda_selection_criteria_spark.pipeline import dedup_pipeline
from cuda_selection_criteria_spark.oracle import DedupConfig

cpus = int(sys.argv[1])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(8, cpus))
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(sys.argv[2])
n = pages.count()
# warm the Python workers (imports dominate cold-start; a long-running
# cluster pays this once) so the measurement reflects steady-state
pages.limit(64).mapInPandas(lambda it: it, schema=pages.schema).count()
t0 = time.time()
res = dedup_pipeline(pages, DedupConfig())
n_pairs = res.dup_pairs.count()
n_clusters = res.clusters.count()
wall = time.time() - t0
print(json.dumps({"cpus": cpus, "docs": n, "pairs": n_pairs,
                  "cluster_rows": n_clusters, "wall_s": round(wall, 2),
                  "docs_per_sec": round(n / wall, 1)}))
spark.stop()
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), CORPUS],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if not os.path.exists(CORPUS):
        from cuda_selection_criteria_spark.pipeline import pages_from_corpus
        from cuda_selection_criteria_spark.session import get_spark

        spark = get_spark(master="local[16]")
        spark.sparkContext.setLogLevel("ERROR")
        pages_from_corpus(spark, N_ROWS, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(CORPUS)
        spark.stop()

    r8 = run(8)
    print(json.dumps(r8))
    r32 = run(32)
    print(json.dumps(r32))
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    same = r8["pairs"] == r32["pairs"]

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling + throughput evidence

Same end-to-end dedup job (sketch -> LSH candidates -> verify ->
connected components), same input ({r8['docs']} synthetic pages,
deterministic seed 42, config tau=0.9 k=31 m=64 p=14), at two
parallelism levels on this 32-core host — the sandbox stand-in for
N vs 4N executor clusters (driver instruction; BASELINE.json
north_rule).

| parallelism | wall_s | docs/sec | dup_pairs |
|---|---|---|---|
| local[8]  | {r8['wall_s']} | {r8['docs_per_sec']} | {r8['pairs']} |
| local[32] | {r32['wall_s']} | {r32['docs_per_sec']} | {r32['pairs']} |

**Scaling efficiency = (docs/sec[32] / docs/sec[8]) / 4 = {eff:.3f}**
(target >= 0.8). Identical dup_pairs at both levels: {same}.

Python-worker warm-up (numpy/pandas imports) is excluded by a tiny
priming job, matching steady-state behavior of a long-lived cluster.

Reference baseline: the C++ repo publishes no absolute numbers
(BASELINE.md at repo root pins its config); the north-rule metrics are
dup-pair recall >= 0.99 (see tests/test_pipeline.py, measured 1.0) and
the scaling efficiency above.
""")
    print(json.dumps({"efficiency": round(eff, 3), "pairs_equal": same}))


if __name__ == "__main__":
    main()
