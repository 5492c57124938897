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
        "dup_pairs_smh_m512",
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
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()  # force full execution
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    dedup_wall = timings["dup_pairs_smh"] + timings["dup_clusters_smh"]
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "docs_per_sec_dedup": round(n_docs / dedup_wall, 1) if dedup_wall else None,
        "cpus": int(CPUS),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
