"""Scale-adaptive input spreading for per-row-heavy map stages.

At bench scale the ``documents`` / ``embeddings`` tables arrive as ONE
parquet split (a few MB under the 128 MB split size), so every
explode / hash / regex / matmul map stage downstream runs in a single
task on one core — the whole cluster idles while one task does the
work. A 100 TB table arrives in thousands of splits and never hits
this.

``spread(df)`` repartitions an input to the cluster's default
parallelism ONLY when its planned partition count is lower — the
adaptive form the optimization guide asks for (§2: derive partitioning
from input, don't tune a constant): big inputs are untouched (no extra
exchange at scale), small inputs pay one tiny exchange (the bench
tables are ~5-15 MB) to buy a parallelism-wide map stage. Same
discipline ``operators/sketch.py`` has always applied to the sketch
pass, factored out for every other operator.

Results are partitioning-independent by construction everywhere this
is applied (groupBy/join keys, per-row projections, pure-function
sampling), so plans change but row sets do not — the oracle hash
checks pin that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to cluster parallelism if it is planned
    narrower; no-op for streaming inputs and already-wide inputs."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if min_partitions is None:
        min_partitions = sc.defaultParallelism
    # planned partitions, not file count: Spark packs small files into
    # fewer splits and splits large files into more (plan-time only —
    # the .rdd conversion is never executed)
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
