"""Embedding similarity search over the ``embeddings`` table.

- ``embedding_knn``: brute-force cosine top-1 neighbor — the exact
  baseline, all math JVM-side (zip_with/aggregate HOFs in double
  precision), rank with deterministic tie-breaks.
- ``embedding_lsh_candidates``: random-hyperplane (SimHash) bucketing —
  the scale path: only vectors sharing a bucket are compared, the same
  explode + equi-join shape as the SuperMinHash band join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def with_norm(embeddings: DataFrame, col: str = "embedding") -> DataFrame:
    vec = F.transform(F.col(col), lambda x: x.cast("double"))
    return embeddings.withColumn("_vec", vec).withColumn(
        "_norm", F.sqrt(_dot(F.col("_vec"), F.col("_vec")))
    )


def embedding_knn(embeddings: DataFrame, round_digits: int = 4) -> DataFrame:
    """(vec_id, neighbor_id, sim) — cosine top-1 per vector.

    sim rounded so cross-engine double summation-order noise cannot
    flip the hash compare; ties broken by smallest neighbor id.
    """
    e = with_norm(embeddings).where(F.col("_norm") > 0)
    a = e.select(F.col("vec_id").alias("vec_id"), F.col("_vec").alias("va"), F.col("_norm").alias("na"))
    b = e.select(F.col("vec_id").alias("neighbor_id"), F.col("_vec").alias("vb"), F.col("_norm").alias("nb"))
    pairs = a.crossJoin(b).where(F.col("vec_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "vec_id",
        "neighbor_id",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_digits).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "neighbor_id", "sim")
    )


def embedding_lsh_candidates(
    embeddings: DataFrame,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """(id_a, id_b, table_id): candidate pairs sharing a SimHash bucket.

    Random hyperplanes are derived deterministically from ``seed`` and
    broadcast as literals inside the plan (tiny: n_tables*n_planes*dim
    doubles). Bucket key = sign-bit pack — the embedding analogue of
    the SMH band join, same skew/scale properties.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    e = with_norm(embeddings).select("vec_id", "_vec")
    buckets = None
    for t in range(n_tables):
        key = F.lit(0).cast("long")
        for pl in range(n_planes):
            arr = F.array(*[F.lit(float(v)) for v in planes[t, pl]])
            bit = (_dot(F.col("_vec"), arr) > 0).cast("long")
            key = key * 2 + bit
        tb = e.select("vec_id", F.lit(t).alias("table_id"), key.alias("bucket"))
        buckets = tb if buckets is None else buckets.unionByName(tb)
    a = buckets.select("table_id", "bucket", F.col("vec_id").alias("id_a"))
    b = buckets.select("table_id", "bucket", F.col("vec_id").alias("id_b"))
    return (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "table_id")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("table_id", F.lit(0))  # canonical: first table wins after dedup
        .drop("table_id")
        .select("id_a", "id_b")
    )
