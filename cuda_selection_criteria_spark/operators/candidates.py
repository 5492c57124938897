"""Candidate generation: LSH band explode + self-equi-join + CB prune.

Replaces the reference's O(N^2) pair enumeration
(/root/reference/src/selection.cpp:270-291, selection_cuda.cpp:146-150)
with the Spark-native equivalent: a pair survives iff

  - both cardinalities > 0 (selection.cpp:281 skip),
  - CB: min(card)/max(card) >= tau (criteria_sketch.hpp:45-49 — the
    sorted+break loop is just an early-exit evaluation of this same
    symmetric predicate, so no global sort is needed),
  - smh_a: SOME band of r consecutive signature values is equal
    (criteria_sketch.hpp:66-81) == equi-join on the raw band slice.

Joining on the raw band slice (array<long>) makes hash collisions
impossible by construction — band equality IS the join condition.
An xxhash64 of the slice is used only as an optional narrow pre-key.

Scale notes (north_rule):
- band rows are (band_id, band slice, url_id, card_i) — no urls, no
  16KiB register blobs through this shuffle;
- AQE skew-join splitting handles hot band keys (template pages);
  ``max_band_bucket`` optionally caps pathological buckets (off by
  default: parity keeps every colliding pair);
- the CB filter runs pre-dedup, cutting the dropDuplicates shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle import DedupConfig


def explode_bands(sketches: DataFrame, cfg: DedupConfig) -> DataFrame:
    """sketches -> (url_id, card_i, band_id, band) rows, n_bands per doc."""
    n_bands, n_rows = cfg.bands
    slices = F.array(
        *[F.slice(F.col("smh"), b * n_rows + 1, n_rows) for b in range(n_bands)]
    )
    return (
        sketches.where(F.col("card_i") > 0)
        .select("url_id", "card_i", F.posexplode(slices).alias("band_id", "band"))
    )


def candidate_pairs(
    sketches: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    max_band_bucket: int | None = None,
) -> DataFrame:
    """-> (id_a, id_b, card_a, card_b) candidate pairs, id_a < id_b.

    ``max_band_bucket``: if set, band buckets larger than this are
    dropped (scale escape hatch for adversarial template floods; OFF
    for reference parity — those pairs are genuine near-duplicates).
    """
    bands = explode_bands(sketches, cfg)
    if max_band_bucket is not None:
        sizes = bands.groupBy("band_id", "band").agg(F.count("*").alias("_n"))
        bands = (
            bands.join(
                F.broadcast(sizes.where(F.col("_n") > max_band_bucket)),
                ["band_id", "band"],
                "left_anti",
            )
        )
    a = bands.select(
        F.col("band_id"),
        F.col("band"),
        F.col("url_id").alias("id_a"),
        F.col("card_i").alias("card_a"),
    )
    b = bands.select(
        F.col("band_id"),
        F.col("band"),
        F.col("url_id").alias("id_b"),
        F.col("card_i").alias("card_b"),
    )
    tau = cfg.tau
    pairs = (
        a.join(b, on=["band_id", "band"])
        .where(F.col("id_a") < F.col("id_b"))
        # CB prune before the dedup shuffle (cheap, symmetric form)
        .where(
            F.least("card_a", "card_b").cast("double")
            / F.greatest("card_a", "card_b").cast("double")
            >= F.lit(tau)
        )
        .select("id_a", "id_b", "card_a", "card_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs
