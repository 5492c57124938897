"""Incremental dedup against a reference corpus: exact anti-join and a
Spark-native distributed Bloom filter.

The recurring crawl problem: a new snapshot arrives and every document
whose text already exists in the reference corpus (previous snapshots,
an always-grow dedup ledger) must be dropped. Two strategies:

- ``method="exact"`` — left-anti join on the repo's standard 24-byte
  ``(xxhash64, md5)`` text key. Exact, but shuffles BOTH sides on the
  key: at 10^12 reference docs that is the dominant shuffle of the
  whole pipeline.
- ``method="bloom"`` — build a Bloom filter over the reference keys
  ONCE, broadcast it, and filter the new snapshot with a map-side
  membership test: the reference corpus never rides a shuffle again.
  One-sided error only: no false negatives (every true duplicate IS
  dropped), false positives drop ~``fp_rate`` extra new docs — the
  usual, acceptable trade for crawl dedup. ``bloom_subset_gate`` pins
  the containment contract (bloom-kept is a subset of exact-kept).

This build's Spark doesn't register ``bloom_filter_agg``/
``might_contain`` as SQL functions, so the filter is composed from
public DataFrame ops — which also removes the single-driver-blob
bottleneck of the built-in (a 10^11-bit filter cannot be a broadcast
scalar anyway):

1. k positions per key by double hashing
   ``pmod(xxhash64(text, i), n_bits)`` (i = 0..k-1);
2. bitmap as a TABLE ``(word: pos >> 6, bits: bit_or(1 << (pos & 63)))``
   — built fully distributed with map-side partial ``bit_or``, at most
   ``n_bits / 64`` rows regardless of corpus size;
3. membership (``with_bloom_verdict``): k broadcast hash joins — one
   per hash function — append the verdict map-side in a single stage,
   so the probe corpus is NEVER exchanged either; a doc is "possibly
   in the reference" iff all k probed bits are set. (For bitmaps past
   the broadcast threshold, ``bloom_might_contain(broadcast_bitmap=
   False)`` shuffles only narrow (id, word, mask) rows on ``word``.)

Sizing: ``n_bits ~= -n * ln(fp) / ln(2)^2`` and ``k ~= (n_bits/n) ln 2``
(standard Bloom calculus — Bloom, CACM 13(7), 1970; double-hashing
index derivation per Kirsch & Mitzenmacher, ESA 2006). At n = 10^12, fp = 1e-3 that is ~1.8 TB of
bitmap — which is why step 2 is a table (partitionable, joinable,
spillable) rather than a driver blob; for small references the
broadcast join keeps the probe map-side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fp_rate: float = 1e-3) -> tuple[int, int]:
    """(n_bits, k) for a target false-positive rate (standard calculus)."""
    n_items = max(1, n_items)
    n_bits = int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)) + 1
    k = max(1, round(n_bits / n_items * math.log(2)))
    return n_bits, k


def _key(text_col: str):
    # NULL text == empty text on BOTH paths, so exact and bloom agree
    # on NULL-key docs (a non-null-safe anti-join would keep every
    # NULL-text doc while the hash paths matched them — the same class
    # of NULL divergence the cascade's round-5 fix closed).
    return F.coalesce(F.col(text_col), F.lit(""))


def _positions(text_col: str, n_bits: int, k: int):
    """Array of k bit positions (double hashing via xxhash64 seeds)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(_key(text_col), F.lit(i)), F.lit(n_bits))
            for i in range(k)
        ]
    )


def bloom_bitmap(
    ref: DataFrame, text_col: str = "text", n_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Distributed Bloom bitmap ``(word: long, bits: long)`` over the
    reference corpus' text keys. <= n_bits/64 rows; built with
    map-side-partial ``bit_or`` (flooded words never hot-key)."""
    pos = ref.select(
        F.explode(_positions(text_col, n_bits, k)).alias("pos")
    )
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pos & 63 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def with_bloom_verdict(
    probe: DataFrame,
    bitmap: DataFrame,
    text_col: str = "text",
    n_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append ``out_col`` (boolean) to every probe row with ZERO probe-
    side exchanges: one broadcast hash join per hash function (k small,
    bitmap <= n_bits/64 rows), all map-side in a single stage — the
    probe payload is never shuffled, which is the whole point of the
    bloom path at 10^12 new docs. (An explode + groupBy(id) + join-back
    formulation computes the same verdict but re-shuffles the full new
    corpus on doc_id — strictly worse.)

    Note: building the verdict plan MATERIALIZES the bitmap (one Spark
    job, eagerly) into a local relation the k joins broadcast — the
    same job a lazy plan would run at action time, paid once up front.
    This is deliberate: k broadcast joins over the lazy bitmap rebuild
    its lineage k times (AQE does not reuse the alias'd stages,
    verified on the executed plan), and an internal persist() leaks an
    unreachable cache entry per call. The collect is bounded by the
    ``n_bits <= 2**27`` gate (<= 2M rows, ~32 MB); larger filters must
    use ``bloom_might_contain(broadcast_bitmap=False)``.
    """
    if n_bits > (1 << 27):
        raise ValueError(
            f"n_bits={n_bits} exceeds the broadcast-path bound 2**27; "
            "use bloom_might_contain(broadcast_bitmap=False)"
        )
    local_rows = [(r["word"], r["bits"]) for r in bitmap.collect()]
    bmb = F.broadcast(
        probe.sparkSession.createDataFrame(
            local_rows, schema="word long, bits long"
        )
    )
    d = probe
    conds = []
    temps = []
    for i in range(k):
        d = d.withColumn(
            f"_bp{i}",
            F.pmod(F.xxhash64(_key(text_col), F.lit(i)), F.lit(n_bits)),
        )
        d = d.withColumn(f"_bw{i}", F.shiftright(F.col(f"_bp{i}"), 6))
        d = d.withColumn(
            f"_bm{i}", F.expr(f"shiftleft(1L, cast(_bp{i} & 63 AS INT))")
        )
        side = f"_bloom{i}"
        d = d.join(
            bmb.alias(side),
            F.col(f"_bw{i}") == F.col(f"{side}.word"),
            "left",
        )
        conds.append(
            F.coalesce(F.col(f"{side}.bits"), F.lit(0)).bitwiseAND(
                F.col(f"_bm{i}")
            )
            != F.lit(0)
        )
        temps += [
            F.col(f"_bp{i}"),
            F.col(f"_bw{i}"),
            F.col(f"_bm{i}"),
            F.col(f"{side}.word"),
            F.col(f"{side}.bits"),
        ]
    verdict = conds[0]
    for c in conds[1:]:
        verdict = verdict & c
    d = d.withColumn(out_col, verdict)
    for c in temps:
        d = d.drop(c)
    return d


def bloom_might_contain(
    probe: DataFrame,
    bitmap: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 20,
    k: int = 5,
    broadcast_bitmap: bool = True,
) -> DataFrame:
    """``(id_col, might_contain: boolean)`` per probe row.

    True == all k bits set (possibly in reference); False == definitely
    novel. With ``broadcast_bitmap`` (default) this is a thin wrapper
    over ``with_bloom_verdict`` — zero probe-side exchanges. Set
    ``broadcast_bitmap=False`` for bitmaps past the broadcast
    threshold: the explode path shuffles (id, word, mask) rows on
    ``word`` — still one-sided, only k narrow rows per probe doc ride
    it, never the text.
    """
    if broadcast_bitmap:
        return with_bloom_verdict(
            probe, bitmap, text_col, n_bits, k
        ).select(id_col, "might_contain")
    pos = probe.select(
        id_col, F.explode(_positions(text_col, n_bits, k)).alias("pos")
    ).select(
        id_col,
        F.shiftright("pos", 6).alias("word"),
        F.expr("shiftleft(1L, cast(pos & 63 AS INT))").alias("mask"),
    )
    hits = pos.join(bitmap, "word", "left").select(
        id_col,
        F.when(
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    return hits.groupBy(id_col).agg(
        (F.min("hit") == 1).alias("might_contain")
    )


def dedup_against_reference(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    method: str = "exact",
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Rows of ``new_docs`` whose text does NOT appear in ``ref_docs``.

    ``exact``: anti-join on (xxhash64, md5) — exact, two-sided shuffle.
    ``bloom``: broadcast Bloom membership — no reference shuffle, no
    false negatives, ~fp false-positive over-drop.
    """
    if method == "exact":
        keys = ["_tk_h", "_tk_m"]
        tag = lambda df: df.withColumn(  # noqa: E731
            "_tk_h", F.xxhash64(_key(text_col))
        ).withColumn("_tk_m", F.md5(_key(text_col)))
        return (
            tag(new_docs)
            .join(tag(ref_docs).select(*keys).distinct(), keys, "left_anti")
            .drop(*keys)
        )
    if method == "bloom":
        bm = bloom_bitmap(ref_docs, text_col, n_bits, k)
        return (
            with_bloom_verdict(new_docs, bm, text_col, n_bits, k)
            .where(~F.col("might_contain"))
            .drop("might_contain")
        )
    raise ValueError(f"unknown method {method!r} (use 'exact' or 'bloom')")


def bloom_subset_gate(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Violations of the Bloom containment contract (expected EMPTY):
    ids kept by the bloom path but dropped by the exact path — i.e. a
    false NEGATIVE, which a correct Bloom filter cannot produce."""
    kept_bloom = dedup_against_reference(
        new_docs, ref_docs, text_col, "bloom", n_bits, k
    ).select(id_col)
    kept_exact = dedup_against_reference(
        new_docs, ref_docs, text_col, "exact"
    ).select(id_col)
    return kept_bloom.exceptAll(kept_exact).select(
        F.col(id_col).alias("violating_id")
    )
