"""Verify stage: exact reference Jaccard over the primary p=14 HLLs.

Replaces the reference's inner verification
(/root/reference/src/selection.cpp:286-288): t = union_size(hllA, hllB)
via elementwise register max + Ertl-MLE (hll.h:1188-1210), then
J = (e1 + e2 - t) / t with size_t-truncated e1, e2, keep iff J >= tau.

The register math runs as ONE vectorized numpy pass per Arrow batch
([batch, 16384] uint8 matrices — the same dense layout the CUDA path
flattened to, SURVEY §4), via applyInPandas-free mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle import DedupConfig
from ..sketchlib.hll import ertl_mle

VERIFY_SCHEMA = "url_a string, url_b string, jaccard double"


def _verify_batches(cfg: DedupConfig):
    p = cfg.hll_p
    tau = cfg.tau
    m = 1 << p

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sketchlib.batch import decode_registers, register_histograms

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            regs_a = decode_registers(list(pdf["hll_a"]), p)
            regs_b = decode_registers(list(pdf["hll_b"]), p)
            mx = np.maximum(regs_a, regs_b)
            hist = register_histograms(mx)
            t = np.array([ertl_mle(hist[i], p) for i in range(n)])
            e1 = pdf["card_a"].values.astype(np.float64)
            e2 = pdf["card_b"].values.astype(np.float64)
            jacc = (e1 + e2 - t) / t
            keep = jacc >= tau
            # canonical output order: url_a < url_b
            ua = pdf["url_a"].values[keep]
            ub = pdf["url_b"].values[keep]
            jj = jacc[keep]
            swap = ua > ub
            ua2 = np.where(swap, ub, ua)
            ub2 = np.where(swap, ua, ub)
            yield pd.DataFrame({"url_a": ua2, "url_b": ub2, "jaccard": jj})

    return fn


def verify_pairs(
    candidates: DataFrame, sketches: DataFrame, cfg: DedupConfig = DedupConfig()
) -> DataFrame:
    """(id_a, id_b, card_a, card_b) + sketches -> dup_pairs(url_a, url_b, jaccard).

    Two hash joins pull in the 16 KiB register blobs only for surviving
    candidates (the expensive payload never rides the band shuffle).
    """
    payload = sketches.select("url_id", "url", "hll14")
    joined = (
        candidates.join(
            payload.select(
                F.col("url_id").alias("id_a"),
                F.col("url").alias("url_a"),
                F.col("hll14").alias("hll_a"),
            ),
            "id_a",
        )
        .join(
            payload.select(
                F.col("url_id").alias("id_b"),
                F.col("url").alias("url_b"),
                F.col("hll14").alias("hll_b"),
            ),
            "id_b",
        )
        .select("url_a", "url_b", "card_a", "card_b", "hll_a", "hll_b")
    )
    return joined.mapInPandas(_verify_batches(cfg), schema=VERIFY_SCHEMA)
