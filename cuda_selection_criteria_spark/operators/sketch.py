"""Sketch stage: pages -> per-document sketches, one narrow mapInPandas pass.

Replaces the reference's E1 ``build_sketch`` entry point
(/root/reference/src/build_sketch.cpp:186-295). Shingling, WangHash,
HLL fold, SuperMinHash and Ertl-MLE cardinality are FUSED per Arrow
batch — no shuffle, no per-row Python (all heavy math in the batched
numpy kernels, sketchlib/batch.py).

Output schema (FIXTURES.md F2):
  url string, url_id long, card double, card_i long,
  hll14 binary, smh array<long>

``url_id`` is xxhash64-style surrogate (computed here with the same
splitmix64 chain the oracle uses so both sides agree); used to keep
band-explode rows narrow at 10^12-doc scale. ``card_i`` preserves the
oracle binary's size_t truncation (/root/reference/src/selection.cpp:275).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle import DedupConfig
from ..sketchlib.batch import (
    hll_batch,
    hll_cards_encode_batch,
    superminhash_batch,
)
from ..sketchlib.hashes import shingle_hashes, shingle_hashes_batch

SKETCH_SCHEMA = (
    "url string, url_id long, card double, card_i long, hll14 binary, smh array<long>"
)
SKETCH_SCHEMA_AUX = SKETCH_SCHEMA + ", hll_aux binary"


def sketch_schema(cfg: DedupConfig) -> str:
    return SKETCH_SCHEMA_AUX if cfg.criterion in ("hll_a", "hll_an") else SKETCH_SCHEMA


def _sketch_batches(cfg: DedupConfig):
    k, m, p = cfg.shingle_k, cfg.smh_m, cfg.hll_p
    want_aux = cfg.criterion in ("hll_a", "hll_an")
    aux_p = cfg.aux_p

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            texts = pdf["text"].fillna("").tolist()
            # adaptive shingling (both bit-identical, tests pin it):
            # short docs -> chunk-vectorized batch pass (2.1x: per-doc
            # Python overhead dominates); long docs -> per-doc numpy
            # (small cache-resident buffers beat the chunked pass's
            # streaming temporaries on fault-throttled hosts; measured
            # 1.05s vs 1.25s per 4096x1.6KB batch, crossover ~0.5KB).
            if sum(len(t) for t in texts) <= 512 * n:
                items, didx = shingle_hashes_batch(texts, k)
            else:
                sets = [shingle_hashes(t, k) for t in texts]
                counts = np.array([s.size for s in sets], dtype=np.int64)
                if counts.sum():
                    items = np.concatenate([s for s in sets if s.size])
                else:
                    items = np.empty(0, dtype=np.uint64)
                didx = np.repeat(np.arange(n, dtype=np.int64), counts)
            # fused fold + estimate + encode: never materializes the
            # full [batch, 2^p] register matrix (cache-resident chunks)
            cards, hll_col = hll_cards_encode_batch(
                items, didx, n, p, encoding=cfg.register_encoding
            )
            sigs = superminhash_batch(items, didx, n, m)
            out = {
                "url": pdf["url"].values,
                "url_id": pdf["url_id"].values,
                "card": cards,
                "card_i": cards.astype(np.int64),  # size_t truncation
                "hll14": hll_col,
                "smh": [s.astype(np.int64) for s in sigs],  # u64 bit-cast
            }
            if want_aux:
                aux = hll_batch(items, didx, n, aux_p)
                out["hll_aux"] = [r.tobytes() for r in aux]
            yield pd.DataFrame(out)

    return fn


def sketch_pages(
    pages: DataFrame, cfg: DedupConfig = DedupConfig(), min_partitions: int | None = None
) -> DataFrame:
    """pages(url, text, ...) -> sketches DataFrame.

    Catalyst prunes every column except url/text at the scan.
    url_id = xxhash64(url) (JVM-side, stable).

    Normally narrow (no shuffle): a 100 TB table arrives in thousands
    of splits. But a small/single-file input would serialize the whole
    sketch pass on one core, so inputs with fewer partitions than the
    cluster's parallelism are repartitioned first (tiny rows — url +
    text only).
    """
    src = pages.select("url", F.xxhash64(F.col("url")).alias("url_id"), "text")
    if pages.isStreaming:
        # streaming sources size their own micro-batch partitions; no
        # partition probe (inputFiles/rdd are undefined on streams)
        return src.mapInPandas(_sketch_batches(cfg), schema=sketch_schema(cfg))
    if min_partitions is None:
        min_partitions = pages.sparkSession.sparkContext.defaultParallelism
    # partition-count probe: the PLANNED partitions, not the file count
    # — Spark packs many small files into fewer splits (file count would
    # overstate parallelism and skip a needed repartition) and splits
    # large files into more. One .rdd access per sketch_pages call is
    # plan-time only (no job); the RDD conversion is never executed.
    n_parts = src.rdd.getNumPartitions()
    if n_parts < min_partitions:
        src = src.repartition(min_partitions)
    return src.mapInPandas(_sketch_batches(cfg), schema=sketch_schema(cfg))
