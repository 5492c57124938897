"""Incremental exact-duplicate suppression on a document stream."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each exact text within the watermark
    horizon (state is bounded by the watermark — mandatory for an
    unbounded crawl stream). Batch DataFrames dedup globally."""
    fp = F.md5(F.col("text")).alias("fp")
    src = pages.withColumn("fp", fp).withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
        return src.dropDuplicatesWithinWatermark(["fp"])
    return src.dropDuplicates(["fp"]).drop("fp")
