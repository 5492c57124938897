"""Watermarked tumbling-window aggregation over an event stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(w_start, event_type, n_events) with late rows beyond the
    watermark dropped. Works on batch or streaming DataFrames."""
    # watermarks require TIMESTAMP (session-tz); parquet often yields NTZ
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp").alias("w_start"),
            "event_type",
            "n_events",
        )
    )


def read_event_stream(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """File-source stream over a parquet directory (the test harness for
    what would be Kafka/Kinesis in production)."""
    import os

    reader = spark.readStream
    if schema:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(path)
        reader = reader.schema(static.schema)
    # file-stream sources require a directory; single-file inputs are
    # addressed as parent dir + glob filter
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def run_available_now(
    sdf: DataFrame,
    query_name: str,
    timeout_s: int = 120,
    expect_single_batch: bool = False,
):
    """Drain all available input through the streaming plan into a
    memory sink; returns the result as a batch DataFrame.

    ``expect_single_batch``: raise if the drain took more than one
    data-carrying micro-batch. The streaming-vs-batch CC gate's
    invariant (streaming star CC == batch star CC) only holds when the
    whole input lands in one micro-batch — the stateful representative
    is then the same bucket minimum batch star uses, so the CB prune
    sees identical cardinalities on both sides. A file source with no
    ``maxFilesPerTrigger`` drains ReadAllAvailable (one batch); this
    flag turns that assumption into a checked runtime invariant instead
    of a silent one.
    """
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_agg(sdf) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if expect_single_batch:
        def _rows(p):
            try:
                return p["numInputRows"]
            except TypeError:
                return p.numInputRows
        n_data = sum(1 for p in q.recentProgress if _rows(p) > 0)
        if n_data > 1:
            raise AssertionError(
                f"expected a single-micro-batch drain, got {n_data} "
                f"data-carrying batches — the streaming-vs-batch CC "
                f"equality invariant does not hold across batch splits"
            )
    return sdf.sparkSession.sql(f"SELECT * FROM {query_name}")


def _has_agg(sdf: DataFrame) -> bool:
    return "Aggregate" in sdf._jdf.queryExecution().analyzed().toString()
