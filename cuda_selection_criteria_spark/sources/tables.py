"""Typed readers for the engine's input tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SCHEMAS: dict[str, dict[str, str]] = {
    # BASELINE.json input_hint shape
    "pages": {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
}


def _check(df: DataFrame, table: str) -> DataFrame:
    want = SCHEMAS[table]
    have = {f.name for f in df.schema.fields}
    missing = set(want) - have
    if missing:
        raise ValueError(f"{table}: missing columns {sorted(missing)}; have {sorted(have)}")
    return df


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return _check(spark.read.parquet(path), "pages")


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    return _check(spark.read.parquet(path), "documents")


def read_embeddings(spark: SparkSession, path: str) -> DataFrame:
    return _check(spark.read.parquet(path), "embeddings")


def read_events(spark: SparkSession, path: str) -> DataFrame:
    return _check(spark.read.parquet(path), "events")
