"""Iceberg warehouse adapter: API-parity checks.

The container ships no iceberg-spark-runtime jar, so the functional
test skips; what CAN run anywhere: availability gating is correct and
the adapter exposes the exact Warehouse method surface (the seam
contract sketch_with_resume & the CLI rely on).
"""

from __future__ import annotations

import inspect

import pytest

from cuda_selection_criteria_spark import warehouse, warehouse_iceberg


def test_available_false_without_catalog(spark):
    assert warehouse_iceberg.available(spark, "web") is False


def test_method_surface_matches_parquet_warehouse():
    base = {
        n
        for n, _ in inspect.getmembers(warehouse.Warehouse, inspect.isfunction)
        if not n.startswith("_")
    }
    ice = {
        n
        for n, _ in inspect.getmembers(warehouse_iceberg.IcebergWarehouse, inspect.isfunction)
        if not n.startswith("_")
    }
    missing = base - ice
    assert not missing, f"IcebergWarehouse lacks {missing}"


def test_functional_roundtrip_with_catalog(spark):
    if not warehouse_iceberg.available(spark, "web"):
        pytest.skip("no Iceberg catalog configured in this container")
    wh = warehouse_iceberg.IcebergWarehouse(spark, "web", "testdb")
    df = spark.range(5).withColumnRenamed("id", "part_id")
    wh.write("t", df, partition_by=["part_id"])
    assert wh.read("t").count() == 5
