"""Physical-plan audit: assert the plan properties the 100 TB design
relies on (used by tests and by hand during tuning)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _formatted(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString("formatted")


def audit_plan(df: DataFrame) -> dict[str, object]:
    """Summarize scale-relevant plan facts."""
    txt = _formatted(df)
    return {
        "n_exchanges": txt.count("Exchange"),
        "n_broadcast": txt.count("BroadcastExchange"),
        "has_cartesian": "CartesianProduct" in txt or "BroadcastNestedLoopJoin" in txt,
        "read_schemas": [
            line.split("ReadSchema:", 1)[1].strip()
            for line in txt.splitlines()
            if "ReadSchema:" in line
        ],
        "wholestage_spans": txt.count("WholeStageCodegen"),
    }
