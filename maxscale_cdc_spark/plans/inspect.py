"""Physical-plan inspection helpers.

Used by perf tests to assert the plan properties that matter at 100 TB:
filters pushed into the parquet scan, dims broadcast, whole-stage
codegen covering the hot path, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan nodes."""
    return "\n".join(
        line for line in formatted_plan(df).splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema of scan nodes — verifies column pruning."""
    return "\n".join(
        line for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages (the `*(n)` markers).  Under
    AQE the final plan only exists after execution, so this runs the
    plan (noop sink) before reading it."""
    import re

    df.collect()  # materializes THIS QueryExecution's adaptive final plan
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))


def exchange_count(df: DataFrame) -> int:
    """Shuffle count in the executed plan (each Exchange node once)."""
    import re

    return len(re.findall(r"\bExchange (?:hash|range|Single)", simple_plan(df)))
