"""Query/oracle registry backing `__spark_entry__.py`.

Each operator module registers its driver-facing query wrappers here:
a callable `(spark, sf_dir) -> DataFrame` plus (when SQL-expressible)
the equivalent DuckDB oracle SQL.  Keys are the SURVEY.md §2B ids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def oracle_splice(sql: str, anchor: str, replacement: str) -> str:
    """`str.replace` for DERIVED oracles (a consumer query's SQL built
    by splicing into a base oracle) that fails AT IMPORT TIME if the
    anchor drifted: a silent no-op replace produces malformed SQL that
    would otherwise only surface when the driver runs the oracle."""
    if anchor not in sql:
        raise AssertionError(
            f"oracle splice anchor not found (base oracle drifted): "
            f"{anchor[:80]!r}"
        )
    return sql.replace(anchor, replacement)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from maxscale_cdc_spark.operators import (  # noqa: F401
        analytics,
        autotune,
        bpe,
        cdc,
        llm,
        multimodal,
        pipeline,
        quality,
        relational,
        relational2,
        retrieval,
        sources,
        tpch,
        tpch2,
        udfs,
    )
    from maxscale_cdc_spark.streaming import ops  # noqa: F401
