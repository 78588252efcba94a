"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (CDC latest-state materialization
joined to a dimension, aggregated) at sf0.001; `queries()` /
`oracle_sql()` expose the full SURVEY §2B operator inventory backed by
`maxscale_cdc_spark.registry`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maxscale_cdc_spark import registry
from maxscale_cdc_spark.functions.numeric import dsum
from maxscale_cdc_spark.session import tune_for_oracle
from maxscale_cdc_spark.tables import table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: materialize current per-user state from the CDC-shaped
    event stream (last image per PK, deletes dropped), enrich with the
    broadcast customer dim, aggregate per market segment.

    Exercises scan → window (CDC apply) → broadcast join → hash agg —
    the canonical CDC-consumer pipeline at any scale.
    """
    tune_for_oracle(spark)
    from maxscale_cdc_spark.operators.cdc import cdc_latest_state

    state = cdc_latest_state(spark, SF0001)
    cust = table(spark, SF0001, "customer")
    return (
        state.join(F.broadcast(cust), state.pk == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_users"),
            dsum("last_value", "sum_value"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLE)
