"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

`spark.read.parquet` gives Catalyst full pushdown/pruning; loaders are
thin on purpose — every operator expresses its needs declaratively and
lets the optimizer prune columns and push filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as long nanoseconds — convert to a microsecond timestamp (floor),
    # matching DuckDB's read of the same column.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integral `div`, not `/`: ns values exceed double's 2^53 exactness
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def wide_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`table()` with an adaptive parallelism floor for compute-heavy
    per-row work (shingling, hashing, vector projections).

    A small corpus arrives as one unsplittable parquet row group, so
    the scan yields ONE partition and per-row compute serializes on a
    single core — measured 10× slower than the same work spread over
    the machine (3.1 s vs 0.3 s for trigram shingling at sf0.1).  When
    the scan has fewer partitions than the session's cores, round-robin
    repartition up to core count; the shuffled bytes are exactly the
    small table, so the exchange costs ~ms and unlocks full
    parallelism.  At production scale (100 TB = thousands of row
    groups) the scan already carries >= cores splits and this returns
    the plain scan — NO added exchange; the check is plan-side only
    (no job is triggered)."""
    df = table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
