"""Deterministic key-hash sampling — the one sampling primitive safe at
100 TB: reproducible on any cluster, stable under re-partitioning and
re-runs (TABLESAMPLE / rand() change with physical layout and seed
plumbing), and consistent ACROSS TABLES for the same key.

Both sides build the SAME expression tree (exactness discipline,
CLAUDE.md rule 3): bucket = int(first 4 hex chars of md5(key)) % 100,
keep when bucket < pct.  Proven cross-engine by rel_sample_hash
(relational2.py); factored here so the sample-bounded knob tables
(llm_lsh_tuning_sampled, llm_ivf_nprobe_sweep_sampled) share it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_sample(key: str | Column, pct: int) -> Column:
    """Spark predicate: deterministic `pct`% sample by md5 of the key."""
    col = F.col(key) if isinstance(key, str) else key
    bucket = (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("int")
        % 100
    )
    return bucket < pct


def sql_hash_sample(key_expr: str, pct: int) -> str:
    """DuckDB predicate identical in value to `hash_sample`."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 4)) "
        f"AS INTEGER) % 100 < {pct}"
    )


def sql_hash_sample_expr(key_expr: str, pct_expr: str) -> str:
    """Like sql_hash_sample but with a SQL-computed percentage (e.g. a
    scalar subquery) — the corpus-size-capped tuning samples."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 4)) "
        f"AS INTEGER) % 100 < ({pct_expr})"
    )
