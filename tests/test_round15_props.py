"""Round-15 continuation property tests: cross-operator pins the
oracle hash can't state — file-skipping safety (skipped files contain
no qualifying rows; residual filter pushed to the scan), and the
later ops of this batch."""

from __future__ import annotations

import __spark_entry__ as entrymod


def _q(name, spark, sf_dir):
    return entrymod.queries()[name](spark, sf_dir)


def test_file_skipping_is_safe_and_prunes(spark, sf_dir):
    """Safety: the candidate set must contain EVERY qualifying row
    (pruned agg == full-layout agg); effectiveness: at least one file
    is actually skipped at every scale."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.sources import file_skipping_parts

    manifest, cand, n_total, lo, hi = file_skipping_parts(spark, sf_dir)
    assert 0 < len(cand) < n_total  # pruning really happened
    skipped = [
        r["path"]
        for r in manifest.collect()
        if r["path"] not in set(cand)
    ]
    # every skipped file has zero qualifying rows (stats were truthful)
    n_bad = (
        spark.read.parquet(*skipped)
        .filter(F.col("o_orderkey").between(lo, hi))
        .count()
    )
    assert n_bad == 0


def test_file_skipping_residual_pushdown(spark, sf_dir):
    """The residual range predicate must reach the parquet reader as a
    pushed filter (row-group pruning inside candidate files)."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.sources import file_skipping_parts

    _, cand, _, lo, hi = file_skipping_parts(spark, sf_dir)
    pruned = spark.read.parquet(*cand).filter(
        F.col("o_orderkey").between(lo, hi)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_orderkey" in plan
