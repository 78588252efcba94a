"""Bucketed co-located join: pre-bucketing both fact tables on the join
key elides the shuffle entirely — the 100 TB strategy for recurring
fact⋈fact joins (SURVEY §2B scale notes).  Asserts the physical plan
has NO Exchange on either side."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from maxscale_cdc_spark.plans.inspect import exchange_count, simple_plan
from maxscale_cdc_spark.tables import table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # explicit external paths — no dependence on the (static) warehouse dir
    wh = tempfile.mkdtemp(prefix="warehouse_")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/li_b")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/o_b")
        .saveAsTable("o_bucketed")
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_elides_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable broadcast so the join must co-locate
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = simple_plan(joined)
        assert "SortMergeJoin" in plan
        # the join itself needs no shuffle: only the final aggregation
        # exchanges (1), not the two join inputs (would be 3)
        assert exchange_count(joined) == 1, plan
        # and the result matches the plain (shuffled) join
        plain = (
            table(spark, "/root/testdata/sf0.001", "lineitem")
            .join(
                table(spark, "/root/testdata/sf0.001", "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
