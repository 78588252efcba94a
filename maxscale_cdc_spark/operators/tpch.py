"""Adapted TPC-H pipeline queries — the canonical multi-join anchors.

Q3/Q5/Q10 shapes over the driver's star schema (no partsupp table; Q5
drops the supplier⋈lineitem partkey edge accordingly).  These exercise
what single-operator tests can't: join ORDER and STRATEGY selection
across 3-5 tables, filter pushdown through joins, and aggregate
placement.  Catalyst reorders the joins; the dims go broadcast; the
fact tables shuffle at most once each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maxscale_cdc_spark.registry import register
from maxscale_cdc_spark.tables import table

DEC12 = "decimal(12,4)"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(DEC12) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC12)


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))"


@register(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           CAST(round(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (shipping priority): 3-way join with filters on every input —
    all three predicates push to their scans before any join."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5",
    f"""
    SELECT n_name,
           CAST(round(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (local supplier volume): 6-way join; region/nation/supplier
    broadcast, the orders date range prunes before the fact join, and
    the n_nationkey = s_nationkey cycle closes the local-supplier
    constraint."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(round(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 (returned-item reporting): returned lineitems in a quarter,
    aggregated back to the customer grain with the nation dim broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
    )


@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(round(SUM({_REV_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(SUM({_REV_SQL} * CAST(1 + l_tax AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (pricing summary): THE scan-heavy aggregate — one filtered
    scan, one 6-group hash agg, everything map-side combinable.  All
    money math in exact decimals (order-independent), surfaced as
    doubles; averages divide the identical exact sum by the identical
    count, so both engines emit bit-equal doubles."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    dq = F.col("l_quantity").cast("decimal(18,4)")
    dp = F.col("l_extendedprice").cast("decimal(18,4)")
    dd = F.col("l_discount").cast("decimal(18,4)")
    charge = _rev() * (F.lit(1) + F.col("l_tax")).cast(DEC12)
    n = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dq).cast("double").alias("sum_qty"),
        F.sum(dp).cast("double").alias("sum_base_price"),
        # scale-8/12 decimal sums are rounded to 2dp BEFORE the double
        # cast: the int128 of a scale-12 sum overflows double's 53-bit
        # mantissa, and the two engines' decimal→double conversions
        # round differently past it (observed 1-ulp diff at sf0.001)
        F.round(F.sum(_rev()), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        (F.sum(dq).cast("double") / n).alias("avg_qty"),
        (F.sum(dp).cast("double") / n).alias("avg_price"),
        (F.sum(dd).cast("double") / n).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


@register(
    "tpch_q14",
    f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_SQL}
                                      ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (promotion effect): conditional aggregation over a
    fact⋈broadcast-dim join in a one-month shipdate window — the date
    filter pushes to the lineitem scan, part broadcasts, and the global
    agg is a single partial+final pair."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type").like("PROMO%"), _rev()
    ).otherwise(F.lit(0).cast(DEC12))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers): the agg-then-semi-join shape — the
    per-order quantity rollup feeds a LEFT SEMI join back onto orders
    before the wide customer join, so the expensive join only sees the
    874-in-60k qualifying tail.  The rollup and the semi-join share the
    l_orderkey shuffle key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,4)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dq).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    o_big = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
    return (
        c.join(o_big, c.c_custkey == o_big.o_custkey)
        .join(li, o_big.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dq).cast("double").alias("sum_qty"))
    )
