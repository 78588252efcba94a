"""Relational core — the query surface over CDC-materialized tables.

Every operator is declarative DataFrame/SQL: Catalyst supplies predicate
pushdown, column pruning, join selection (broadcast vs sort-merge under
AQE), partial aggregation and whole-stage codegen.  The reference has no
relational surface (SURVEY §2A) — this is the idiomatic Spark
realization of what consumers do with its change streams.

Scale notes (100 TB):
* joins to dims (region/nation/customer/supplier/part) are broadcast —
  explicitly hinted where the dim is known-small;
* fact-fact joins (orders⋈lineitem) shuffle on the join key once; at
  cluster scale the tables would be bucketed on the same key to elide it;
* aggregations are map-side combinable (sum/count/min/max of
  decimals/longs);
* windows always partition by a key (never a global window);
* all money sums go through DECIMAL casts (functions/numeric.py) which
  also makes them order/partitioning-independent — a correctness
  property at ANY parallelism, not just for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from maxscale_cdc_spark.functions.numeric import DEC, davg, dec, dsum
from maxscale_cdc_spark.registry import register
from maxscale_cdc_spark.tables import table

DEC12 = "decimal(12,4)"


def _d12(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(DEC12)


# ---------------------------------------------------------------------------
# Projection / filter
# ---------------------------------------------------------------------------

@register(
    "rel_project",
    """
    SELECT c_custkey, upper(c_name) AS name_upper, c_mktsegment
    FROM customer
    """,
)
def rel_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        "c_custkey", F.upper("c_name").alias("name_upper"), "c_mktsegment"
    )


@register(
    "rel_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
      AND (l_returnflag IN ('A', 'R') OR NOT (l_linestatus = 'O'))
      AND l_quantity > 30
      AND l_returnflag IS NOT DISTINCT FROM l_returnflag
    """,
)
def rel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1998-12-31")
        & (F.col("l_returnflag").isin("A", "R") | ~(F.col("l_linestatus") == "O"))
        & (F.col("l_quantity") > 30)
        & F.col("l_returnflag").eqNullSafe(F.col("l_returnflag"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

@register(
    "rel_agg_hash",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4)) * CAST(1 + l_tax AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (the canonical hash aggregate)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = _d12("l_extendedprice") * _d12(F.lit(1) - F.col("l_discount"))
    charge = disc_price * _d12(F.lit(1) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        # round(…,2) before the double cast: the exact decimal sums agree
        # across engines, but their nearest-double conversions can differ
        # by 1 ulp at scale 12 — cents precision is the semantic anyway.
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "rel_agg_distinct",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "rel_agg_approx",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS hll_within_tol,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct + approximate quantiles — the 100 TB substitutes for
    exact distinct/percentile (single pass, fixed memory, mergeable).

    Sketch outputs cannot hash-match a DuckDB oracle, so the query emits
    oracle-checkable *facts about the sketch* instead: the exact values
    (computed alongside, same shuffle) plus booleans asserting the sketch
    landed within tolerance.  ε=0.05 against HLL's ~2.3 % standard error
    at default precision (rsd=0.05 ⇒ we pass rsd=0.023 explicitly) and
    percentile_approx at accuracy 10000 (error ≤ 1/10000 of rank) — both
    bounds hold with wide margin, so the booleans are deterministic TRUE
    and the oracle returns exact counts + literal TRUE.

    The exact aggregates are oracle instrumentation: at 100 TB a user
    runs only the sketch columns (fixed memory, mergeable partials); the
    certification query runs both on the identical groupBy so the driver
    can prove the sketch's error bound on real data.

    The sketch and exact sides run as SEPARATE aggregations joined on
    the 3-row group key: mixing countDistinct (Expand) with the
    TypedImperative percentile buffers in ONE agg forces a sort-based
    fallback over doubled data — measured 19.6 s for the combined agg
    vs ~1 s per component at sf0.1.  Two single-pass aggs + a 3-row
    join is 6× faster and is also the shape you'd run at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    p_exact = F.expr("percentile(l_extendedprice, array(0.5, 0.95))")
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.023).alias("approx_orders"),
        F.element_at(q, 1).alias("price_p50"),
        F.element_at(q, 2).alias("price_p95"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.element_at(p_exact, 1).alias("exact_p50"),
        F.element_at(p_exact, 2).alias("exact_p95"),
    )
    agg = sketch.join(F.broadcast(exact), "l_returnflag")

    def _tol(approx, exact):
        return (F.abs(F.col(approx) - F.col(exact)) / F.col(exact)) <= 0.05

    return agg.select(
        "l_returnflag",
        "exact_orders",
        _tol("approx_orders", "exact_orders").alias("hll_within_tol"),
        _tol("price_p50", "exact_p50").alias("p50_within_tol"),
        _tol("price_p95", "exact_p95").alias("p95_within_tol"),
    )


@register(
    "rel_agg_stats",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             / CAST(COUNT(*) - 1 AS DOUBLE) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance via exact decimal sums (order-independent, engine-stable) —
    textbook formula on identical operands instead of engine-specific
    Welford accumulators."""
    li = table(spark, sf_dir, "lineitem")
    sum_sq = F.sum(_d12("l_quantity") * _d12("l_quantity")).cast("double")
    s = F.sum(dec("l_quantity")).cast("double")
    n = F.count("*").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        s.alias("sum_qty"),
        ((sum_sq - s * s / n) / (n - F.lit(1.0))).alias("var_qty"),
    )


@register(
    "rel_agg_rollup",
    """
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           CAST(COUNT(c_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rel_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"), dsum("c_acctbal", "sum_bal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "sum_bal",
        )
    )


@register(
    "rel_agg_cube",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rel_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


@register(
    "rel_agg_gsets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def rel_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via the SQL surface (same Catalyst plan as the
    DataFrame Expand)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "rel_having",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def rel_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register(
    "rel_join_inner",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def rel_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@register(
    "rel_join_left",
    """
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def rel_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "rel_join_right",
    """
    SELECT c_custkey, c_acctbal, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_acctbal
    """,
)
def rel_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "rel_join_full",
    """
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           cn.nk IS NOT NULL AS has_customers,
           sn.nk IS NOT NULL AS has_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def rel_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    ).distinct()
    sn = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    ).distinct()
    return cn.join(sn, cn.nk == sn.nk, "full_outer").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        cn.nk.isNotNull().alias("has_customers"),
        sn.nk.isNotNull().alias("has_suppliers"),
    )


@register(
    "rel_join_semi",
    """
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_active_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    """,
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_active_customers"))
    )


@register(
    "rel_join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
    """,
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join kept non-trivially non-empty at every SF (customers with
    no *finished* order) so the check distinguishes a broken join from a
    correct one."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "rel_join_broadcast",
    """
    SELECT p_brand,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def rel_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint: no shuffle of the fact
    side — the pattern every 100 TB star-join should compile to.

    The scale-8 product sum is re-cast to DECIMAL(18,4) BEFORE the
    double cast (value-exact: extendedprice and discount carry 2 real
    decimals each, so the product's scale-8 tail is zeros) — DuckDB's
    int128->double conversion double-rounds once the unscaled value
    exceeds 2^53, which first bites at the derived sf1.0's ~1.2e10
    revenue sums (1 ulp off on 9 of 25 brands; round-15 sweep
    finding).  At scale 4 the unscaled sum stays < 2^53 through sf10,
    making both engines' casts single-rounding, hence identical."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = _d12("l_extendedprice") * _d12(F.lit(1) - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "rel_join_theta",
    """
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_close_lines
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_brand
    """,
)
def rel_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + range residual: Catalyst keeps the equi-part hashable
    (broadcast/SMJ) and evaluates the range as a join residual — never a
    cartesian nested loop."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 5)
        & (li.l_quantity <= p.p_size + 5)
    )
    return (
        li.join(F.broadcast(p), cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_close_lines"))
    )


@register(
    "rel_join_asof",
    """
    SELECT p.event_id, p.user_id,
           (SELECT max(s.ts) FROM events s
             WHERE s.event_type = 'signup' AND s.user_id = p.user_id
               AND s.ts <= p.ts) AS last_signup_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def rel_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest signup at/before each purchase) via the
    union+window pattern: one keyed sort per user instead of a range
    self-join — O(n log n) per key and shuffle-free after one
    repartition, the scalable formulation at 100 TB.
    """
    ev = table(spark, sf_dir, "events")
    marked = ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    # On ts ties, signups sort before purchases so an equal-ts signup is
    # visible to the purchase (matching the oracle's s.ts <= p.ts).
    order = [
        F.col("ts"),
        F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1)),
        F.col("event_id"),
    ]
    w = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = marked.withColumn(
        "last_signup_ts", F.last("signup_ts", ignorenulls=True).over(w)
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "last_signup_ts"
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "rel_win_rank",
    """
    SELECT c_custkey, c_nationkey,
           CAST(rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS bal_rank,
           CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS bal_dense_rank,
           CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_rn,
           CAST(ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_quartile
    FROM customer
    """,
)
def rel_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w_ties = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w_det = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w_ties).cast("long").alias("bal_rank"),
        F.dense_rank().over(w_ties).cast("long").alias("bal_dense_rank"),
        F.row_number().over(w_det).cast("long").alias("bal_rn"),
        F.ntile(4).over(w_det).cast("long").alias("bal_quartile"),
    )


@register(
    "rel_win_analytic",
    """
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_orderdate) OVER w AS first_date,
           last_value(o_orderdate)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def rel_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderdate").over(w).alias("first_date"),
        F.last("o_orderdate").over(w_full).alias("last_date"),
    )


@register(
    "rel_win_frame",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg
    FROM events
    """,
)
def rel_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-3, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(run).cast("double").alias("running_value"),
        (
            F.sum(dec("value")).over(mov).cast("double")
            / F.count("value").over(mov).cast("double")
        ).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------

@register(
    "rel_sort_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def rel_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark executes as TakeOrderedAndProject (per-partition
    heap + driver merge of N) — no global sort at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )


@register(
    "rel_topk",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def rel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "rel_set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def rel_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "rel_set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def rel_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "rel_set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def rel_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT DISTINCT (exceptAll is bag semantics — wrong here)
    return c.subtract(s)


@register(
    "rel_set_except_all",
    """
    SELECT l_returnflag AS flag FROM lineitem
    EXCEPT ALL
    SELECT o_orderstatus FROM orders
    """,
)
def rel_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-aware), non-empty at all SFs."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_returnflag").alias("flag"))
    o = table(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("flag"))
    return li.exceptAll(o)


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

@register(
    "rel_pivot",
    """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        ev.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------

@register(
    "fn_string",
    """
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS lo_seg,
           trim(c_name) AS trimmed,
           substr(c_name, 1, 8) AS prefix8,
           c_name || '/' || c_mktsegment AS joined,
           replace(c_name, '#', '-') AS replaced,
           regexp_replace(c_name, '[0-9]+', 'N') AS re_replaced,
           CAST(length(c_name) AS BIGINT) AS name_len,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.trim("c_name").alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("joined"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("replaced"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("re_replaced"),
        F.length("c_name").cast("long").alias("name_len"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
    )


@register(
    "fn_date",
    """
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
           CAST(extract(month FROM o_orderdate) AS INT) AS order_mon,
           CAST(extract(day FROM o_orderdate) AS INT) AS order_day,
           CAST(isodow(o_orderdate) AS INT) AS order_isodow,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus_30d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.weekday("o_orderdate") + F.lit(1)).cast("int").alias("order_isodow"),
        # DATE results surface as TIMESTAMP: both engines then hand
        # pandas a datetime64 column (dates arrive as mixed objects)
        F.date_add(F.to_date("o_orderdate"), 30).cast("timestamp").alias("plus_30d"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.last_day(F.to_date("o_orderdate")).cast("timestamp").alias("month_end"),
    )


@register(
    "fn_math",
    """
    SELECT event_id,
           abs(value - 100.0) AS dist_100,
           round(value, 1) AS val_round1,
           CAST(floor(value) AS BIGINT) AS val_floor,
           CAST(ceil(value) AS BIGINT) AS val_ceil,
           sqrt(abs(value)) AS val_sqrt,
           CAST(event_id % 7 AS BIGINT) AS id_mod7,
           round(ln(value + 1.0), 6) AS val_ln,
           CAST(sign(value - 100.0) AS DOUBLE) AS val_sign,
           greatest(value, 50.0) AS val_hi,
           least(value, 50.0) AS val_lo
    FROM events
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.abs(v - 100.0).alias("dist_100"),
        F.round(v, 1).alias("val_round1"),
        F.floor(v).alias("val_floor"),
        F.ceil(v).alias("val_ceil"),
        F.sqrt(F.abs(v)).alias("val_sqrt"),
        (F.col("event_id") % 7).alias("id_mod7"),
        F.round(F.log(v + 1.0), 6).alias("val_ln"),
        F.signum(v - 100.0).alias("val_sign"),
        F.greatest(v, F.lit(50.0)).alias("val_hi"),
        F.least(v, F.lit(50.0)).alias("val_lo"),
    )


@register(
    "fn_array",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(list_sum(CAST(embedding AS DOUBLE[])) AS DOUBLE), 6) AS elem_sum,
           round(CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE), 6) AS elem_max
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(arr, 1), 6).alias("first_elem"),
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("elem_sum"),
        F.round(F.array_max(arr), 6).alias("elem_max"),
    )


@register(
    "fn_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.size(F.from_json("props", "map<string,string>")).alias("n_keys"),
    )


@register(
    "fn_map",
    """
    SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL AS has_k
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed payload access: the reference's dynamic row payload
    (map[string]interface{}, event.go:220-236) as a Spark MapType with
    key/value/containment operations."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        m.getItem("k").alias("k_val"),
        F.size(m).alias("n_keys"),
        F.map_contains_key(m, "k").alias("has_k"),
    )


@register(
    "fn_explode",
    """
    SELECT l_orderkey, CAST(line_no AS INT) AS line_no
    FROM (
      SELECT l_orderkey, unnest(generate_series(1, max_ln)) AS line_no
      FROM (SELECT l_orderkey, max(l_linenumber) AS max_ln FROM lineitem GROUP BY l_orderkey)
    )
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral expansion (UDTF-style): sequence + explode — rows fan out
    executor-side, never on the driver."""
    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.max("l_linenumber").alias("max_ln"))
    return per_order.select(
        "l_orderkey",
        F.explode(F.sequence(F.lit(1), F.col("max_ln"))).alias("line_no"),
    )


# ---------------------------------------------------------------------------
# rel_join_bucketed — co-located join over bucketed tables: the 100 TB
# answer to "this join shuffles both sides every run".  Write both fact
# tables bucketBy(8, orderkey) + sortBy once; every subsequent join on
# the bucket key is a zero-exchange sort-merge join (each task reads
# bucket i of both sides).  At cluster scale the bucket count is sized
# to executors × cores (e.g. 4096) and the write cost amortizes over
# every downstream join/agg on the key — the Spark analogue of the
# reference consumer materializing its stream partitioned by PK.
# ---------------------------------------------------------------------------

_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register("rel_join_bucketed", _BUCKETED_ORACLE)
def rel_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides pre-bucketed on the join key
    so the sort-merge join has NO Exchange on either side (plan shows
    `Bucketed: true` scans; the only shuffle left is the 5-group final
    agg).  The `merge` hint pins the strategy so the plan demonstrates
    the bucketing (AQE would otherwise broadcast at test scale and hide
    it).  The bucketed write is the one-time cost this operator exists
    to amortize."""
    import tempfile

    base = tempfile.mkdtemp(prefix="maxscale_bucketed_")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_lineitem")
    (
        o.select("o_orderkey", "o_orderpriority")
        .write.format("parquet")
        .option("path", f"{base}/orders")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bj_orders")
    )
    (
        li.select("l_orderkey", "l_extendedprice")
        .write.format("parquet")
        .option("path", f"{base}/lineitem")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bj_lineitem")
    )
    return (
        spark.table("bj_orders")
        .hint("merge")
        .join(
            spark.table("bj_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# fn_variant — the semi-structured VARIANT surface (Spark 4's native
# open-schema type): parse the reference's dynamic JSON payload
# (map[string]interface{}, event.go:220-236) into a VARIANT once, then
# do typed path extraction (variant_get), lossy-cast extraction, and
# try-semantics on a missing path.  At 100 TB VARIANT beats re-parsing
# JSON strings per expression: one binary-encoded parse, pruned typed
# reads.  The oracle reads the same paths with DuckDB's JSON ops —
# exported values are engine-neutral (BIGINT / VARCHAR / BOOLEAN).
# ---------------------------------------------------------------------------


@register(
    "fn_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT payload access: one parse_json, typed variant_get reads,
    try-semantics on an absent path (see block comment)."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").isNull().alias(
            "missing_is_null"
        ),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_mod"),
    )
