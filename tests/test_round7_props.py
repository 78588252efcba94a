"""Round-7 exactness properties, tested directly (not via the oracle):
the deterministic sample primitive, the dyadic EWMA arithmetic, and the
largest-remainder budget identity.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from maxscale_cdc_spark.functions.sample import hash_sample
from maxscale_cdc_spark.tables import table


def test_hash_sample_layout_invariant(spark, sf_dir):
    """The sampled ID SET must not depend on physical layout."""
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    a = set(
        r[0] for r in o.filter(hash_sample("o_orderkey", 13)).collect()
    )
    b = set(
        r[0]
        for r in o.repartition(17)
        .filter(hash_sample("o_orderkey", 13))
        .collect()
    )
    assert a == b and a, "sample set changed under repartition"


def test_hash_sample_consistent_across_tables(spark, sf_dir):
    """The same key must get the same verdict wherever it appears —
    sampled facts keep their sampled dimension rows."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    ).distinct()
    so = set(r[0] for r in o.filter(hash_sample("k", 23)).collect())
    sl = set(r[0] for r in li.filter(hash_sample("k", 23)).collect())
    all_o = set(r[0] for r in o.collect())
    # every sampled lineitem key that exists in orders is sampled there
    assert (sl & all_o) <= so


def test_hash_sample_fraction_sane(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    n = o.count()
    k = o.filter(hash_sample("o_orderkey", 40)).count()
    assert 0.25 * n < k < 0.55 * n, (k, n)


def test_ewma_matches_reference_model(spark, sf_dir):
    """rel_ewma_dyadic == a plain-Python fold over the sorted series,
    per user — the window arithmetic against an independent model."""
    import __spark_entry__ as e

    rows = e.queries()["rel_ewma_dyadic"](spark, sf_dir).collect()
    got = {(r["user_id"], r["event_id"]): (r["ewma_num"], r["ewma_den"], r["ewma_cents"]) for r in rows}
    ev = sorted(
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", F.round(F.col("value") * 100, 0).cast("long").alias("c"))
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    from collections import defaultdict

    hist = defaultdict(list)

    def trunc_div(a: int, b: int) -> int:
        # Spark div() / DuckDB // on BIGINT truncate toward zero;
        # Python's // floors — they differ on negative numerators.
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    for r in ev:
        hist[r["user_id"]].append((r["event_id"], r["c"]))
    checked = 0
    for uid, seq in hist.items():
        for i, (eid, _) in enumerate(seq):
            num = den = 0
            for k in range(8):
                if i - k < 0:
                    break
                w = 1 << (7 - k)
                num += seq[i - k][1] * w
                den += w
            exp = (num, den, trunc_div(num, den))
            assert got[(uid, eid)] == exp, (uid, eid, got[(uid, eid)], exp)
            checked += 1
    assert checked == len(got)


def test_token_budget_sums_exactly(spark, sf_dir):
    """Largest-remainder apportionment: Σ quota == floor(T/2), always."""
    import __spark_entry__ as e

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = e.queries()["llm_token_budget_plan"](spark, sf).collect()
        total = sum(r["n_tokens"] for r in rows)
        assert sum(r["quota"] for r in rows) == total // 2
