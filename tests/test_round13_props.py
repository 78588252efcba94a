"""Round-13 property tests: cross-operator pins the oracle hash can't
state — the MoR compaction PLAN against the compaction snk_upsert_mor
actually performs, the α-sweep's flattening monotonicity, and the e2e
lifecycle's consistency with its standalone legs."""

from __future__ import annotations

import __spark_entry__ as entrymod


def _q(name, spark, sf_dir):
    return entrymod.queries()[name](spark, sf_dir)


def test_mor_compact_plan_live_matches_actual_compaction(spark, sf_dir):
    """Cross-pin: the plan's per-bucket n_live must equal the state
    snk_upsert_mor's ACTUAL compaction produces (grouped by the same
    pk % 8 buckets) — the plan is only a plan if applying it lands on
    the measured layout."""
    from pyspark.sql import functions as F

    plan = {
        r["bucket"]: r["n_live"]
        for r in _q("snk_upsert_mor_compact_plan", spark, sf_dir).collect()
    }
    compacted = _q("snk_upsert_mor", spark, sf_dir)
    actual = {
        r["bucket"]: r["n"]
        for r in compacted.groupBy((F.col("pk") % 8).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for b, n_live in plan.items():
        assert actual.get(b, 0) == n_live, (b, n_live, actual.get(b, 0))
    assert set(actual) <= set(plan)


def test_mor_compact_plan_rules_are_internally_consistent(spark, sf_dir):
    """Integer rules: dead = data - live; eligibility is the exact
    cross-multiplied 30% threshold; chosen = top-K of the eligible by
    (dead DESC, bucket); pick ranks are 1..E with no gaps."""
    rows = _q("snk_upsert_mor_compact_plan", spark, sf_dir).collect()
    for r in rows:
        assert r["n_dead"] == r["n_data_rows"] - r["n_live"]
        assert r["eligible"] == (
            r["n_data_rows"] > 0 and r["n_dead"] * 10 >= r["n_data_rows"] * 3
        )
        if r["n_data_rows"] > 0:
            assert r["dead_permille"] == r["n_dead"] * 1000 // r["n_data_rows"]
    eligible = sorted(
        (r for r in rows if r["eligible"]),
        key=lambda r: (-r["n_dead"], r["bucket"]),
    )
    assert [r["pick_rank"] for r in eligible] == list(
        range(1, len(eligible) + 1)
    )
    chosen = {r["bucket"] for r in rows if r["chosen"]}
    assert chosen == {r["bucket"] for r in eligible[:3]}
    assert all(r["pick_rank"] == 0 for r in rows if not r["eligible"])


def test_alpha_sweep_flattens_monotonically(spark, sf_dir):
    """Lower α must flatten harder: the max quota share (the biggest
    source's grab) is non-increasing from α=1 → 1/2 → 1/4, and the
    α=1 plan is proportional (quota ≈ n_docs/2 within the
    largest-remainder unit).  Repetition pressure is monotone the
    other way: n_repeated_sources is non-decreasing as α drops."""
    rows = _q("llm_mixture_alpha_sweep", spark, sf_dir).collect()
    by_alpha: dict[str, list] = {}
    for r in rows:
        by_alpha.setdefault(r["alpha"], []).append(r)
    assert set(by_alpha) == {"1", "1/2", "1/4"}
    budget = {a: sum(r["quota"] for r in rs) for a, rs in by_alpha.items()}
    # Hamilton: Σ quota == B exactly, the SAME B at every α
    assert len(set(budget.values())) == 1
    b = next(iter(budget.values()))
    max_share = {a: max(r["quota"] for r in rs) for a, rs in by_alpha.items()}
    assert max_share["1"] >= max_share["1/2"] >= max_share["1/4"]
    n_rep = {a: rs[0]["n_repeated_sources"] for a, rs in by_alpha.items()}
    assert n_rep["1"] <= n_rep["1/2"] <= n_rep["1/4"]
    assert n_rep["1"] == 0  # α=1 never over-asks a source (quota ≤ n/2 + 1)
    for r in by_alpha["1"]:  # α=1 is the proportional plan
        assert abs(r["quota"] - r["n_docs"] / 2) <= 1.5


def test_e2e_native_state_matches_standalone_upsert(spark, sf_dir):
    """The composed lifecycle's serving state must equal the
    standalone streaming-upsert op's state on (pk, last_seq,
    last_ts_unix) — same log, same total order, different transport
    and landing path."""
    e2e = {
        (r["pk"], r["last_seq"], r["last_ts_unix"])
        for r in _q("str_cdc_e2e_native", spark, sf_dir).collect()
    }
    ref = {
        (r["pk"], r["last_seq"], r["last_ts_unix"])
        for r in _q("str_cdc_upsert_e2e", spark, sf_dir).collect()
    }
    assert e2e == ref


def test_mor_triangle_states_agree(spark, sf_dir):
    """The MoR lifecycle triangle: batch ingest (snk_upsert_mor),
    streaming ingest (str_mor_stream), and partial compaction
    (snk_upsert_mor_compact_apply) must all serve the SAME latest
    state on (pk, last_seq, last_ts_unix)."""
    batch = {
        (r["pk"], r["last_seq"], r["last_ts_unix"])
        for r in _q("snk_upsert_mor", spark, sf_dir).collect()
    }
    stream = {
        (r["pk"], r["last_seq"], r["last_ts_unix"])
        for r in _q("str_mor_stream", spark, sf_dir).collect()
    }
    hybrid = {
        (r["pk"], r["last_seq"], r["last_ts_unix"])
        for r in _q("snk_upsert_mor_compact_apply", spark, sf_dir).collect()
    }
    assert batch == stream == hybrid


def test_mor_compact_apply_matches_plan(spark, sf_dir):
    """The apply's audit columns must equal what the PLAN said it
    would do: K chosen buckets, exactly their tombstones dropped."""
    plan = _q("snk_upsert_mor_compact_plan", spark, sf_dir).collect()
    chosen = [r for r in plan if r["chosen"]]
    row = _q("snk_upsert_mor_compact_apply", spark, sf_dir).limit(1).collect()[0]
    assert row["n_compacted_buckets"] == len(chosen)
    assert row["n_dropped_tombstones"] == sum(
        r["n_tombstones"] for r in chosen
    )
    assert row["compaction_exact"]


def test_filtered_search_predicate_and_audit_sound(spark, sf_dir):
    """Every returned candidate must satisfy the predicate (query's
    label), ranks are 1..5, and the in_exact_topk audit marks exactly
    the members of the brute-force FILTERED top-5."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.functions.vectors import as_double, cosine
    from maxscale_cdc_spark.tables import table

    rows = _q("llm_ann_filtered_search", spark, sf_dir).collect()
    assert [r["rk"] for r in sorted(rows, key=lambda r: r["rk"])] == list(
        range(1, len(rows) + 1)
    )
    e = table(spark, sf_dir, "embeddings")
    qlabel = e.filter(F.col("vec_id") == 0).collect()[0]["label"]
    labels = {
        r["vec_id"]: r["label"]
        for r in e.select("vec_id", "label").collect()
    }
    assert all(labels[r["vec_id"]] == qlabel for r in rows)
    q = e.filter(F.col("vec_id") == 0).select(
        as_double("embedding").alias("qv")
    )
    exact5 = {
        r["vec_id"]
        for r in e.filter((F.col("label") == qlabel) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", cosine(as_double("embedding"), F.col("qv")).alias("c")
        )
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(5)
        .collect()
    }
    for r in rows:
        assert r["in_exact_topk"] == (r["vec_id"] in exact5)


def test_rank_fusion_is_consistent(spark, sf_dir):
    """Borda arithmetic and per-probe rank shape: borda = rank_lex +
    rank_vec, fused ranks are 1..5 per probe, and the fused list is
    ordered by (borda, doc_id)."""
    rows = _q("llm_rag_rank_fusion", spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        assert r["borda"] == r["rank_lex"] + r["rank_vec"]
        assert r["overlap"] >= 1
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == {0, 1}
    for rs in by_probe.values():
        rs.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(r["borda"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_matryoshka_shape_and_audit_bounds(spark, sf_dir):
    """Per truncation level: ranks are 1..5, cosines in [-1, 1], and
    the audit never claims more than 5 full-dim hits."""
    rows = _q("llm_embedding_matryoshka", spark, sf_dir).collect()
    by_d: dict[int, list] = {}
    for r in rows:
        assert -1.0 <= r["cos_trunc"] <= 1.0
        by_d.setdefault(r["dims"], []).append(r)
    assert set(by_d) == {16, 32}
    for rs in by_d.values():
        assert sorted(r["rk"] for r in rs) == [1, 2, 3, 4, 5]
        assert sum(1 for r in rs if r["in_full_topk"]) <= 5


def test_epoch_schedule_apportions_quota_exactly(spark, sf_dir):
    """Per source: Σ round takes == the α=1/2 quota exactly, takes
    differ by ≤1, `repeating` is monotone in round and agrees with
    the sweep's needs_repetition at the final round."""
    sched = _q("llm_mixture_epoch_schedule", spark, sf_dir).collect()
    sweep = {
        r["source"]: r
        for r in _q("llm_mixture_alpha_sweep", spark, sf_dir).collect()
        if r["alpha"] == "1/2"
    }
    by_src: dict[str, list] = {}
    for r in sched:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["round"])
        takes = [r["take"] for r in rs]
        assert sum(takes) == rs[0]["quota"] == sweep[src]["quota"]
        assert max(takes) - min(takes) <= 1
        flags = [r["repeating"] for r in rs]
        assert flags == sorted(flags)  # once repeating, always repeating
        assert flags[-1] == sweep[src]["needs_repetition"]


def test_context_pack_is_greedy_prefix(spark, sf_dir):
    """Packing rule: included iff the running total through this rank
    fits the budget; once over budget, never included again; the
    summary equals the recount."""
    rows = _q("llm_rag_context_pack", spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for rs in by_probe.values():
        rs.sort(key=lambda r: r["fused_rank"])
        cum = 0
        for r in rs:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
            assert r["included"] == (cum <= 512)
        flags = [r["included"] for r in rs]
        assert flags == sorted(flags, reverse=True)  # prefix property
        shown_inc = [r for r in rs if r["included"]]
        assert rs[0]["n_included"] >= len(shown_inc)  # summary counts ALL ranks
        assert all(r["n_included"] == rs[0]["n_included"] for r in rs)


def test_backfill_apply_matches_plan_chunks(spark, sf_dir):
    """Every exported row's chunk_id must agree with the PLAN's range
    for that pk, and per-chunk row counts never exceed the plan's
    n_keys (deleted-final pks are the only shortfall)."""
    plan = {
        r["chunk_id"]: r
        for r in _q("cdc_backfill_chunk_plan", spark, sf_dir).collect()
    }
    rows = _q("cdc_backfill_chunk_apply", spark, sf_dir).collect()
    from collections import Counter

    per_chunk = Counter()
    for r in rows:
        p = plan[r["chunk_id"]]
        assert p["lo_pk"] <= r["pk"] <= p["hi_pk"], (r["pk"], r["chunk_id"])
        per_chunk[r["chunk_id"]] += 1
    for cid, n in per_chunk.items():
        assert n <= plan[cid]["n_keys"], (cid, n, plan[cid]["n_keys"])
