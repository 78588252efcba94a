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


def test_delete_vectors_read_equals_predicate(spark, sf_dir):
    """The MoR contract: base ANTI JOIN dv must be ROW-IDENTICAL to
    filtering the base with the delete predicate — positions are a
    faithful, predicate-free encoding of the delete set."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.sources import (
        _DV_PRED,
        delete_vector_parts,
    )

    base, dv, _ = delete_vector_parts(spark, sf_dir)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    live_mor = base.join(
        dv.select("fp", "pos"), ["fp", "pos"], "left_anti"
    ).select(*cols)
    live_logical = base.filter(~F.expr(_DV_PRED)).select(*cols)
    assert live_mor.exceptAll(live_logical).count() == 0
    assert live_logical.exceptAll(live_mor).count() == 0


def test_delete_vectors_apply_preserves_live_table(spark, sf_dir):
    """Compaction must not change the logical table: per-bucket
    (n_live, live_cents) identical before and after the rewrite, and
    rewritten buckets carry zero residual DV entries."""
    pre = {
        r["bucket"]: (r["n_live"], r["live_cents"], r["rewrite"])
        for r in _q("snk_delete_vectors", spark, sf_dir).collect()
    }
    post = {
        r["bucket"]: (r["n_live"], r["live_cents"], r["generation"], r["dv_remaining"])
        for r in _q("snk_delete_vectors_apply", spark, sf_dir).collect()
    }
    assert set(post) == {b for b, (n, _, _) in pre.items() if n > 0}
    for b, (n_live, cents, gen, dv_rem) in post.items():
        assert (n_live, cents) == pre[b][:2]
        assert gen == (2 if pre[b][2] else 1)
        if gen == 2:
            assert dv_rem == 0


def test_dpo_pairs_disjoint_capped_margined(spark, sf_dir):
    """Structural rules the oracle hash can't state directly: within a
    source, chosen and rejected sets are disjoint, pair count <= 32,
    and every kept pair clears the 0.15 margin."""
    import collections

    rows = _q("llm_dpo_pair_mining", spark, sf_dir).collect()
    assert rows
    per = collections.defaultdict(lambda: ([], []))
    for r in rows:
        per[r["source"]][0].append(r["chosen_doc"])
        per[r["source"]][1].append(r["rejected_doc"])
        assert r["gap"] >= 0.15 - 1e-12
        assert r["q_chosen"] > r["q_rejected"]
    for src, (ch, rj) in per.items():
        assert len(ch) <= 32
        assert not set(ch) & set(rj), src


def test_span_plan_nonoverlap_in_bounds(spark, sf_dir):
    """Reconstruct every doc's span starts from the published
    recurrence and pin the geometric contract: spans are disjoint
    (gap >= 3), in-bounds, and the checksums match the reconstruction."""
    rows = _q("llm_span_corruption_plan", spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, k_n = r["n_words"], r["n_spans"]
        stride = n // k_n
        starts = [
            (k - 1) * stride
            + ((r["doc_id"] % 1048576) * 2654435761 + (k - 1) * 97)
            % (stride - 2)
            for k in range(1, k_n + 1)
        ]
        assert all(b - a >= 3 for a, b in zip(starts, starts[1:]))
        assert starts[0] >= 0 and starts[-1] + 3 <= n
        assert sum(starts) == r["start_sum"]
        assert sum(k * s for k, s in enumerate(starts, 1)) == r["start_wsum"]
        assert r["n_masked"] == 3 * k_n and r["target_len"] == n - 2 * k_n


def test_kv_prefix_plan_identities(spark, sf_dir):
    """Block-arithmetic identities: savings are non-negative and
    bounded by (n_seqs − 1) · shared_blocks (the sharing upper bound),
    and paged + saved == naive."""
    rows = _q("llm_kv_prefix_cache_plan", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["paged_blocks"] + r["saved_blocks"] == r["naive_blocks"]
        assert 0 <= r["saved_blocks"] <= (r["n_seqs"] - 1) * r["shared_blocks"] + r["n_seqs"]
        assert r["shared_blocks"] == r["prefix_tok"] // 16


def test_binary_hamming_codes_faithful(spark, sf_dir):
    """The packed sign codes must reproduce the float signs exactly:
    unpack lo/hi bit-by-bit and compare against embedding[i] > 0."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    e = table(spark, sf_dir, "embeddings").limit(20)
    pack = lambda a, b, off: F.expr(
        f"aggregate(sequence({a}, {b}), 0L, (acc, i) -> acc + "
        f"CASE WHEN element_at(embedding, i) > 0D THEN shiftleft(1L, i - {off}) "
        f"ELSE 0L END)"
    )
    rows = e.select("embedding", pack(1, 32, 1).alias("lo"), pack(33, 64, 33).alias("hi")).collect()
    assert rows
    for r in rows:
        for i, x in enumerate(r["embedding"]):
            word, bit = (r["lo"], i) if i < 32 else (r["hi"], i - 32)
            assert ((word >> bit) & 1) == (1 if x > 0 else 0)


def test_binary_hamming_recall_bounds(spark, sf_dir):
    rows = _q("llm_ann_binary_hamming", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hit"] == round(r["recall"] * 5)
        assert -1.0 <= r["best_cos"] <= 1.0


def test_pseudonymize_injective_and_join_preserving(spark, sf_dir):
    """The token must be injective on real keys (distinct tokens ==
    distinct custkeys) and the token join must reproduce the key
    join's revenue per nation exactly."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n_keys = c.select("c_custkey").distinct().count()
    got = _q("rel_pseudonymize_consistent", spark, sf_dir)
    assert got.agg(F.sum("n_tokens")).collect()[0][0] == n_keys
    key_rev = {
        r["c_nationkey"]: r["cents"]
        for r in c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
        )
        .collect()
    }
    for r in got.collect():
        assert r["revenue_cents"] == key_rev.get(r["nationkey"], 0)


def test_xdoc_attention_identities(spark, sf_dir):
    """Triangle-number identities: a single-doc pack has zero cross-doc
    pairs; xdoc_pairs < total_pairs always; and the pack token sums
    reconcile with the packer's own output."""
    from pyspark.sql import functions as F

    rows = _q("llm_pack_xdoc_attention", spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["n_docs"] == 1:
            assert r["xdoc_pairs"] == 0
        assert 0 <= r["xdoc_pairs"] < r["total_pairs"]
        L = r["pack_tokens"]
        assert r["total_pairs"] == L * (L + 1) // 2
    packer = (
        _q("llm_pack_sequences", spark, sf_dir)
        .groupBy("lang", "pack_id")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    )
    got = {(r["lang"], r["pack_id"]): r["pack_tokens"] for r in rows}
    assert got == {(r["lang"], r["pack_id"]): r["t"] for r in packer}


def test_expectations_one_scan_plan(spark, sf_dir):
    """The whole suite must cost ONE scan of the fact table: exactly
    one orders parquet scan in the executed plan, and the dim join is
    a broadcast."""
    df = _q("rel_expectations_suite", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") == 1
    assert "BroadcastHashJoin" in plan
    rows = {r["expectation"]: r for r in df.collect()}
    assert set(rows) == {
        "not_null_custkey",
        "unique_orderkey",
        "accepted_status",
        "fk_customer",
        "positive_price",
    }
    for r in rows.values():
        assert r["passed"] == (r["n_failed"] == 0)


def test_centroid_classifier_shares_sum_to_one(spark, sf_dir):
    """Per true label, the confusion-row shares must sum to exactly 1
    (they are integer ratios over the same denominator), and n sums to
    the held-out count."""
    import collections

    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    rows = _q("llm_centroid_classifier", spark, sf_dir).collect()
    assert rows
    per = collections.defaultdict(list)
    for r in rows:
        per[r["label"]].append(r)
    for label, rs in per.items():
        tot = sum(r["n"] for r in rs)
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-9
        for r in rs:
            assert r["share"] == r["n"] / tot
    n_test = (
        table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0).count()
    )
    assert sum(r["n"] for r in rows) == n_test


def test_delete_vector_stream_matches_batch_union(spark, sf_dir):
    """Streamed per-epoch deletes must compose to the batch union
    predicate: per-bucket live counts equal orders minus the union
    delete, and every bucket's epochs count matches its distinct
    touched mods."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.sources import dv_base

    rows = {r["bucket"]: r for r in _q("str_delete_vector_stream", spark, sf_dir).collect()}
    base, _ = dv_base(spark, sf_dir)
    want = {
        r["bucket"]: (r["n_live"], r["n_epochs"])
        for r in base.groupBy("bucket")
        .agg(
            F.sum(((F.col("o_custkey") % 10) >= 3).cast("long")).alias("n_live"),
            F.countDistinct(
                F.when((F.col("o_custkey") % 10) < 3, F.col("o_custkey") % 10)
            ).alias("n_epochs"),
        )
        .collect()
    }
    assert set(rows) == set(want)
    for b, (n_live, n_epochs) in want.items():
        assert rows[b]["n_live"] == n_live
        assert rows[b]["n_delete_epochs"] == n_epochs


def test_mv_rewrite_reads_mv_not_base(spark, sf_dir):
    """The rewrite's certified input cardinality must be the MV's
    (|days|x|types|), orders of magnitude below the base row count."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    rows = _q("rel_mv_rewrite_answer", spark, sf_dir).collect()
    assert rows
    n_base = table(spark, sf_dir, "events").count()
    n_mv_read = sum(r["n_mv_rows_read"] for r in rows)
    n_answered = sum(r["n_rows"] for r in rows)
    assert n_mv_read < n_answered <= n_base


def test_mor_midstream_compaction_state_matches_plain_stream(spark, sf_dir):
    """Compaction concurrent with ingest must be invisible: the
    mid-stream-compacted lane serves exactly the same pk state as the
    never-compacted streaming lane."""
    a = {
        r["pk"]: (r["last_seq"], r["last_value"], r["last_ts_unix"])
        for r in _q("str_mor_compact_midstream", spark, sf_dir).collect()
    }
    b = {
        r["pk"]: (r["last_seq"], r["last_value"], r["last_ts_unix"])
        for r in _q("str_mor_stream", spark, sf_dir).collect()
    }
    assert a == b


def test_prompt_cache_identities(spark, sf_dir):
    rows = _q("llm_prompt_cache_ttl", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_requests"]
        assert r["hit_rate"] == r["n_hits"] / r["n_requests"]
        assert r["saved_prefix_tokens"] == 64 * r["n_hits"]


def test_column_encryption_shred_and_roundtrip(spark, sf_dir):
    """Crypto-shred semantics: nation 0 is unreadable (0 decrypts,
    NULL digest), every other nation decrypts ALL rows and its digest
    matches the plaintext digest recomputed here."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    rows = {r["nationkey"]: r for r in _q("snk_column_encryption", spark, sf_dir).collect()}
    assert rows[0]["n_decrypted"] == 0 and rows[0]["name_digest"] is None
    assert not rows[0]["readable"]
    want = {
        r["c_nationkey"]: r["d"]
        for r in table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("c_custkey", "c_name"))),
                        lambda s: s["c_name"],
                    ),
                )
            ).alias("d")
        )
        .collect()
    }
    for nk, r in rows.items():
        if nk == 0:
            continue
        assert r["readable"] and r["n_decrypted"] == r["n_rows"]
        assert r["name_digest"] == want[nk]


def test_pit_audit_pit_never_leaks(spark, sf_dir):
    """The PIT side must be leak-free by construction: recompute a
    per-label check that pit_ts <= label ts, and pin the window
    formulation against the correlated-subquery definition on a
    sample of users."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    ev = table(spark, sf_dir, "events")
    rows = _q("rel_feature_pit_audit", spark, sf_dir).collect()
    assert rows
    n_labels = sum(r["n_labels"] for r in rows)
    assert n_labels == ev.filter(F.col("event_type") == "purchase").count()
    for r in rows:
        assert 0 <= r["n_naive_leak"] <= r["n_labels"]
        assert r["n_with_feature"] <= r["n_labels"]
        assert r["staleness_sec"] >= 0


def test_moe_capacity_conservation(spark, sf_dir):
    """Routing conservation: Σ slots = 2·|docs|; Σ assigned = 2·Σ
    tokens; drops bounded by assignment; capacity identical across
    experts."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    rows = _q("llm_moe_capacity_plan", spark, sf_dir).collect()
    assert rows and len(rows) <= 8
    d = table(spark, sf_dir, "documents").select(
        F.expr(
            "CAST(aggregate(split(text, ' '), 0L, (acc, x) -> acc + (length(x) + 3) div 4) AS BIGINT)"
        ).alias("n_tok")
    )
    tot = d.agg(F.sum("n_tok").alias("s"), F.count("*").alias("n")).collect()[0]
    assert sum(r["n_docs_routed"] for r in rows) == 2 * tot["n"]
    assert sum(r["assigned_tokens"] for r in rows) == 2 * tot["s"]
    caps = {r["capacity_tokens"] for r in rows}
    assert len(caps) == 1
    for r in rows:
        assert 0 <= r["dropped_tokens"] <= r["assigned_tokens"]


def test_pass_at_k_estimator_identities(spark, sf_dir):
    """pass@4 >= pass@1 (more samples can only help), bounds in [0,1],
    and the estimator matches a math.comb recomputation."""
    import math

    rows = _q("llm_eval_pass_at_k", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["pass1"] <= 1.0
        if r["pass4"] is None:
            assert r["n"] < 4
            continue
        assert r["pass4"] >= r["pass1"] - 1e-12
        n, c = r["n"], r["c"]
        want = 1.0 - math.comb(n - c, 4) / math.comb(n, 4)
        assert abs(r["pass4"] - want) < 1e-12


def test_hll_sketch_partition_invariant(spark, sf_dir):
    """HLL register merges are max-ops: the estimate must be identical
    at 1 and 13 partitions."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    est = lambda df: {
        r["event_type"]: r["e"]
        for r in df.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 8))").alias("e"))
        .collect()
    }
    assert est(ev.coalesce(1)) == est(ev.repartition(13))


def test_watermark_verdict_matches_float_z(spark, sf_dir):
    """The integer verdict must equal the float z>4 test it encodes."""
    import math

    rows = _q("llm_watermark_detect", spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, g = r["n_bigrams"], r["n_green"]
        z = (2 * g - n) / math.sqrt(n)
        assert r["watermark_suspect"] == (z > 4.0 or (z == 4.0 and False))
        assert 0.0 <= r["green_frac"] <= 1.0


def test_dp_bound_conservation(spark, sf_dir):
    """Bounded <= raw; bounded = raw exactly when nobody clamps; and
    per-user kept counts never exceed the sensitivity."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.tables import table

    rows = _q("rel_dp_contribution_bound", spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    raw = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_raw"] == raw[r["event_type"]]
        assert r["n_bounded"] <= r["n_raw"]
        if r["n_users_clamped"] == 0:
            assert r["n_bounded"] == r["n_raw"]
        assert r["sensitivity"] == 8
    mx = (
        ev.groupBy("user_id", "event_type")
        .agg(F.least(F.count("*"), F.lit(8)).alias("kept"))
        .agg(F.sum("kept").alias("s"), F.max("kept").alias("m"))
        .collect()[0]
    )
    assert mx["m"] <= 8
    assert sum(r["n_bounded"] for r in rows) == mx["s"]


def test_tiling_plan_argmin_valid(spark, sf_dir):
    """The chosen grid must be a legal candidate (<= 6 tiles) and be
    the true aspect-ratio argmin under the documented tie-breaks,
    recomputed in Python per doc."""
    from maxscale_cdc_spark.operators.multimodal import _TILE_GRIDS

    rows = _q("mm_tiling_plan", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r["grid_cols"], r["grid_rows"]) in _TILE_GRIDS
        assert r["n_tiles"] == r["grid_cols"] * r["grid_rows"] <= 6
        assert r["vision_tokens"] == (r["n_tiles"] + 1) * 64
        w, h = r["width"], r["height"]
        best = min(
            _TILE_GRIDS,
            key=lambda g: (abs(g[0] * h - g[1] * w) / g[1], -g[0] * g[1], g[0]),
        )
        assert (r["grid_cols"], r["grid_rows"]) == best


def test_retention_conservation_and_policy(spark, sf_dir):
    """before = purged + after; forever-classes purge nothing; every
    purged class's oldest retained second respects its horizon."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.cdc import _RETENTION_DAYS
    from maxscale_cdc_spark.tables import table

    rows = {r["event_type"]: r for r in _q("cdc_retention_policy_apply", spark, sf_dir).collect()}
    assert rows
    now = (
        table(spark, sf_dir, "events")
        .agg(F.max(F.unix_timestamp("ts")))
        .collect()[0][0]
    )
    for t, r in rows.items():
        assert r["n_before"] == r["n_purged"] + r["n_after"]
        days = _RETENTION_DAYS.get(t)
        if days is None:
            assert r["n_purged"] == 0
        elif r["n_after"] > 0:
            assert r["oldest_retained_unix"] >= now - days * 86400


def test_bloom_fpr_monotone_in_m(spark, sf_dir):
    """More bits => no more false positives; maybes cover every true
    member (no false negatives, the Bloom guarantee)."""
    rows = {r["m"]: r for r in _q("rel_bloom_fpr_knob", spark, sf_dir).collect()}
    assert set(rows) == {1024, 4096}
    for r in rows.values():
        assert r["n_false_positive"] == r["n_maybe"] - r["n_true_members"] or (
            r["n_true_members"] == 0 and r["n_false_positive"] == r["n_maybe"]
        )
        assert r["n_bits_set"] <= r["m"]
        assert 0.0 <= r["fpr"] <= 1.0
    assert rows[4096]["n_false_positive"] <= rows[1024]["n_false_positive"]


def test_dv_anti_join_broadcasts_the_index(spark, sf_dir):
    """The MoR serving read must never shuffle the base: the DV side
    builds a broadcast for the anti join (the per-task bitmap-probe
    stand-in)."""
    from maxscale_cdc_spark.operators.sources import delete_vector_parts

    base, dv, _ = delete_vector_parts(spark, sf_dir)
    live = base.join(dv.select("fp", "pos"), ["fp", "pos"], "left_anti")
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_grpo_advantage_zero_sum_and_rank(spark, sf_dir):
    """Per group: advantages sum to zero exactly; ranks are a
    permutation; adv_num ordering agrees with r_micro ordering."""
    import collections

    rows = _q("llm_grpo_advantage", spark, sf_dir).collect()
    assert rows
    per = collections.defaultdict(list)
    for r in rows:
        per[r["task"]].append(r)
    for task, rs in per.items():
        assert sum(r["adv_num"] for r in rs) == 0
        assert sorted(r["rank_in_group"] for r in rs) == list(range(1, len(rs) + 1))
        rs.sort(key=lambda r: r["rank_in_group"])
        for a, b in zip(rs, rs[1:]):
            assert a["adv_num"] >= b["adv_num"]


def test_two_sink_fanout_state_matches_mor_stream(spark, sf_dir):
    """Cross-lane pin: the fan-out's agreed state equals the MoR
    streaming lane's reconciled state (same spool, same contract)."""
    a = {
        r["pk"]: (r["last_seq"], r["last_value"], r["last_ts_unix"])
        for r in _q("str_two_sink_fanout", spark, sf_dir).collect()
    }
    b = {
        r["pk"]: (r["last_seq"], r["last_value"], r["last_ts_unix"])
        for r in _q("str_mor_stream", spark, sf_dir).collect()
    }
    assert a == b
