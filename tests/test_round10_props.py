"""Round-10 property tests: cross-operator consistency the oracle
hash can't state — the drift-reindex closure must agree with the
registered signals it composes, and its surgery must conserve the
corpus."""

from __future__ import annotations

import __spark_entry__ as entrymod


def _q(name, spark, sf_dir):
    return entrymod.queries()[name](spark, sf_dir)


def test_drift_reindex_composes_registered_signals(spark, sf_dir):
    """action == 'recluster' exactly where llm_ivf_incremental exports
    recluster_needed — the closure consumes the registered flag, it
    does not invent its own cell rule."""
    plan = {
        r["cid"]: r["action"]
        for r in _q("llm_drift_reindex_apply", spark, sf_dir).collect()
    }
    incr = {
        r["cid"]: bool(r["recluster_needed"])
        for r in _q("llm_ivf_incremental", spark, sf_dir).collect()
    }
    for cid, needed in incr.items():
        assert (plan[cid] == "recluster") == needed, (cid, plan[cid], needed)


def test_drift_reindex_conserves_vectors(spark, sf_dir):
    """Post-action membership is a partition of the corpus and the
    audit columns are constant across rows."""
    import duckdb

    rows = _q("llm_drift_reindex_apply", spark, sf_dir).collect()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r["n_members"] for r in rows) == n_vecs
    cids = [r["cid"] for r in rows]
    assert len(cids) == len(set(cids))
    assert len({(r["recall_pre_num"], r["recall_post_num"], r["recall_den"],
                 r["dims_drifted"]) for r in rows}) == 1


def test_ann_mmr_agrees_with_mmr_on_shared_queries(spark, sf_dir):
    """Where the ANN-routed candidate pool contains the brute-force
    MMR's first pick (rank 1 = global max relevance in the pool), the
    two ops' rank-1 rel_u can differ only if ANN routing pruned the
    global argmax out of the pool — i.e. ann rel_u <= brute rel_u
    always, for every query both ops emit."""
    ann = {
        (r["qid"], r["rk"]): r["rel_u"]
        for r in _q("llm_ann_mmr_e2e", spark, sf_dir).collect()
    }
    brute = {
        (r["qid"], r["rk"]): r["rel_u"]
        for r in _q("llm_mmr_rerank", spark, sf_dir).collect()
    }
    shared = {k for k in ann if k[1] == 1} & {k for k in brute if k[1] == 1}
    assert shared
    for k in shared:
        assert ann[k] <= brute[k], (k, ann[k], brute[k])


def test_store_migrate_crosses_chooser_breakpoint(spark, sf_dir):
    """A store written under a DIFFERENT config than the chooser's
    measured one (8x2 vs the measured pick — the breakpoint-crossing
    case) must detect drift, and the migrated (chosen-side) result
    must be identical to migrating the legacy store: the re-band
    projection fully determines the chosen-config output, independent
    of what config the store was written at."""
    from maxscale_cdc_spark.operators.autotune import _store_migrate_frame

    base = _store_migrate_frame(spark, sf_dir).collect()[0]
    crossed = _store_migrate_frame(spark, sf_dir, stored_cfg=(8, 2)).collect()[0]
    assert crossed["config_drifted"]
    assert crossed["stored_bands"] == 8 and crossed["stored_rows"] == 2
    assert crossed["n_pairs_chosen"] == base["n_pairs_chosen"]
    assert crossed["n_store_classes"] == base["n_store_classes"]
    # ledger identity: chosen − stored == gained − lost, in both runs
    for r in (base, crossed):
        assert (
            r["n_pairs_chosen"] - r["n_pairs_stored"]
            == r["n_gained"] - r["n_lost"]
        ), r


def test_store_migrate_matches_registered_incremental(spark, sf_dir):
    """n_pairs_chosen == the registered llm_dedup_incremental's pair
    count: the migrated store reproduces the from-scratch batch dedup
    exactly (the certification the migration exists for)."""
    mig = _q("llm_dedup_store_migrate", spark, sf_dir).collect()[0]
    incr = _q("llm_dedup_incremental", spark, sf_dir).count()
    assert mig["n_pairs_chosen"] == incr, (mig["n_pairs_chosen"], incr)


def test_replay_idempotence_holds(spark, sf_dir):
    """The materialization must be a function of the event SET: the
    audit's own idempotent flag is the property, assert it directly."""
    row = _q("cdc_replay_idempotence", spark, sf_dir).collect()[0]
    assert row["idempotent"]
    assert row["n_delivered_events"] > row["n_base_events"]


def test_containment_sampled_sees_asymmetric_pairs(spark, tmp_path):
    """The driver corpora contain almost no containment-ONLY pairs
    (BASELINE.md round-10 honesty note), so exercise the
    jacc_missed=true bucket on a constructed corpus: a short document
    embedded VERBATIM in a much longer one has containment 1.0 but
    Jaccard « 0.5 — the sampled audit must (a) count it in the
    asymmetric bucket and (b) report the banding family's catch rate
    on it honestly (identical prefixes do NOT imply banding
    collision)."""
    import duckdb

    words = [f"w{i:03d}" for i in range(400)]
    docs = []
    # 30 filler docs with disjoint vocabularies (no cross pairs);
    # every doc_id here passes the 40% md5 hash-sample predicate
    # (functions/sample.py) so the whole corpus IS the sample
    fillers = [2, 3, 4, 7, 10, 15, 16, 17, 22, 29, 31, 32, 33, 34, 36,
               39, 43, 44, 45, 46, 48, 50, 52, 53, 54, 56, 57, 59, 60, 62]
    for d in fillers:
        toks = [f"f{d}_{i}" for i in range(40)]
        docs.append((d, " ".join(toks)))
    # the asymmetric pair (ids 202/205 are in-sample): doc 202 (12
    # words) verbatim inside doc 205 (400 words) → trigram containment
    # 1.0, Jaccard ≈ 10/398 « 0.5
    short = " ".join(words[:12])
    long = " ".join(words)
    docs.append((202, short))
    docs.append((205, long))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, ?)" for i, _ in docs) + ") t(doc_id, text)",
                [t for _, t in docs])
    con.execute(
        "COPY (SELECT doc_id, text, 'en' AS lang, 'test' AS source, "
        "length(text) AS n_chars FROM documents) TO "
        f"'{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )
    rows = _q("llm_dedup_containment_sampled", spark, str(tmp_path)).collect()
    by_bucket = {bool(r["jacc_missed"]): r for r in rows}
    assert True in by_bucket, rows  # the asymmetric bucket exists
    asym = by_bucket[True]
    assert asym["n_pairs"] >= 1
    # catch rate is a well-formed ratio over the bucket
    assert 0.0 <= asym["catch_rate"] <= 1.0


def test_manifest_gc_survivors_serve_reads(spark, sf_dir):
    """After GC the retained generation serves the full state and the
    ledger shows real collection happened."""
    rows = _q("snk_manifest_gc", spark, sf_dir).collect()
    assert rows
    r = rows[0]
    assert r["n_dirs_deleted"] >= 1
    assert r["n_dirs_retained"] >= 1
    assert r["n_manifests_retained"] == 1


def test_rep_apply_matches_rep_policy_pricing(spark, sf_dir):
    """The materialized 'longest' dedup must carry exactly the token
    mass llm_dedup_rep_policy priced for that policy: kept_tokens of
    clustered docs = the policy row's kept_tokens, removed = removed."""
    pol = {
        r["policy"]: r for r in _q("llm_dedup_rep_policy", spark, sf_dir).collect()
    }["longest"]
    app = _q("llm_dedup_rep_apply", spark, sf_dir).collect()
    removed_tokens = sum(r["removed_tokens"] for r in app)
    assert removed_tokens == pol["removed_tokens"], (
        removed_tokens, pol["removed_tokens"],
    )
    assert sum(r["n_removed"] for r in app) > 0
