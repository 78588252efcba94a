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
