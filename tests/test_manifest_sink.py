"""ManifestedUpsertSink unit tests — the crash windows the class
docstring analyzes, exercised directly: manifest recovery, the two
crash positions relative to the manifest write, replay idempotency,
and compaction GC (superseded dirs really are dead: deleting them must
not change the state read through the compacted manifest).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from maxscale_cdc_spark.streaming.ops import ManifestedUpsertSink


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "pk bigint, last_seq bigint, last_dml string, last_value double"
    )


def _state_dict(sink):
    st = sink.state()
    if st is None:
        return {}
    return {
        r["pk"]: (r["last_seq"], r["last_dml"], r["last_value"])
        for r in st.collect()
    }


def test_manifest_recovery_equals_live_state(spark):
    root = tempfile.mkdtemp(prefix="msink_")
    s1 = ManifestedUpsertSink(spark, root, n_buckets=4)
    s1.merge(_batch(spark, [(1, 10, "insert", 1.0), (2, 11, "insert", 2.0)]), 0)
    s1.merge(_batch(spark, [(2, 12, "update_after", 2.5), (3, 13, "insert", 3.0)]), 1)
    live = _state_dict(s1)
    # "process restart": a fresh object over the same root
    s2 = ManifestedUpsertSink(spark, root, n_buckets=4)
    assert s2.gen_of == s1.gen_of
    assert _state_dict(s2) == live
    assert live[2] == (12, "update_after", 2.5)  # replaced, not duplicated
    shutil.rmtree(root)


def test_crash_before_manifest_write_recovers_pre_batch(spark):
    """A generation dir written WITHOUT its manifest publish (crash in
    the window between the two) must be invisible to recovery."""
    root = tempfile.mkdtemp(prefix="msink_")
    s1 = ManifestedUpsertSink(spark, root, n_buckets=4)
    s1.merge(_batch(spark, [(1, 10, "insert", 1.0)]), 0)
    pre = dict(s1.gen_of)
    # simulate the crash: the epoch-1 generation lands on disk but the
    # process dies before _persist()
    orphan = os.path.join(root, "gen_1_deadbeef")
    _batch(spark, [(1, 99, "update_after", 9.9)]).withColumn(
        "b", F.pmod(F.hash("pk"), F.lit(4))
    ).write.mode("overwrite").partitionBy("b").parquet(orphan)
    s2 = ManifestedUpsertSink(spark, root, n_buckets=4)
    assert s2.gen_of == pre  # orphan never referenced
    assert _state_dict(s2)[1] == (10, "insert", 1.0)
    shutil.rmtree(root)


def test_replay_after_manifest_write_is_idempotent(spark):
    """Crash AFTER the manifest publish but BEFORE the checkpoint
    commit replays the same batch onto post-batch state — replace-by-pk
    makes that a no-op."""
    root = tempfile.mkdtemp(prefix="msink_")
    s1 = ManifestedUpsertSink(spark, root, n_buckets=4)
    s1.merge(_batch(spark, [(1, 10, "insert", 1.0), (2, 11, "insert", 2.0)]), 0)
    batch = [(2, 12, "update_after", 2.5), (3, 13, "insert", 3.0)]
    s1.merge(_batch(spark, batch), 1)
    after_first = _state_dict(s1)
    # the replay: a recovered sink re-merges the SAME epoch-1 batch
    s2 = ManifestedUpsertSink(spark, root, n_buckets=4)
    s2.merge(_batch(spark, batch), 1)
    assert _state_dict(s2) == after_first
    shutil.rmtree(root)


def test_compact_gc_dirs_are_dead(spark):
    """After compact(), deleting every returned GC dir must not change
    the state read through the compacted manifest."""
    root = tempfile.mkdtemp(prefix="msink_")
    s = ManifestedUpsertSink(spark, root, n_buckets=4)
    for i in range(3):
        s.merge(
            _batch(spark, [(i, 10 + i, "insert", float(i)), (9, 50 + i, "update_after", 9.0 + i)]),
            i,
        )
    before = _state_dict(s)
    gc = s.compact()
    assert gc, "multi-epoch merges should orphan generations"
    assert len(set(s.gen_of.values())) == 1
    for d in gc:
        shutil.rmtree(d)
    assert _state_dict(s) == before
    # and a fresh recovery sees the compacted world
    s2 = ManifestedUpsertSink(spark, root, n_buckets=4)
    assert _state_dict(s2) == before
    shutil.rmtree(root)


def test_manifest_retention_truncates_log(spark):
    """The commit log keeps only the newest `retain_manifests` files:
    merging more epochs than the retention window must leave exactly
    `retain` manifest files, the newest of them current."""
    root = tempfile.mkdtemp(prefix="msink_")
    s = ManifestedUpsertSink(spark, root, n_buckets=4, retain_manifests=3)
    for i in range(6):
        s.merge(_batch(spark, [(i, 10 + i, "insert", float(i))]), i)
    names = s._manifest_names()
    assert len(names) == 3
    # sequence numbering continues across truncation (highest = 6th merge)
    assert names[-1] == "manifest_00000005.json"
    shutil.rmtree(root)


def test_recovery_after_truncation(spark):
    """A fresh sink over a truncated log must recover the full state:
    recovery only needs the newest manifest, and merge sequence numbers
    keep ascending after a restart over a truncated log."""
    root = tempfile.mkdtemp(prefix="msink_")
    s1 = ManifestedUpsertSink(spark, root, n_buckets=4, retain_manifests=2)
    for i in range(5):
        s1.merge(
            _batch(spark, [(i, 10 + i, "insert", float(i)), (9, 50 + i, "update_after", 9.0 + i)]),
            i,
        )
    live = _state_dict(s1)
    assert len(s1._manifest_names()) == 2
    # process restart over the truncated log
    s2 = ManifestedUpsertSink(spark, root, n_buckets=4, retain_manifests=2)
    assert _state_dict(s2) == live
    assert live[9] == (54, "update_after", 13.0)
    # post-restart merges keep publishing monotonically increasing seqs
    s2.merge(_batch(spark, [(9, 60, "update_after", 20.0)]), 5)
    assert s2._manifest_names()[-1] == "manifest_00000005.json"
    assert _state_dict(s2)[9] == (60, "update_after", 20.0)
    shutil.rmtree(root)


# ---------------------------------------------------------------------------
# Scd2HistorySink — interval-maintenance recovery semantics
# ---------------------------------------------------------------------------


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, value, ts_str)"""
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, value double, ts_ts string"
    )
    return df.select(
        "event_id", "user_id", "event_type", "value",
        F.to_timestamp("ts_ts").alias("ts"),
    )


def _hist_dict(sink):
    return {
        (r["pk"], r["sequence"]): (r["valid_from"], r["valid_to"])
        for r in sink.history().collect()
    }


def test_scd2_sink_recovery_and_cross_boundary_close(spark):
    """An open interval installed before 'process death' must be closed
    by the first post-restart image — through a FRESH sink object."""
    from maxscale_cdc_spark.streaming.ops import Scd2HistorySink

    root = tempfile.mkdtemp(prefix="scd2sink_")
    s1 = Scd2HistorySink(spark, root)
    s1.merge(
        _events(spark, [(1, 7, "signup", 1.0, "2024-01-01 00:00:10"),
                        (2, 7, "click", 2.0, "2024-01-01 00:01:10")]),
        0,
    )
    h1 = _hist_dict(s1)
    assert h1[(7, 1)][1] is not None and h1[(7, 2)][1] is None
    del s1  # process death

    s2 = Scd2HistorySink(spark, root)
    assert _hist_dict(s2) == h1  # pure disk recovery
    s2.merge(
        _events(spark, [(3, 7, "purchase", 3.0, "2024-01-01 00:02:10")]), 1
    )
    h2 = _hist_dict(s2)
    # the pre-crash open row (seq 2) closed at seq 3's timestamp
    assert h2[(7, 2)][1] == h2[(7, 3)][0]
    assert h2[(7, 3)][1] is None
    shutil.rmtree(root)


def test_scd2_sink_replay_guard(spark):
    """Re-delivering the same batch must not re-close the open rows it
    itself installed (history unchanged after replay + distinct)."""
    from maxscale_cdc_spark.streaming.ops import Scd2HistorySink

    root = tempfile.mkdtemp(prefix="scd2sink_")
    s = Scd2HistorySink(spark, root)
    batch = _events(spark, [(1, 9, "signup", 1.0, "2024-01-01 00:00:10"),
                            (2, 9, "click", 2.0, "2024-01-01 00:03:10")])
    s.merge(batch, 0)
    before = _hist_dict(s)
    s.merge(batch, 0)  # the crash-replay
    assert _hist_dict(s) == before
    shutil.rmtree(root)


def test_scd2_closed_log_compaction_preserves_history(spark):
    """compact_closed() rewrites the append log to one file with the
    history unchanged; the crash window (compacted rows appended, old
    files NOT yet deleted) is also a valid log — duplicates are
    absorbed by history()'s distinct."""
    import os

    from maxscale_cdc_spark.streaming.ops import Scd2HistorySink

    root = tempfile.mkdtemp(prefix="scd2sink_")
    s = Scd2HistorySink(spark, root)
    for i, t0 in enumerate(["00:00:10", "00:01:10", "00:02:10"]):
        s.merge(
            _events(spark, [(2 * i + 1, 7, "signup", float(i), f"2024-01-01 {t0}"),
                            (2 * i + 2, 8, "click", float(i), f"2024-01-01 {t0}")]),
            i,
        )
    before = _hist_dict(s)
    n_files0 = sum(1 for n in os.listdir(s.closed_dir) if n.endswith(".parquet"))
    assert n_files0 > 1
    # the crash window: compacted rows present ALONGSIDE old files
    compacted = (
        spark.read.parquet(s.closed_dir)
        .select("pk", "sequence", "value", "valid_from", "valid_to")
        .distinct()
        .localCheckpoint(eager=True)
    )
    compacted.coalesce(1).write.mode("append").parquet(s.closed_dir)
    assert _hist_dict(s) == before  # duplicates absorbed
    # the real compaction from that state
    nb, na = s.compact_closed()
    assert na == 1 and nb > 1
    assert _hist_dict(s) == before
    # recovery through the compacted log
    s2 = Scd2HistorySink(spark, root)
    assert _hist_dict(s2) == before
    shutil.rmtree(root)


def test_scd2_sink_ignores_delete_events(spark):
    """view (update_before) and other (delete) event types carry no
    image — they must not open or close intervals."""
    from maxscale_cdc_spark.streaming.ops import Scd2HistorySink

    root = tempfile.mkdtemp(prefix="scd2sink_")
    s = Scd2HistorySink(spark, root)
    s.merge(
        _events(spark, [(1, 5, "signup", 1.0, "2024-01-01 00:00:10"),
                        (2, 5, "other", 0.0, "2024-01-01 00:01:10"),
                        (3, 5, "view", 0.0, "2024-01-01 00:02:10")]),
        0,
    )
    h = _hist_dict(s)
    assert set(h) == {(5, 1)} and h[(5, 1)][1] is None
    shutil.rmtree(root)


def test_read_gen_schema_drift_raises(spark):
    """r15 drift guard: the cached-read-schema fast path must FAIL
    LOUDLY if a post-capture generation dir carries a different schema
    (an explicit read schema would otherwise silently null-fill /
    drop the drifted column — VERDICT r14 #4)."""
    import pytest

    root = tempfile.mkdtemp(prefix="msink_drift_")
    s = ManifestedUpsertSink(spark, root, n_buckets=4)
    s.merge(_batch(spark, [(1, 10, "insert", 1.0)]), 0)
    s.state().collect()  # captures _gen_schema from the r0 generation
    # forge a drifted generation dir and point one bucket at it
    bad_dir = os.path.join(root, "gen_forged_drift")
    spark.createDataFrame(
        [(1, 99, 0)], "pk bigint, last_seq bigint, b int"
    ).write.mode("overwrite").partitionBy("b").parquet(bad_dir)
    with pytest.raises(RuntimeError, match="schema drifted"):
        s._read_gen(bad_dir).collect()
    shutil.rmtree(root)


def test_read_gen_same_schema_gen_passes_drift_check(spark):
    """The one-time drift check must PASS (and stop re-inferring) when
    later generations carry the captured schema — the optimized path."""
    root = tempfile.mkdtemp(prefix="msink_nodrift_")
    s = ManifestedUpsertSink(spark, root, n_buckets=4)
    s.merge(_batch(spark, [(1, 10, "insert", 1.0)]), 0)
    s.merge(_batch(spark, [(2, 11, "insert", 2.0)]), 1)
    s.merge(_batch(spark, [(1, 12, "update_after", 1.5)]), 2)
    assert _state_dict(s) == {
        1: (12, "update_after", 1.5),
        2: (11, "insert", 2.0),
    }
    # state() read a post-capture generation dir → the check ran once
    assert s._gen_schema_checked
    assert _state_dict(s) == {
        1: (12, "update_after", 1.5),
        2: (11, "insert", 2.0),
    }
    shutil.rmtree(root)
