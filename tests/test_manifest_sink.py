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
