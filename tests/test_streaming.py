"""Streaming semantics tests: multi-batch upsert convergence, streaming
session windows, stop/resume via checkpoint (the reference's
Stop()/RequestData-with-GTID lifecycle, client.go:122-181)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from maxscale_cdc_spark.streaming.runners import (
    read_stream,
    run_to_memory,
    stage_as_stream,
    stage_as_stream_ordered,
)
from maxscale_cdc_spark.tables import table


def test_multibatch_upsert_converges(spark, sf_dir):
    """foreachBatch upsert over 2 ordered arrival batches ends at the
    same per-key state as a single batch — idempotent-merge exactly-once.

    The upsert is executor-side: each update-mode micro-batch appends
    its rows stamped with the epoch to a keyed parquet table; the final
    state is last-epoch-wins per key (one window), the same MERGE shape
    `snk_upsert` uses.  No driver collect anywhere in the sink path."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    staged = stage_as_stream_ordered(ev, late=(F.col("event_id") % 3 == 0))
    stream = read_stream(spark, staged, max_files_per_trigger=1)
    agg = stream.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.max("event_id").alias("last_id"),
    )
    state_dir = tempfile.mkdtemp(prefix="upsert_state_")

    def upsert(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(state_dir)

    ckpt = tempfile.mkdtemp(prefix="ckpt_upsert_")
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
    final = (
        spark.read.parquet(state_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    got = {r["user_id"]: (r["n"], r["last_id"]) for r in final.collect()}
    want = {
        r["user_id"]: (r["n"], r["last_id"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("event_id").alias("last_id"))
        .collect()
    }
    assert got == want


def test_streaming_session_window(spark, sf_dir):
    """session_window in a real streaming query (complete mode) matches
    the batch session_window result."""
    ev = table(spark, sf_dir, "events")
    staged = stage_as_stream(ev)
    stream = read_stream(spark, staged)
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"))
    out = run_to_memory(agg, "complete").select(
        "user_id", F.col("w.start").alias("s"), "n"
    )
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_checkpoint_stop_resume(spark, sf_dir):
    """Stop mid-stream, restart from the checkpoint, and verify no event
    is lost or duplicated — query.stop() + checkpoint ≙ the reference's
    Stop()/WithGTID resume contract (client.go:122-126, 166-181)."""
    ev = table(spark, sf_dir, "events")
    staged = stage_as_stream_ordered(ev, late=(F.col("event_id") % 2 == 0))
    ckpt = tempfile.mkdtemp(prefix="ckpt_resume_")
    sink_dir = tempfile.mkdtemp(prefix="resume_sink_")

    def run_once():
        stream = read_stream(spark, staged, max_files_per_trigger=1)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        return q

    # first run: stop after the first micro-batch commits
    q = run_once()
    while not q.recentProgress:
        q.awaitTermination(0.2)
    q.stop()
    # resume: same checkpoint → continues at the recorded offset
    q2 = run_once()
    q2.awaitTermination()
    got = spark.read.parquet(sink_dir)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_update_mode_bucketed_merge_stop_resume(spark, sf_dir):
    """The str_cdc_upsert_e2e sink shape under the reference's
    Stop()/resume contract: an update-mode per-key aggregate MERGEd
    into a bucket-generation parquet target, interrupted after the
    first micro-batch and resumed from the same checkpoint, must end
    at exactly the batch ground-truth state — a replayed micro-batch
    re-asserts the same per-key rows (idempotent MERGE), so restart
    can neither lose nor double-apply keys."""
    from collections import defaultdict
    from functools import reduce

    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    staged = stage_as_stream_ordered(ev, late=(F.col("event_id") % 2 == 0))
    ckpt = tempfile.mkdtemp(prefix="ckpt_merge_resume_")
    root = tempfile.mkdtemp(prefix="merge_tgt_")
    n_buckets = 4
    gen_of: dict[int, str] = {}

    def merge(batch_df, epoch_id):
        new = batch_df.withColumn(
            "b", F.pmod(F.hash("user_id"), F.lit(n_buckets))
        )
        touched = sorted(r["b"] for r in new.select("b").distinct().collect())
        if not touched:
            return
        by_gen = defaultdict(list)
        for b in touched:
            if b in gen_of:
                by_gen[gen_of[b]].append(b)
        olds = [
            spark.read.parquet(g).filter(F.col("b").isin(bs))
            for g, bs in by_gen.items()
        ]
        if olds:
            carried = reduce(lambda a, x: a.unionByName(x), olds).join(
                new.select("user_id"), "user_id", "left_anti"
            )
            merged = carried.unionByName(new)
        else:
            merged = new
        gen_dir = os.path.join(root, f"gen_{epoch_id}")
        merged.write.mode("overwrite").partitionBy("b").parquet(gen_dir)
        for b in touched:
            gen_of[b] = gen_dir

    def run_once():
        stream = read_stream(spark, staged, max_files_per_trigger=1)
        agg = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.max("event_id").alias("last_id")
        )
        return (
            agg.writeStream.outputMode("update")
            .foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = run_once()
    while not q.recentProgress:
        q.awaitTermination(0.2)
    q.stop()
    q2 = run_once()
    q2.awaitTermination()

    by_gen_final = defaultdict(list)
    for b, g in gen_of.items():
        by_gen_final[g].append(b)
    state = reduce(
        lambda a, x: a.unionByName(x),
        [
            spark.read.parquet(g).filter(F.col("b").isin(bs))
            for g, bs in by_gen_final.items()
        ],
    )
    got = {r["user_id"]: (r["n"], r["last_id"]) for r in state.collect()}
    want = {
        r["user_id"]: (r["n"], r["last_id"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("event_id").alias("last_id"))
        .collect()
    }
    assert got == want


def test_multi_table_registry_versions_side_by_side(spark, sf_dir):
    """The r5 verdict's ask: two tables with DIFFERENT schema versions
    materialize correctly side by side — users decodes with v1 (no
    qty), orders with the post-ALTER v2 (qty present, typed long), and
    the registry holds both orders versions."""
    from maxscale_cdc_spark.operators.sources import _render_multi_wire
    from maxscale_cdc_spark.sources.cdc_source import collect_schemas

    dirs = _render_multi_wire(spark, sf_dir)
    raw = spark.read.text(dirs["users"]).union(spark.read.text(dirs["orders"]))
    reg = collect_schemas(raw)
    assert reg.versions("app", "orders") == [1, 2]
    assert reg.versions("app", "users") == [1]
    u_fields = {f.name for f in reg.get("app", "users").payload_fields()}
    o1_fields = {f.name for f in reg.get("app", "orders", 1).payload_fields()}
    o2 = reg.get("app", "orders")
    o2_fields = {f.name: f.spark_type().simpleString() for f in o2.payload_fields()}
    assert u_fields == {"pk", "value"}
    assert o1_fields == {"pk", "value"}
    assert o2.version == 2 and o2_fields["qty"] == "bigint"
    # side-by-side materialization: the registered query's union export
    from maxscale_cdc_spark import registry as r

    r.load_all()
    out = r.QUERIES["src_cdc_multi"](spark, sf_dir).toPandas()
    assert set(out["tbl"]) == {"users", "orders"}
    assert out[out.tbl == "users"]["sum_qty"].isna().all()
    assert out[out.tbl == "orders"]["sum_qty"].notna().all()
    assert (out[out.tbl == "orders"]["schema_version"] == 2).all()
