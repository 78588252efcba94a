"""Streaming observability tests: progress metrics surface real batch
counts, row totals, watermark, and state size."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from maxscale_cdc_spark.streaming.monitor import progress_frame, summarize
from maxscale_cdc_spark.streaming.runners import read_stream, stage_as_stream
from maxscale_cdc_spark.tables import table


def test_progress_metrics(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    staged = stage_as_stream(ev, n_files=3)
    stream = read_stream(spark, staged, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="mon_ckpt_")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("mon_test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pf = progress_frame(spark, q)
    rows = pf.collect()
    assert len(rows) >= 3  # one per staged file
    assert sum(r["num_input_rows"] for r in rows) == ev.count()
    s = summarize(pf).collect()[0]
    assert s["total_rows"] == ev.count()
    assert s["max_state_rows"] > 0  # windowed agg keeps state
    assert s["last_watermark"] is not None  # watermark advanced
