"""CDC wire-format source tests — modeled on the reference's integration
suite (client_test.go): golden event decode, resume-from-GTID, tolerated
error lines, oversize guard, update pairs, schema evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from maxscale_cdc_spark.operators.cdc import latest_state
from maxscale_cdc_spark.sources.cdc_source import (
    classify_lines,
    dead_letters,
    read_cdc_lines,
    read_cdc_stream,
    render_ddl_line,
    render_dml_line,
    write_stream_files,
)
from maxscale_cdc_spark.sources.schema_registry import SchemaRegistry


def _fixture_lines() -> list[str]:
    """The reference fixture: tests(id int pk), two inserts
    (docker/sql/init_test_db.sql:15-21 → client_test.go:152-166),
    then an update pair and a delete, plus an ERR line."""
    ddl = render_ddl_line("test", "tests", 1, "0-3000-6", [("id", "int"), ("val", "double")])
    lines = [
        "ERR no schema yet",  # tolerated pre-schema error (client.go:261-267)
        ddl,
        render_dml_line("test", "tests", 0, 3000, 7, 1, 1693300000, "insert", {"id": 1, "val": 1.5}),
        render_dml_line("test", "tests", 0, 3000, 8, 1, 1693300001, "insert", {"id": 2, "val": 2.5}),
        render_dml_line("test", "tests", 0, 3000, 9, 1, 1693300002, "update_before", {"id": 1, "val": 1.5}),
        render_dml_line("test", "tests", 0, 3000, 9, 2, 1693300002, "update_after", {"id": 1, "val": 9.5}),
        render_dml_line("test", "tests", 0, 3000, 10, 1, 1693300003, "delete", {"id": 2, "val": 2.5}),
    ]
    return lines


@pytest.fixture(scope="module")
def wire_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wire"))
    write_stream_files(_fixture_lines(), d, files=2)
    return d


def test_dispatch_rule(spark, wire_dir):
    raw = spark.read.text(wire_dir)
    counts = dict(
        classify_lines(raw).groupBy("event_class").count().collect()
    )
    # membership via collected rows
    rows = {r["event_class"]: r["count"] for r in classify_lines(raw).groupBy("event_class").count().collect()}
    assert rows == {"err": 1, "ddl": 1, "dml": 5}


def test_golden_decode(spark, wire_dir):
    df, ts = read_cdc_lines(spark, wire_dir, "test", "tests")
    assert ts.version == 1
    rows = sorted(
        df.select("sequence", "event_number", "event_type", "id", "val").collect()
    )
    # golden values (client_test.go:152-166 shape)
    assert rows[0].asDict() == {
        "sequence": 7, "event_number": 1, "event_type": "insert", "id": 1, "val": 1.5
    }
    assert [r["event_type"] for r in rows] == [
        "insert", "insert", "update_before", "update_after", "delete"
    ]
    # raw retained (event.go:210-211)
    assert df.schema["raw"].dataType.typeName() == "string"


def test_resume_from_gtid(spark, wire_dir):
    """WithGTID('0-3000-8') yields the id=2 insert first
    (client_test.go:169-266)."""
    df, _ = read_cdc_lines(spark, wire_dir, "test", "tests", start_gtid="0-3000-8")
    seqs = sorted(r["sequence"] for r in df.collect())
    assert seqs == [8, 9, 9, 10]


def test_missing_table_raises(spark, wire_dir):
    with pytest.raises(KeyError):
        read_cdc_lines(spark, wire_dir, "test", "nope")


def test_oversize_guard(spark, tmp_path):
    """Events over 1 MiB are rejected, matching maxScanTokenSize
    (client.go:17, 256-257)."""
    big = '{"domain": 0, "pad": "' + "x" * (1 << 20) + '"}'
    p = str(tmp_path / "big")
    write_stream_files([big, 'ERR bad', '{"domain": 0, "server_id": 1}'], p)
    raw = spark.read.text(p)
    rows = {r["event_class"]: r["count"] for r in classify_lines(raw).groupBy("event_class").count().collect()}
    assert rows["oversize"] == 1 and rows["err"] == 1 and rows["dml"] == 1


def test_update_pair_and_latest_state(spark, wire_dir):
    df, _ = read_cdc_lines(spark, wire_dir, "test", "tests")
    cdc = df.select(
        "domain", "server_id", "sequence", "event_number",
        F.col("event_type").alias("dml_type"),
        F.col("id").alias("pk"), F.col("val").alias("value"),
        F.col("timestamp").alias("ts_unix"),
    )
    state = {r["pk"]: r for r in latest_state(cdc).collect()}
    # id=1 updated to 9.5; id=2 deleted
    assert set(state) == {1}
    assert state[1]["last_value"] == 9.5


def test_schema_evolution_v2(spark, tmp_path):
    """ALTER bumps version (event.go:35-36); both versions usable."""
    lines = _fixture_lines() + [
        render_ddl_line("test", "tests", 2, "0-3000-11",
                        [("id", "int"), ("val", "double"), ("tag", "varchar")]),
        render_dml_line("test", "tests", 0, 3000, 12, 1, 1693300004, "insert",
                        {"id": 3, "val": 3.5, "tag": "new"}),
    ]
    p = str(tmp_path / "v2")
    write_stream_files(lines, p)
    df2, ts2 = read_cdc_lines(spark, p, "test", "tests")  # latest = v2
    assert ts2.version == 2
    assert "tag" in df2.columns
    df1, ts1 = read_cdc_lines(spark, p, "test", "tests", version=1)
    assert ts1.version == 1 and "tag" not in df1.columns


def test_streaming_source_matches_batch(spark, wire_dir):
    """The streaming RequestData analogue delivers the same rows as the
    batch path (one decode pipeline, two execution modes)."""
    from maxscale_cdc_spark.streaming.runners import run_to_memory

    raw = spark.read.text(wire_dir)
    reg = SchemaRegistry()
    for row in raw.collect():
        line = row[0]
        if not line.startswith('{"domain":') and not line.startswith("ERR"):
            reg.register(line)
    ts = reg.get("test", "tests")
    stream = read_cdc_stream(spark, wire_dir, ts, max_files_per_trigger=1)
    out = run_to_memory(stream, "append")
    batch, _ = read_cdc_lines(spark, wire_dir, "test", "tests", registry=reg)
    assert sorted(map(tuple, out.drop("raw").collect())) == sorted(
        map(tuple, batch.drop("raw").collect())
    )
