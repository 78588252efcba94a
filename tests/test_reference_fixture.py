"""Byte-exact replica of the reference's integration fixture
(client_test.go:82-166 golden values, via FIXTURES.md A.1/A.2): the
engine must decode the reference's own test stream to the same typed
values its Go suite asserts."""

from __future__ import annotations

from pyspark.sql import functions as F

from maxscale_cdc_spark.operators.cdc import latest_state
from maxscale_cdc_spark.sources.cdc_source import read_cdc_lines, write_stream_files
from maxscale_cdc_spark.sources.schema_registry import decode_ddl

DDL_LINE = (
    '{"namespace": "MaxScaleChangeDataSchema.avro", "type": "record", '
    '"name": "ChangeRecord", "table": "tests", "database": "test", '
    '"version": 1, "gtid": "0-3000-6", "fields": ['
    '{"name": "domain", "type": "int"}, '
    '{"name": "server_id", "type": "int"}, '
    '{"name": "sequence", "type": "int"}, '
    '{"name": "event_number", "type": "int"}, '
    '{"name": "timestamp", "type": "int"}, '
    '{"name": "event_type", "type": {"type": "enum", "name": "EVENT_TYPES", '
    '"symbols": ["insert", "update_before", "update_after", "delete"]}}, '
    '{"name": "id", "type": ["null", "int"], "real_type": "int", "length": -1}]}'
)

DML_LINES = [
    '{"domain": 0, "server_id": 3000, "sequence": 7, "event_number": 1, '
    '"timestamp": 1693300000, "event_type": "insert", '
    '"table_name": "tests", "table_schema": "test", "id": 1}',
    '{"domain": 0, "server_id": 3000, "sequence": 8, "event_number": 1, '
    '"timestamp": 1693300001, "event_type": "insert", '
    '"table_name": "tests", "table_schema": "test", "id": 2}',
]


def test_ddl_golden_decode():
    ts = decode_ddl(DDL_LINE)
    assert (ts.namespace, ts.database, ts.table, ts.version, ts.gtid) == (
        "MaxScaleChangeDataSchema.avro",
        "test",
        "tests",
        1,
        "0-3000-6",
    )
    # the enum envelope field decodes with the 4 DML symbols
    et = next(f for f in ts.fields if f.name == "event_type")
    assert et.enum_symbols == ["insert", "update_before", "update_after", "delete"]
    # payload = fields minus the envelope (event.go:220-236)
    assert [f.name for f in ts.payload_fields()] == ["id"]


def test_dml_golden_decode(spark, tmp_path):
    p = str(tmp_path / "ref")
    write_stream_files([DDL_LINE] + DML_LINES, p)
    df, ts = read_cdc_lines(spark, p, "test", "tests")
    rows = sorted(
        (r["sequence"], r["event_number"], r["timestamp"], r["event_type"], r["id"])
        for r in df.collect()
    )
    # client_test.go:152-166 golden values
    assert rows == [
        (7, 1, 1693300000, "insert", 1),
        (8, 1, 1693300001, "insert", 2),
    ]
    # GTID synthesis for the second event is "0-3000-8" (event.go:216-218)
    gtids = sorted(
        r[0]
        for r in df.select(
            F.concat_ws("-", "domain", "server_id", "sequence")
        ).collect()
    )
    assert gtids == ["0-3000-7", "0-3000-8"]


def test_resume_matches_reference(spark, tmp_path):
    """client_test.go:169-266: WithGTID('0-3000-8') yields id=2 first."""
    p = str(tmp_path / "ref2")
    write_stream_files([DDL_LINE] + DML_LINES, p)
    df, _ = read_cdc_lines(spark, p, "test", "tests", start_gtid="0-3000-8")
    rows = df.select("sequence", "id").collect()
    assert len(rows) == 1 and rows[0]["id"] == 2


def test_interleaved_transaction_pairing(spark, tmp_path):
    """Update pairs stay correctly matched when two keys' transactions
    interleave in the stream (pairing is per-key positional, not global
    adjacency — event.go:177-183, 198-200)."""
    from maxscale_cdc_spark.sources.cdc_source import render_dml_line

    lines = [DDL_LINE.replace('"length": -1}]', '"length": -1}, {"name": "val", "type": ["null", "double"], "real_type": "double", "length": -1}]')]
    # interleaved: pk1 before, pk2 before, pk1 after, pk2 after
    lines += [
        render_dml_line("test", "tests", 0, 3000, 10, 1, 1693300010, "update_before", {"id": 1, "val": 1.0}),
        render_dml_line("test", "tests", 0, 3000, 11, 1, 1693300011, "update_before", {"id": 2, "val": 2.0}),
        render_dml_line("test", "tests", 0, 3000, 12, 1, 1693300012, "update_after", {"id": 1, "val": 10.0}),
        render_dml_line("test", "tests", 0, 3000, 13, 1, 1693300013, "update_after", {"id": 2, "val": 20.0}),
    ]
    p = str(tmp_path / "ref3")
    write_stream_files(lines, p)
    df, _ = read_cdc_lines(spark, p, "test", "tests")
    cdc = df.select(
        "domain", "server_id", "sequence", "event_number",
        F.col("event_type").alias("dml_type"),
        F.col("id").alias("pk"), F.col("val").alias("value"),
        F.col("timestamp").alias("ts_unix"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("pk").orderBy("domain", "server_id", "sequence", "event_number")
    paired = (
        cdc.withColumn("next_type", F.lead("dml_type").over(w))
        .withColumn("next_value", F.lead("value").over(w))
        .filter((F.col("dml_type") == "update_before") & (F.col("next_type") == "update_after"))
        .select("pk", "value", "next_value")
    )
    got = {r["pk"]: (r["value"], r["next_value"]) for r in paired.collect()}
    assert got == {1: (1.0, 10.0), 2: (2.0, 20.0)}
    state = {r["pk"]: r["last_value"] for r in latest_state(cdc).collect()}
    assert state == {1: 10.0, 2: 20.0}
