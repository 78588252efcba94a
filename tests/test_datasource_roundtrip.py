"""Property test: arbitrary payload rows survive the wire round trip
(render → spool → typed Arrow read) byte-exactly.

Exercises the reader WITHOUT a SparkSession: CDCStreamReader.read() is
plain Python + PyArrow, so hypothesis can hammer it cheaply.  This is
the decode half of the reference's contract (client.go:306-314 DML
decode + event.go:220-236 payload extraction) under generated inputs
instead of fixtures.
"""

from __future__ import annotations

import math
import os

from hypothesis import given, settings, strategies as st

from maxscale_cdc_spark.sources.cdc_datasource import build_cdc_datasource
from maxscale_cdc_spark.sources.cdc_source import render_dml_line, write_stream_files

# payload values per typed column: bigint, double, string, boolean
_I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_DOUBLE = st.floats(allow_nan=False, allow_infinity=False, width=64)
_TEXT = st.text(max_size=40)
_ROW = st.tuples(_I64, _DOUBLE, _TEXT, st.booleans())


def _read_typed(spool: str, n_files_hint: int = 1):
    cls = build_cdc_datasource()
    ds = cls(
        options={
            "path": spool,
            "table": "tests",
            "payloadschema": "k bigint, x double, s string, b boolean",
        }
    )
    reader = ds.streamReader(None)
    start = reader.initialOffset()
    end = reader.latestOffset()
    rows = []
    for part in reader.partitions(start, end):
        for batch in reader.read(part):
            rows.extend(batch.to_pylist())
    return rows


@settings(max_examples=30, deadline=None)
@given(st.lists(_ROW, min_size=1, max_size=8))
def test_typed_roundtrip(tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("rt")
    spool = str(tmp / "spool")
    lines = [
        render_dml_line(
            "test", "tests", 0, 3000, i + 1, 1, 1693300000, "insert",
            {"k": k, "x": x, "s": s, "b": b},
        )
        for i, (k, x, s, b) in enumerate(rows)
    ]
    write_stream_files(lines, spool)
    got = _read_typed(spool)
    assert len(got) == len(rows)
    for rec, (k, x, s, b) in zip(sorted(got, key=lambda r: r["sequence"]), rows):
        assert rec["k"] == k
        # JSON round-trips doubles via repr: bit-exact for finite values
        assert rec["x"] == x or (math.isnan(x) and math.isnan(rec["x"]))
        assert rec["s"] == s
        assert rec["b"] == b
        assert rec["event_type"] == "insert"
        assert rec["table_name"] == "tests"


def test_typed_roundtrip_empty_spool(tmp_path):
    spool = str(tmp_path / "none")
    os.makedirs(spool)
    assert _read_typed(spool) == []
