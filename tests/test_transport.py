"""Live TCP transport tests — the reference's integration surface
(client_test.go) against an in-process fake MaxScale server.

Positive path: handshake → REQUEST-DATA → pump to spool → consume the
spool end-to-end through the `maxscale_cdc` streaming DataSource.
Negative paths mirror client_test.go:19-66: bad address, bad
credentials, empty UUID, missing table (tolerated ERRs).
"""

from __future__ import annotations

import os
import time

import pytest

from maxscale_cdc_spark.sources.cdc_source import render_ddl_line, render_dml_line
from maxscale_cdc_spark.sources.transport import (
    AuthenticationError,
    CDCTransport,
    FakeMaxScaleServer,
    NotConnectedError,
)

UUID = "XXX-YYY_YYY"  # shape from the reference docs/tests


def _wire_lines(n: int = 10) -> list[str]:
    lines = [
        render_ddl_line("test", "tests", 1, "0-3000-1", [("id", "int"), ("val", "double")])
    ]
    for i in range(n):
        lines.append(
            render_dml_line(
                "test", "tests", 0, 3000, i + 2, 1, 1693300000 + i, "insert",
                {"id": i, "val": i * 1.5},
            )
        )
    return lines


def _drain_to_spool(server, tmp_path, table="tests", **kw) -> tuple[CDCTransport, str]:
    spool = str(tmp_path / "spool")
    t = CDCTransport(server.address, "user", "pw", UUID)
    t.request_data("test", table, spool_dir=spool, **kw)
    t.drain()
    return t, spool


def test_handshake_and_pump(tmp_path):
    lines = _wire_lines(25)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines})
    try:
        t, spool = _drain_to_spool(server, tmp_path)
        files = sorted(os.listdir(spool))
        assert files, "pump produced no burst files"
        got = []
        for f in files:
            with open(os.path.join(spool, f)) as fh:
                got.extend(fh.read().splitlines())
        # every line delivered, in order, no partial bursts
        assert got == lines
        assert t.events_pumped == len(lines)
        t.stop()
    finally:
        server.close()


def test_bad_address():
    # client_test.go:19-27 — dial failure surfaces as a connection error
    from maxscale_cdc_spark.sources.cdc_source import TransportOptions

    t = CDCTransport(
        "127.0.0.1:1", "user", "pw", UUID,
        options=TransportOptions(dial_timeout_s=0.5),
    )
    with pytest.raises(ConnectionError):
        t.connect()


def test_bad_credentials(tmp_path):
    # client_test.go:29-39
    server = FakeMaxScaleServer("user", "pw", {"test.tests": _wire_lines(1)})
    try:
        t = CDCTransport(server.address, "user", "WRONG", UUID)
        with pytest.raises(AuthenticationError):
            t.request_data("test", "tests", spool_dir=str(tmp_path / "s"))
    finally:
        server.close()


def test_empty_uuid(tmp_path):
    # client_test.go:41-51
    server = FakeMaxScaleServer("user", "pw", {"test.tests": _wire_lines(1)})
    try:
        t = CDCTransport(server.address, "user", "pw", "")
        with pytest.raises(AuthenticationError):
            t.request_data("test", "tests", spool_dir=str(tmp_path / "s"))
    finally:
        server.close()


def test_missing_table_errs_tolerated(tmp_path):
    # client.go:137-140, 261-267: ERR lines before the schema are
    # tolerated (missing-table wait), the stream continues after them
    lines = _wire_lines(5)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines}, pre_schema_errs=3)
    try:
        t, spool = _drain_to_spool(server, tmp_path)
        assert t.err_lines == 3  # counted, not delivered
        got = []
        for f in sorted(os.listdir(spool)):
            with open(os.path.join(spool, f)) as fh:
                got.extend(fh.read().splitlines())
        assert got == lines
        t.stop()
    finally:
        server.close()


def test_unknown_table_closes_with_err(tmp_path):
    server = FakeMaxScaleServer("user", "pw", {"test.tests": _wire_lines(1)})
    try:
        t, spool = _drain_to_spool(server, tmp_path, table="nope")
        assert t.events_pumped == 0
        assert t.err_lines >= 1
        t.stop()
    finally:
        server.close()


def test_stop_before_connect():
    t = CDCTransport("127.0.0.1:1", "user", "pw", UUID)
    with pytest.raises(NotConnectedError):
        t.stop()


def test_resume_gtid_in_command(tmp_path):
    """WithGTID analogue: the REQUEST-DATA command carries the resume
    position (client.go:122-126, 349-369); the server-side stream then
    starts from it (our fake streams everything; the client-side GTID
    filter lives in the DataSource)."""
    lines = _wire_lines(5)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines})
    try:
        t, spool = _drain_to_spool(server, tmp_path, gtid="0-3000-4")
        assert t.events_pumped == len(lines)
        t.stop()
    finally:
        server.close()


def test_oversize_event_terminates_pump(tmp_path):
    # 1 MiB cap: like bufio.Scanner ErrTooLong the pump ends with an
    # error (client.go:17, 240-246)
    big = '{"domain": 0, "pad": "' + "x" * (1 << 20) + '"}'
    server = FakeMaxScaleServer("user", "pw", {"test.tests": [big]})
    try:
        spool = str(tmp_path / "spool")
        t = CDCTransport(server.address, "user", "pw", UUID)
        t.request_data("test", "tests", spool_dir=spool)
        deadline = time.time() + 10
        while t._thread.is_alive() and time.time() < deadline:
            time.sleep(0.05)
        from maxscale_cdc_spark.sources.transport import OversizeEventError

        with pytest.raises(OversizeEventError):
            t.stop()
    finally:
        server.close()


def test_end_to_end_through_datasource(spark, tmp_path):
    """The full reference lifecycle on Spark: TCP handshake → pump to
    spool → `maxscale_cdc` streaming DataSource → typed rows.  This is
    the client_test.go:75-161 consume-and-apply flow."""
    from maxscale_cdc_spark.sources.cdc_datasource import SOURCE_NAME, register
    from maxscale_cdc_spark.streaming.runners import run_to_memory

    lines = _wire_lines(40)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines})
    try:
        t, spool = _drain_to_spool(server, tmp_path)
        t.stop()
        register(spark)
        stream = (
            spark.readStream.format(SOURCE_NAME)
            .option("path", spool)
            .option("database", "test")
            .option("table", "tests")
            .option("payloadSchema", "id int, val double")
            .load()
        )
        out = run_to_memory(stream, "append")
        rows = sorted(
            (r["sequence"], r["id"], r["val"]) for r in out.collect()
        )
        assert rows == [(i + 2, i, i * 1.5) for i in range(40)]
    finally:
        server.close()


def test_file_streamed_tables(tmp_path):
    """file_tables mode: the server streams a directory of line files in
    bounded chunks (never loads the dataset) — the path src_tcp_transport
    uses at scale."""
    lines = _wire_lines(30)
    d = tmp_path / "serve"
    d.mkdir()
    (d / "part-00.txt").write_text("\n".join(lines[:15]) + "\n")
    (d / "part-01.txt").write_text("\n".join(lines[15:]) + "\n")
    (d / "_SUCCESS").write_text("")  # marker files must be skipped
    server = FakeMaxScaleServer("user", "pw", file_tables={"test.tests": str(d)})
    try:
        t, spool = _drain_to_spool(server, tmp_path)
        got = []
        for f in sorted(os.listdir(spool)):
            with open(os.path.join(spool, f)) as fh:
                got.extend(fh.read().splitlines())
        assert got == lines
        t.stop()
    finally:
        server.close()
