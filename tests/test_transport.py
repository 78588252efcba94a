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


def test_restart_appends_after_existing_bursts(tmp_path):
    """A transport started against a non-empty spool must continue the
    burst numbering, never overwrite burst-000000000.jsonl — a committed
    DataSource offset range would otherwise replay different rows."""
    lines_a = _wire_lines(5)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines_a})
    try:
        t, spool = _drain_to_spool(server, tmp_path)
        t.stop()
        first = sorted(os.listdir(spool))
        assert first == ["burst-000000000.jsonl"]
        # second session, same spool dir
        t2 = CDCTransport(server.address, "user", "pw", UUID)
        t2.request_data("test", "tests", spool_dir=spool)
        t2.drain()
        t2.stop()
        assert sorted(os.listdir(spool)) == [
            "burst-000000000.jsonl",
            "burst-000000001.jsonl",
        ]
        with open(os.path.join(spool, "burst-000000000.jsonl")) as fh:
            assert fh.read().splitlines() == lines_a  # untouched
    finally:
        server.close()


def test_pre_schema_err_logged_and_counted(tmp_path, caplog):
    """WithLogger parity (client.go:70-74, 240-246): tolerated ERRs are
    logged and surfaced in the monitor's transport frame."""
    import logging

    lines = _wire_lines(3)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines}, pre_schema_errs=2)
    try:
        with caplog.at_level(logging.WARNING, "maxscale_cdc_spark.transport"):
            t, spool = _drain_to_spool(server, tmp_path)
        assert t.err_lines == 2
        tolerated = [r for r in caplog.records if "pre-schema ERR" in r.message]
        assert len(tolerated) == 2
        t.stop()
    finally:
        server.close()


def test_transport_frame_surfaces_skips(spark, tmp_path):
    from maxscale_cdc_spark.streaming.monitor import transport_frame

    lines = _wire_lines(4)
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines}, pre_schema_errs=3)
    try:
        t, _ = _drain_to_spool(server, tmp_path)
        t.stop()
        row = transport_frame(spark, t).collect()[0]
        assert row.events_pumped == len(lines)
        assert row.skipped_err_lines == 3
        assert row.pump_alive is False
        assert row.pump_error is None
    finally:
        server.close()


def test_mid_stream_err_terminates_pump(tmp_path):
    """After the first event an ERR is a decode error (readSchema gate,
    client.go:253-267) — the pump must end with MidStreamServerError,
    not silently swallow a server-side failure."""
    from maxscale_cdc_spark.sources.transport import MidStreamServerError

    lines = _wire_lines(3) + ["ERR binlog corrupted"]
    server = FakeMaxScaleServer("user", "pw", {"test.tests": lines})
    try:
        spool = str(tmp_path / "spool")
        t = CDCTransport(server.address, "user", "pw", UUID)
        t.request_data("test", "tests", spool_dir=spool)
        with pytest.raises(MidStreamServerError):
            t.drain()
        assert t.events_pumped == 4  # DDL + 3 DML delivered before the ERR
    finally:
        server.close()


def test_mid_stream_reset_is_an_error(tmp_path):
    """A connection reset mid-stream must NOT look like a clean end of
    stream: drain() has to raise so callers never trust a truncated
    spool (the reference logs scanner.Err(), client.go:287)."""
    lines = _wire_lines(6)
    server = FakeMaxScaleServer(
        "user", "pw", {"test.tests": lines}, reset_after=3
    )
    try:
        spool = str(tmp_path / "spool")
        t = CDCTransport(server.address, "user", "pw", UUID)
        t.request_data("test", "tests", spool_dir=spool)
        with pytest.raises(OSError):
            t.drain()
        assert t.events_pumped == 3  # truncated, and loudly so
    finally:
        server.close()


def test_max_files_per_trigger_zero_rejected(tmp_path):
    """maxFilesPerTrigger='0' must be a loud ValueError, not a silent
    "uncapped" (int('0') is falsy, so a truthiness check would treat the
    tightest requested bound as no bound at all)."""
    from maxscale_cdc_spark.sources.cdc_datasource import build_cdc_datasource

    spool = tmp_path / "spool"
    spool.mkdir()
    cls = build_cdc_datasource()
    opts = {
        "path": str(spool),
        "database": "test",
        "table": "tests",
        "maxfilespertrigger": "0",
    }
    src = cls.__new__(cls)
    src.options = opts
    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        src.streamReader(None)
    # >=1 stays valid
    src.options = {**opts, "maxfilespertrigger": "1"}
    assert src.streamReader(None).max_files == 1


# -- TYPE=AVRO arm (the avrorouter's native rendering) ----------------------


def _avro_fixture_dir(tmp_path, n=5000, files=2, block_records=700):
    import hashlib

    from maxscale_cdc_spark.sources.avro_ocf import CDC_AVRO_SCHEMA, write_ocf

    recs = [
        {
            "sequence": i,
            "dml_type": "insert",
            "pk": i % 10,
            "value_cents": 100 * i,
            "ts_unix": 1693300000 + i,
            "note": None if i % 3 else str(i),
        }
        for i in range(n)
    ]
    d = tmp_path / "ocf"
    d.mkdir()
    per = n // files
    for fi in range(files):
        blob = write_ocf(
            CDC_AVRO_SCHEMA,
            recs[fi * per : (fi + 1) * per],
            codec="deflate" if fi % 2 else "null",
            sync=hashlib.md5(f"s{fi}".encode()).digest(),
            block_records=block_records,
        )
        (d / f"f-{fi}.avro").write_bytes(blob)
    return str(d), recs


def test_register_type_avro_streams_ocf_blocks(tmp_path):
    """The REGISTER exchange with the alternate TYPE (mirrors
    client_test.go's REGISTER arm, TYPE=AVRO instead of the
    reference's hardcoded JSON): the server streams rotated OCF files
    (mixed codecs, distinct sync markers) and the pump re-blocks them
    into standalone, independently-decodable burst files — record-
    exact, block-granular, rotation-transparent."""
    from maxscale_cdc_spark.sources.avro_ocf import read_ocf

    srv_dir, recs = _avro_fixture_dir(tmp_path)
    server = FakeMaxScaleServer("u", "p", avro_tables={"test.tests": srv_dir})
    spool = tmp_path / "spool"
    t = CDCTransport(server.address, "u", "p", UUID)
    try:
        t.request_data("test", "tests", spool_dir=str(spool), data_format="AVRO")
        t.drain(timeout_s=60)
        t.stop()
    finally:
        server.close()
    bursts = sorted(f for f in os.listdir(spool) if f.endswith(".avro"))
    # 2 files x ceil(2500/700)=4 blocks -> 8 standalone bursts
    assert len(bursts) == 8, bursts
    got = []
    for f in bursts:
        _, rr = read_ocf((spool / f).read_bytes())
        got.extend(rr)
    assert sorted(got, key=lambda r: r["sequence"]) == recs
    assert t.events_pumped == len(recs)


def test_register_unknown_type_rejected(tmp_path):
    """REGISTER with a TYPE the server does not speak answers ERR
    during the handshake — the client surfaces it as an
    AuthenticationError exactly like the reference's ERR checks
    (client.go:406-408)."""
    server = FakeMaxScaleServer("u", "p", tables={"test.tests": _wire_lines()})
    t = CDCTransport(server.address, "u", "p", UUID)
    try:
        t.connect()
        t.authenticate()
        with pytest.raises(ValueError):
            t.register("XML")  # client-side: not a protocol TYPE
        # drive the raw server path too: a well-formed REGISTER with an
        # unsupported TYPE token must get ERR from the server
        t._write(f"REGISTER UUID={UUID}, TYPE=YAML".encode("ascii"))
        with pytest.raises(AuthenticationError):
            t._read_response()
    finally:
        try:
            t.stop()
        except Exception:
            pass
        server.close()


def test_avro_arm_missing_table_errs(tmp_path):
    """TYPE=AVRO + unknown table: the server answers the same
    tolerated-ERR shape as the JSON arm (client.go:137-140)."""
    server = FakeMaxScaleServer("u", "p", avro_tables={})
    spool = tmp_path / "spool"
    t = CDCTransport(server.address, "u", "p", UUID)
    try:
        t.request_data("no", "table", spool_dir=str(spool), data_format="AVRO")
        t.drain(timeout_s=30)
        t.stop()
    finally:
        server.close()
    assert t.events_pumped == 0


def test_avro_stream_truncation_is_an_error(tmp_path):
    """A server dying mid-block must surface as a pump error on
    drain()/stop() — never a silently short spool (the JSON pump's
    mid-stream-reset rule, on the binary arm)."""
    srv_dir, recs = _avro_fixture_dir(tmp_path, n=2000, files=1)
    blob = (tmp_path / "ocf" / "f-0.avro").read_bytes()
    (tmp_path / "ocf" / "f-0.avro").write_bytes(blob[: len(blob) - 37])
    server = FakeMaxScaleServer("u", "p", avro_tables={"test.tests": srv_dir})
    spool = tmp_path / "spool"
    t = CDCTransport(server.address, "u", "p", UUID)
    try:
        t.request_data("test", "tests", spool_dir=str(spool), data_format="AVRO")
        with pytest.raises((ValueError, EOFError)):
            t.drain(timeout_s=30)
    finally:
        try:
            t.stop()
        except Exception:
            pass
        server.close()


def test_avro_pump_resumes_burst_numbering(tmp_path):
    """A second AVRO transport against a non-empty spool must APPEND
    after the existing bursts (same contract as the JSON pump: a
    committed reader offset must never see renumbered files)."""
    from maxscale_cdc_spark.sources.avro_ocf import read_ocf

    srv_dir, recs = _avro_fixture_dir(tmp_path, n=1400, files=1)
    spool = tmp_path / "spool"
    for _ in range(2):
        server = FakeMaxScaleServer(
            "u", "p", avro_tables={"test.tests": srv_dir}
        )
        t = CDCTransport(server.address, "u", "p", UUID)
        t.request_data(
            "test", "tests", spool_dir=str(spool), data_format="AVRO"
        )
        t.drain(timeout_s=30)
        t.stop()
        server.close()
    bursts = sorted(f for f in os.listdir(spool) if f.endswith(".avro"))
    # 1400 rows / 700-block = 2 blocks per run -> 4 bursts, numbered
    # consecutively (no renumbering, no overwrite)
    assert [b[:15] for b in bursts] == [
        "burst-000000000", "burst-000000001",
        "burst-000000002", "burst-000000003",
    ], bursts
    total = []
    for f in bursts:
        _, rr = read_ocf((spool / f).read_bytes())
        total.extend(rr)
    assert len(total) == 2 * len(recs)
