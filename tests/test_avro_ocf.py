"""Unit tests for the pure-Python Avro OCF codec (sources/avro_ocf.py)
— the spec surface src_avro_events rides: varint zigzag edges, both
codecs, nullable unions, schema-driven decode, corruption detection."""

from __future__ import annotations

import pytest

from maxscale_cdc_spark.sources.avro_ocf import (
    CDC_AVRO_SCHEMA,
    read_ocf,
    write_ocf,
    zigzag_decode,
    zigzag_encode,
)


def _recs(n=500):
    return [
        {
            "sequence": i,
            "dml_type": "insert" if i % 2 else "delete",
            "pk": i * 7 - 3,
            "value_cents": -i * 101,
            "ts_unix": 1704067200 + i,
            "note": None if i % 3 else f"n{i % 7}",
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(codec):
    recs = _recs()
    blob = write_ocf(CDC_AVRO_SCHEMA, recs, codec=codec, sync=b"\x05" * 16)
    schema, back = read_ocf(blob)
    assert back == recs
    assert schema["name"] == "CdcEvent"


def test_zigzag_edges():
    for n in (0, -1, 1, 63, -64, 2**31, -(2**31), 2**62, -(2**62),
              2**63 - 1, -(2**63)):
        b = zigzag_encode(n)
        v, p = zigzag_decode(memoryview(b), 0)
        assert (v, p) == (n, len(b)), n


def test_multi_block_roundtrip():
    recs = _recs(1000)
    blob = write_ocf(
        CDC_AVRO_SCHEMA, recs, codec="deflate", sync=b"\x07" * 16,
        block_records=128,
    )
    _, back = read_ocf(blob)
    assert back == recs


def test_union_branches_decode_by_schema():
    """Nullable-union decode is schema-driven, branch index first —
    both orders of the union list must round-trip."""
    schema = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "x", "type": ["string", "null"]}],
    }
    recs = [{"x": "a"}, {"x": None}, {"x": ""}]
    _, back = read_ocf(write_ocf(schema, recs))
    assert back == recs


def test_not_avro_raises():
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(b"PAR1" + b"\x00" * 32)


def test_sync_mismatch_raises():
    blob = bytearray(write_ocf(CDC_AVRO_SCHEMA, _recs(10), sync=b"\x09" * 16))
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(bytes(blob))


def test_spool_exercises_both_codecs(spark):
    """The src_avro_events spool must actually contain BOTH codec
    paths (even partitions null, odd deflate) — otherwise the deflate
    branch of the decode ships untested against real files."""
    import os

    from maxscale_cdc_spark.operators.sources import _spool_avro_files

    spool = _spool_avro_files(spark, "/root/testdata/sf0.001")
    tot = 0
    codecs = set()
    for n in sorted(os.listdir(spool)):
        if n.endswith(".avro"):
            with open(os.path.join(spool, n), "rb") as fh:
                data = fh.read()
            _, recs = read_ocf(data)  # full decode: corruption would raise
            tot += len(recs)
            codecs.add(b"deflate" in data[:400])  # codec rides the metadata
    assert tot == 1000  # every sf0.001 event, losslessly
    assert codecs == {True, False}, "both codecs must appear in the spool"
