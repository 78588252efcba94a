"""Unit tests for the pure-Python protobuf wire codec
(sources/proto_wire.py) — varint/zigzag edges, optional presence,
packed repeated, unknown-field skipping, delimited framing."""

import pytest

from maxscale_cdc_spark.sources.proto_wire import (
    append_unknown_varint,
    decode_message,
    encode_message,
    read_delimited,
    read_uvarint,
    uvarint,
    write_delimited,
    zigzag_decode,
    zigzag_encode,
)

_REC = {
    "sequence": 7,
    "dml_type": "update_after",
    "pk": 42,
    "value_cents": 655,
    "drift": -3,
    "ts_unix": 1_704_067_200,
    "note": "5",
    "tags": [0, 2],
}


def test_uvarint_edges():
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        v, pos = read_uvarint(uvarint(n), 0)
        assert v == n and pos == len(uvarint(n))
    with pytest.raises(ValueError):
        uvarint(-1)


def test_zigzag_int64_edges():
    for n in (0, -1, 1, -2, 63, -64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert zigzag_decode(zigzag_encode(n)) == n
    # the spec's canonical small mappings
    assert zigzag_encode(0) == 0
    assert zigzag_encode(-1) == 1
    assert zigzag_encode(1) == 2
    assert zigzag_encode(-2) == 3


def test_roundtrip_with_all_kinds():
    assert decode_message(encode_message(_REC)) == _REC


def test_optional_absent_is_omitted():
    rec = dict(_REC, note=None)
    out = decode_message(encode_message(rec))
    assert "note" not in out
    assert out["drift"] == -3


def test_unknown_fields_are_skipped():
    m = append_unknown_varint(encode_message(_REC), 15, 999)
    assert decode_message(m) == _REC


def test_packed_empty_and_long():
    rec = dict(_REC, tags=[])
    out = decode_message(encode_message(rec))
    assert out["tags"] == []
    rec = dict(_REC, tags=list(range(300)))
    assert decode_message(encode_message(rec))["tags"] == list(range(300))


def test_delimited_framing():
    msgs = [encode_message(_REC), b"", encode_message(dict(_REC, pk=1))]
    assert read_delimited(write_delimited(msgs)) == msgs


def test_negative_int64_roundtrips_as_ten_byte_varint():
    """Spec semantics (ADVICE r11): a negative int64 is the 10-byte
    two's-complement varint, sign-extended on decode — a negative
    value_cents must round-trip, not crash the spool."""
    rec = dict(_REC, value_cents=-12345, tags=[-1, 0, 2**63 - 1, -(2**63)])
    wire = encode_message(rec)
    # the negative scalar occupies the full 10-byte varint
    assert len(wire) > len(encode_message(dict(rec, value_cents=1, tags=[])))
    out = decode_message(wire)
    assert out["value_cents"] == -12345
    assert out["tags"] == [-1, 0, 2**63 - 1, -(2**63)]
