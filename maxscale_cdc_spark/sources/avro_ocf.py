"""Minimal Avro Object Container File codec — pure Python, no
third-party avro dependency.

Why this exists: the reference's avrorouter serves change events
NATIVELY as Avro (the JSON rendering the client selects with
`REGISTER … TYPE=JSON`, client.go:211-216, is the alternative it asks
for) — so a 100 TB deployment of this engine lands Avro.  The Spark
distribution in this environment ships Avro core jars but NOT the
`spark-avro` DataSource module ("Failed to find data source: avro",
re-checked every round), and no Python avro package is installed.
Rather than leave the format uncovered, this module implements the
subset of the public Avro 1.11 spec the CDC envelope needs:

  writer: records of {null, boolean, int, long, float, double, string,
          bytes} fields plus nullable unions ["null", X]; `null` and
          `deflate` codecs (deflate = raw RFC-1951, zlib wbits=-15).
  reader: schema-driven decode of the same subset from the embedded
          `avro.schema` metadata — not hardcoded offsets.

Spark integration (operators/sources.py::src_avro_events): ENCODE runs
distributed (mapInPandas over a repartitioned envelope, one OCF file
per partition written to the spool), DECODE runs distributed
(binaryFile scan → mapInPandas, one Arrow batch per file).  If/when
the spark-avro module is deployed, `spark.read.format("avro")`
replaces the decode UDF and the rest of the plan is unchanged — the
plumbing (schema, partitioning, file layout) is the production shape.

Format reference: the public Apache Avro specification
(container-file section); parity target: the avrorouter's
one-record-per-change layout (reference docker/config selects the CDC
router; event.go:58-137 documents the field-type space).
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive binary codec
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return zigzag_encode(len(b)) + b


def _enc_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


_PRIM_ENC = {
    "null": lambda v: b"",
    "boolean": lambda v: b"\x01" if v else b"\x00",
    "int": zigzag_encode,
    "long": zigzag_encode,
    "float": lambda v: struct.pack("<f", v),
    "double": lambda v: struct.pack("<d", v),
    "string": _enc_string,
    "bytes": _enc_bytes,
}


def _dec_prim(typ: str, buf: memoryview, pos: int):
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return zigzag_decode(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported Avro type: {typ!r}")


def _enc_value(schema, v) -> bytes:
    if isinstance(schema, str):
        return _PRIM_ENC[schema](v)
    if isinstance(schema, list):  # union — encode branch index + value
        if v is None and "null" in schema:
            idx = schema.index("null")
            return zigzag_encode(idx)
        for idx, branch in enumerate(schema):
            if branch != "null":
                return zigzag_encode(idx) + _enc_value(branch, v)
        raise ValueError("no non-null union branch")
    if isinstance(schema, dict) and schema.get("type") == "record":
        out = bytearray()
        for f in schema["fields"]:
            out += _enc_value(f["type"], v[f["name"]])
        return bytes(out)
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def _dec_value(schema, buf: memoryview, pos: int):
    if isinstance(schema, str):
        return _dec_prim(schema, buf, pos)
    if isinstance(schema, list):
        idx, pos = zigzag_decode(buf, pos)
        return _dec_value(schema[idx], buf, pos)
    if isinstance(schema, dict) and schema.get("type") == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _dec_value(f["type"], buf, pos)
        return rec, pos
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def write_ocf(
    schema: dict,
    records: list[dict],
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    block_records: int = 4096,
) -> bytes:
    """Serialize `records` into one OCF byte string.  `sync` is caller
    -supplied so fixtures stay deterministic (the spec only requires
    it be consistent within the file)."""
    assert codec in ("null", "deflate") and len(sync) == 16
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        out += _enc_string(k) + _enc_bytes(v)
    out += zigzag_encode(0)  # map terminator
    out += sync
    for lo in range(0, len(records), block_records):
        chunk = records[lo : lo + block_records]
        data = b"".join(_enc_value(schema, r) for r in chunk)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += zigzag_encode(len(chunk)) + zigzag_encode(len(data)) + data + sync
    return bytes(out)


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Decode one OCF byte string → (schema, records).  Schema-driven:
    reads `avro.schema` / `avro.codec` from the file's own metadata."""
    buf = memoryview(data)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = zigzag_decode(buf, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count prefixes a byte size
            count = -count
            _, pos = zigzag_decode(buf, pos)
        for _ in range(count):
            k, pos = _dec_prim("string", buf, pos)
            v, pos = _dec_prim("bytes", buf, pos)
            meta[k] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n, pos = zigzag_decode(buf, pos)
        size, pos = zigzag_decode(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            block = memoryview(zlib.decompress(bytes(block), -15))
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bpos = 0
        for _ in range(n):
            rec, bpos = _dec_value(schema, block, bpos)
            records.append(rec)
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return schema, records


# The CDC envelope schema the avrorouter-parity fixture uses: integer
# cents keep the binary round trip exact (the repo's JSON-wire
# discipline), and `note` exercises the nullable-union branch the
# avrorouter emits for NULLable columns (event.go:58-137 field space).
CDC_AVRO_SCHEMA = {
    "type": "record",
    "name": "CdcEvent",
    "namespace": "MaxScaleChangeDataSchema.avro",
    "fields": [
        {"name": "sequence", "type": "long"},
        {"name": "dml_type", "type": "string"},
        {"name": "pk", "type": "long"},
        {"name": "value_cents", "type": "long"},
        {"name": "ts_unix", "type": "long"},
        {"name": "note", "type": ["null", "string"]},
    ],
}

# Generation 2 of the envelope schema — the avrorouter bumps the
# schema version on ALTER (event.go:35-36) and HISTORICAL container
# files keep their original schema, so a reader over a landing zone
# must resolve PER FILE.  `extra` is the added nullable column.
CDC_AVRO_SCHEMA_V2 = {
    "type": "record",
    "name": "CdcEvent",
    "namespace": "MaxScaleChangeDataSchema.avro",
    "fields": CDC_AVRO_SCHEMA["fields"]
    + [{"name": "extra", "type": ["null", "int"]}],
}
