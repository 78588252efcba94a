"""Schema-registry decode tests — the polymorphic field unmarshaller
(event.go:58-137) golden-value checks, mirroring the reference's
integration fixture (client_test.go:82-134)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from maxscale_cdc_spark.sources.schema_registry import (
    SchemaRegistry,
    decode_ddl,
    decode_field,
)

DDL_V1 = """{"namespace": "MaxScaleChangeDataSchema.avro", "type": "record",
 "name": "ChangeRecord", "table": "tests", "database": "test", "version": 1,
 "gtid": "0-3000-6", "fields": [
   {"name": "domain", "type": "int"},
   {"name": "event_type", "type": {"type": "enum", "name": "EVENT_TYPES",
      "symbols": ["insert", "update_before", "update_after", "delete"]}},
   {"name": "id", "type": ["null", "int"], "real_type": "int", "length": -1}]}"""


def test_plain_string_type():
    fd = decode_field({"name": "domain", "type": "int"})
    assert fd.spark_type() == T.IntegerType()
    assert not fd.nullable


def test_union_array_nullable():
    fd = decode_field(
        {"name": "id", "type": ["null", "long"], "real_type": "int", "length": -1}
    )
    assert fd.nullable
    # real_type wins over the Avro wire type
    assert fd.spark_type() == T.IntegerType()


def test_union_unsigned_widens():
    fd = decode_field(
        {"name": "n", "type": ["null", "long"], "real_type": "int", "unsigned": True}
    )
    assert fd.spark_type() == T.LongType()
    fd2 = decode_field(
        {"name": "n", "type": ["null", "long"], "real_type": "bigint", "unsigned": True}
    )
    assert fd2.spark_type() == T.DecimalType(20, 0)


def test_enum_object():
    fd = decode_field(
        {"name": "event_type", "type": {"type": "enum", "symbols": ["a", "b"]}}
    )
    assert fd.spark_type() == T.StringType()
    assert fd.enum_symbols == ["a", "b"]


def test_varchar_length_metadata():
    fd = decode_field(
        {"name": "s", "type": ["null", "string"], "real_type": "varchar", "length": 64}
    )
    f = fd.spark_field()
    assert f.dataType == T.StringType()
    assert f.metadata["length"] == 64


def test_decode_ddl_golden():
    ts = decode_ddl(DDL_V1)
    assert (ts.database, ts.table, ts.version, ts.gtid) == (
        "test",
        "tests",
        1,
        "0-3000-6",
    )
    # envelope fields are excluded from the payload struct
    assert [f.name for f in ts.payload_fields()] == ["id"]
    f = ts.payload_struct()["id"]
    assert f.dataType == T.IntegerType() and f.nullable
    assert f.metadata.get("real_type") == "int"


def test_registry_versioning():
    reg = SchemaRegistry()
    reg.register(DDL_V1)
    v2 = DDL_V1.replace('"version": 1', '"version": 2').replace(
        '"gtid": "0-3000-6"', '"gtid": "0-3000-20"'
    )
    reg.register(v2)
    assert reg.versions("test", "tests") == [1, 2]
    assert reg.get("test", "tests").version == 2  # latest by default
    assert reg.get("test", "tests", 1).version == 1  # explicit (client.go:114-119)
    with pytest.raises(KeyError):
        reg.get("test", "missing")


def test_undecodable_field_raises():
    with pytest.raises(ValueError):
        decode_field({"name": "x", "type": 42})
