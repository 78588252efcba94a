"""DDL-event-driven schema registry.

The reference discovers a table's schema at runtime from the stream's
DDL events — Avro-style records with a version counter and a list of
polymorphically-encoded field descriptors (`event.go:27-56`), decoded by
a custom unmarshaller (`event.go:58-137`).  Three encodings:

1. plain string type:       ``{"name": "domain", "type": "int"}``
2. union array (nullable):  ``{"type": ["null", "long"], "real_type":
   "int", "length": -1, "unsigned": false}``
3. enum object:             ``{"type": {"type": "enum", "symbols": [...]}}``

This module re-expresses that decoder as a pure-Python ``StructType``
builder keyed by ``(database, table, version)``, so streaming DML
payloads can be parsed with ``from_json`` using the registered schema.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

from maxscale_cdc_spark.sources.envelope import ENVELOPE_COLS

# Avro/MariaDB type-name → Spark type.  `real_type` (the MariaDB column
# type) wins over the Avro wire type when present; unsigned ints widen
# one step so the full value domain fits (event.go:46-56 metadata).
_TYPE_MAP: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "mediumint": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(18, 4),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "text": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "bytes": T.BinaryType(),
    "blob": T.BinaryType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "time": T.StringType(),
    "enum": T.StringType(),
}

_UNSIGNED_WIDEN: dict[str, T.DataType] = {
    "tinyint": T.ShortType(),
    "smallint": T.IntegerType(),
    "mediumint": T.IntegerType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "bigint": T.DecimalType(20, 0),
}


@dataclass
class FieldDescriptor:
    """Decoded form of one DDL `fields[]` entry (event.go:27-56)."""

    name: str
    type_name: str
    nullable: bool = False
    real_type: str | None = None
    length: int = -1
    unsigned: bool = False
    enum_symbols: list[str] = field(default_factory=list)

    def spark_type(self) -> T.DataType:
        name = (self.real_type or self.type_name).lower()
        if self.unsigned and name in _UNSIGNED_WIDEN:
            return _UNSIGNED_WIDEN[name]
        if name in ("varchar", "char") and self.length > 0:
            # Spark VarcharType exists but StringType is the runtime type;
            # keep length as metadata.
            return T.StringType()
        return _TYPE_MAP.get(name, T.StringType())

    def spark_field(self) -> T.StructField:
        md = {}
        if self.length >= 0:
            md["length"] = self.length
        if self.enum_symbols:
            md["enum_symbols"] = self.enum_symbols
        if self.real_type:
            md["real_type"] = self.real_type
        return T.StructField(self.name, self.spark_type(), self.nullable, metadata=md)


def decode_field(obj: dict) -> FieldDescriptor:
    """Decode one polymorphic field descriptor (event.go:58-137).

    Mirrors the reference's three-way dispatch on the JSON shape of
    ``type``: plain string, union array, or enum object.
    """
    name = obj.get("name", "")
    typ = obj.get("type")
    if isinstance(typ, str):
        # Encoding 1 — plain string type (event.go:63-67, 106-108).
        return FieldDescriptor(name=name, type_name=typ)
    if isinstance(typ, list):
        # Encoding 2 — Avro union array, e.g. ["null", "long"]
        # (event.go:68-77, 110-119).  "null" in the union ⇒ nullable.
        nullable = "null" in typ
        non_null = [t for t in typ if t != "null"]
        wire = non_null[0] if non_null else "string"
        if not isinstance(wire, str):
            wire = "string"
        return FieldDescriptor(
            name=name,
            type_name=wire,
            nullable=nullable,
            real_type=obj.get("real_type"),
            # `or` guards explicit JSON nulls ("length": null is valid on
            # the wire; the Go reference decodes it as the zero value)
            length=int(obj.get("length") or -1),
            unsigned=bool(obj.get("unsigned") or False),
        )
    if isinstance(typ, dict):
        # Encoding 3 — enum object (event.go:79-90, 121-130); Spark has
        # no enum type: StringType + symbols kept for isin() validation.
        return FieldDescriptor(
            name=name,
            type_name="enum",
            enum_symbols=list(typ.get("symbols", [])),
        )
    raise ValueError(f"undecodable field descriptor: {obj!r}")


@dataclass
class TableSchema:
    """One registered (database, table, version) schema (event.go:27-44)."""

    namespace: str
    database: str
    table: str
    version: int
    gtid: str
    fields: list[FieldDescriptor]

    def payload_fields(self) -> list[FieldDescriptor]:
        return [f for f in self.fields if f.name not in ENVELOPE_COLS]

    def payload_struct(self) -> T.StructType:
        return T.StructType([f.spark_field() for f in self.payload_fields()])

    def full_struct(self) -> T.StructType:
        return T.StructType([f.spark_field() for f in self.fields])


def decode_ddl(line: str | bytes | dict) -> TableSchema:
    """Decode a DDL (schema) event JSON line (event.go:27-40,
    client.go:316-322)."""
    obj = json.loads(line) if not isinstance(line, dict) else line
    return TableSchema(
        namespace=obj.get("namespace", ""),
        database=obj.get("database", ""),
        table=obj.get("table", ""),
        version=int(obj.get("version", 1)),
        gtid=obj.get("gtid", ""),
        fields=[decode_field(f) for f in obj.get("fields", [])],
    )


class SchemaRegistry:
    """(database, table, version) → TableSchema, fed by DDL events.

    The reference increments `version` on ALTER (event.go:35-36) and
    lets the consumer request a specific version (client.go:114-119);
    `latest` mirrors the default no-version request.
    """

    def __init__(self) -> None:
        self._schemas: dict[tuple[str, str, int], TableSchema] = {}

    def register(self, ddl_line: str | bytes | dict) -> TableSchema:
        ts = decode_ddl(ddl_line)
        self._schemas[(ts.database, ts.table, ts.version)] = ts
        return ts

    def get(self, database: str, table: str, version: int | None = None) -> TableSchema:
        if version is not None:
            return self._schemas[(database, table, version)]
        versions = [
            v for (d, t, v) in self._schemas if d == database and t == table
        ]
        if not versions:
            raise KeyError(f"no schema registered for {database}.{table}")
        return self._schemas[(database, table, max(versions))]

    def versions(self, database: str, table: str) -> list[int]:
        return sorted(v for (d, t, v) in self._schemas if d == database and t == table)
