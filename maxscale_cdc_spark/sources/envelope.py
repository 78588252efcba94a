"""The CDC event envelope — the reference's DML event data model.

A DML change event is a JSON object with 8 fixed envelope keys plus a
dynamic row payload (reference: `event.go:188-212`, envelope key list
`event.go:220-236`).  The stream's total order is
`(domain, server_id, sequence, event_number)` (`event.go:189-200`); the
GTID string is `"{domain}-{server_id}-{sequence}"` (`event.go:216-218`).

Spark-side we keep the envelope as typed columns and the payload either
as typed columns (schema known from the registry) or as the raw JSON
string to be parsed with `from_json`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The 8 envelope keys stripped by the reference's TableData()
#: (event.go:220-236).
ENVELOPE_COLS = [
    "domain",
    "server_id",
    "sequence",
    "event_number",
    "timestamp",
    "event_type",
    "table_name",
    "table_schema",
]

#: DML event types (event.go:167-183).
DML_EVENT_TYPES = ["insert", "update_before", "update_after", "delete"]

#: Max event size honored by the reference scanner (client.go:17).
MAX_EVENT_BYTES = 1 << 20

#: Error-line prefix (client.go:25).
ERR_PREFIX = "ERR"

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.IntegerType()),
        T.StructField("server_id", T.IntegerType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("event_number", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("table_schema", T.StringType()),
    ]
)


def envelope_schema_with_payload(payload: T.StructType) -> T.StructType:
    """Envelope + typed payload columns (payload from the schema registry)."""
    return T.StructType(list(ENVELOPE_SCHEMA.fields) + list(payload.fields))


def gtid_col(
    domain: str | Column = "domain",
    server_id: str | Column = "server_id",
    sequence: str | Column = "sequence",
) -> Column:
    """GTID string synthesis — `"%d-%d-%d"` (event.go:216-218).

    Uses concat (not concat_ws): concat_ws silently skips NULL
    components, so a null sequence would yield a malformed "0-3000"
    that then misparses in gtid_struct-based resume compares.  With
    concat, any null component propagates to a NULL GTID."""
    d = F.col(domain) if isinstance(domain, str) else domain
    s = F.col(server_id) if isinstance(server_id, str) else server_id
    q = F.col(sequence) if isinstance(sequence, str) else sequence
    return F.concat(
        d.cast("string"), F.lit("-"), s.cast("string"), F.lit("-"), q.cast("string")
    )


def gtid_struct(gtid: Column) -> Column:
    """Parse a GTID string into a sortable struct<domain,server_id,sequence>.

    Catalyst orders structs lexicographically by field, which is exactly
    the GTID total order — no custom comparator needed.
    """
    parts = F.split(gtid, "-")
    return F.struct(
        parts.getItem(0).cast("int").alias("domain"),
        parts.getItem(1).cast("int").alias("server_id"),
        parts.getItem(2).cast("long").alias("sequence"),
    )


def position_col(df_or_prefix: DataFrame | None = None) -> Column:
    """Sortable stream-position struct (domain, server_id, sequence,
    event_number) — the total order of the stream (event.go:189-200)."""
    return F.struct(
        F.col("domain"), F.col("server_id"), F.col("sequence"), F.col("event_number")
    )


def is_dml_line(raw: Column) -> Column:
    """Event dispatch rule — a line is DML iff it starts with
    `{"domain":` (client.go:410-412)."""
    return raw.startswith('{"domain":')


def is_error_line(raw: Column) -> Column:
    """Error detection — response line starts with "ERR" (client.go:406-408)."""
    return raw.startswith(ERR_PREFIX)
