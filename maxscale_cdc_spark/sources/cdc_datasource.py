"""Custom Structured Streaming data source for the CDC wire protocol.

The closest Spark realization of the reference's `RequestData` entry
point (client.go:144-162): a PySpark DataSource (Spark 4 Python Data
Source API) named ``maxscale_cdc`` whose STREAM OFFSET IS THE GTID
POSITION — checkpoint/restart resumes exactly where the reference's
`WithGTID` would (client.go:122-126), and `Stop()`/restart maps to
query.stop() + checkpoint recovery (client.go:166-181).

The transport reads newline-delimited wire-format JSON from a spool
directory (each file ≙ one burst from the MaxScale socket; a real
deployment would point the spool at the TCP reader's output).  Decode
semantics mirror the reference scanner:

* DML iff line starts with ``{"domain":`` (client.go:410-412)
* ERR lines tolerated and skipped (client.go:261-267)
* 1 MiB event cap (client.go:17)
* envelope+payload decode (client.go:306-314)

Options:
  path            spool directory (required)
  database,table  stream selection (``REQUEST-DATA db.table``)
  startingGtid    resume position "d-s-seq" (default: from the beginning)

Spool contract: burst files are append-only with lexicographically
increasing names (binlog-style numbering) — the offset is a count over
the sorted listing, so earlier names must never appear later.

Scale note: one source partition per burst-file per micro-batch; at
production scale the spool is partitioned by GTID domain and
`partitions()` returns one split per (file, domain) — executor-parallel
decode with per-domain ordering preserved.

IMPLEMENTATION NOTE — the classes are built inside a factory and
registered BY VALUE: Spark plans Python streaming sources in a separate
worker process that cannot necessarily import this package, so the
pickled class graph must not reference module globals.
"""

from __future__ import annotations

SOURCE_NAME = "maxscale_cdc"

SOURCE_SCHEMA = (
    "domain INT, server_id INT, sequence BIGINT, event_number INT, "
    "timestamp BIGINT, event_type STRING, table_name STRING, "
    "table_schema STRING, payload STRING"
)


def build_cdc_datasource():
    """Create the DataSource class, fully self-contained (no references
    to this module's globals — see IMPLEMENTATION NOTE above)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    source_schema = (
        "domain INT, server_id INT, sequence BIGINT, event_number INT, "
        "timestamp BIGINT, event_type STRING, table_name STRING, "
        "table_schema STRING, payload STRING"
    )

    class _FileSlice(InputPartition):
        def __init__(self, path, start_gtid):
            self.path = path
            self.start_gtid = start_gtid

    class CDCStreamReader(DataSourceStreamReader):
        """Offset = {"gtid": [d, s, seq], "files": n} over the sorted
        spool listing.  Replaying a committed range yields identical
        rows → exactly-once under checkpoint recovery."""

        def __init__(self, options):
            self.path = options["path"]
            self.database = options.get("database")
            self.table = options.get("table")
            start = options.get("startinggtid") or options.get("startingGtid")
            if start:
                d, sv, q = start.split("-")
                self.start_gtid = (int(d), int(sv), int(q))
            else:
                self.start_gtid = (-1, -1, -1)

        def _spool_files(self):
            import os

            try:
                return sorted(
                    f
                    for f in os.listdir(self.path)
                    if f.endswith((".jsonl", ".txt"))
                )
            except FileNotFoundError:
                return []

        def initialOffset(self):
            return {"gtid": list(self.start_gtid), "files": 0}

        def latestOffset(self):
            return {"gtid": list(self.start_gtid), "files": len(self._spool_files())}

        def partitions(self, start, end):
            import os

            files = self._spool_files()
            lo, hi = start.get("files", 0), end.get("files", 0)
            sg = tuple(start.get("gtid", [-1, -1, -1]))
            return [
                _FileSlice(os.path.join(self.path, f), sg) for f in files[lo:hi]
            ]

        def commit(self, end):
            # spool retention is external (like the binlog's)
            pass

        def read(self, partition):
            # Yields Arrow RecordBatches, not tuples: per-row pickling
            # is the Python data source's slow path; columnar batches
            # move through the JVM boundary ~10× faster.
            import json

            import pyarrow as pa

            envelope_keys = (
                "domain",
                "server_id",
                "sequence",
                "event_number",
                "timestamp",
                "event_type",
                "table_name",
                "table_schema",
            )
            arrow_types = [
                pa.int32(), pa.int32(), pa.int64(), pa.int32(), pa.int64(),
                pa.string(), pa.string(), pa.string(), pa.string(),
            ]
            names = [
                "domain", "server_id", "sequence", "event_number",
                "timestamp", "event_type", "table_name", "table_schema",
                "payload",
            ]
            max_bytes = 1 << 20
            batch_rows = 20_000
            start = tuple(partition.start_gtid)
            cols: list[list] = [[] for _ in names]

            def flush():
                arrays = [
                    pa.array(c, type=t) for c, t in zip(cols, arrow_types)
                ]
                return pa.RecordBatch.from_arrays(arrays, names=names)

            with open(partition.path, "rb") as fh:
                for raw in fh:
                    line = raw.rstrip(b"\n")
                    if not line or len(line) > max_bytes:
                        continue  # token-cap guard (client.go:17)
                    if line.startswith(b"ERR"):
                        continue  # tolerated error (client.go:261-267)
                    if not line.startswith(b'{"domain":'):
                        continue  # DDL → schema registry path, not rows
                    try:
                        obj = json.loads(line)
                    except ValueError:
                        continue
                    if self.table and obj.get("table_name") != self.table:
                        continue
                    if self.database and obj.get("table_schema") != self.database:
                        continue
                    pos = (
                        int(obj.get("domain", 0)),
                        int(obj.get("server_id", 0)),
                        int(obj.get("sequence", 0)),
                    )
                    if pos < start:
                        continue  # resume-from-GTID (client.go:122-126)
                    payload = {
                        k: v for k, v in obj.items() if k not in envelope_keys
                    }
                    for col, v in zip(
                        cols,
                        (
                            pos[0],
                            pos[1],
                            pos[2],
                            int(obj.get("event_number", 0)),
                            int(obj.get("timestamp", 0)),
                            obj.get("event_type"),
                            obj.get("table_name"),
                            obj.get("table_schema"),
                            json.dumps(payload, sort_keys=True),
                        ),
                    ):
                        col.append(v)
                    if len(cols[0]) >= batch_rows:
                        yield flush()
                        cols = [[] for _ in names]
            if cols[0]:
                yield flush()

    class CDCDataSource(DataSource):
        @classmethod
        def name(cls):
            return "maxscale_cdc"

        def schema(self):
            return source_schema

        def streamReader(self, schema):
            return CDCStreamReader(self.options)

    return CDCDataSource


def register(spark) -> None:
    """Idempotently register the source on the session."""
    try:
        spark.dataSource.register(build_cdc_datasource())
    except Exception:
        pass
