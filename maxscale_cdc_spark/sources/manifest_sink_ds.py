"""Custom Python DataSource WRITE path (Spark 4 `pyspark.sql.datasource`
DataSourceArrowWriter) — the other half of the DSv2 Python API surface
(sources/cdc_datasource.py covers the streaming READ half).

`manifest_parquet` is a batch sink with the classic two-phase commit
file protocol, implemented entirely in the public writer API:

  write (executors)   each task streams its Arrow batches to ONE
                      HIDDEN file (".tmp-part-<uuid>.parquet", written
                      with pyarrow) and returns a commit message
                      carrying (tmp name, row count).  Hidden names
                      mean a crashed/retried task can never make rows
                      visible.
  commit (driver)     rename every tmp to its visible name, then
                      atomically publish `_manifest.json` (tmp +
                      os.replace) listing files and per-file counts —
                      the manifest IS the commit point: readers
                      resolve the file list from it, so a dir without
                      a manifest serves zero rows.
  abort (driver)      delete every tmp file — a failed job leaves the
                      directory exactly as it found it.

Readers consume the manifest's file list with the ordinary parquet
scan (`spark.read.parquet(*files)`) — commit-protocol sinks do not
need a custom read path.

Scale: one file per task (no driver data movement; commit is O(files)
renames), the same write topology as every FileFormatWriter — the
Python layer only decides names and the commit point.

IMPLEMENTATION NOTE — like cdc_datasource, the classes are built in a
factory so the pickled class graph reaching executors references no
module globals; all imports are method-local.
"""

from __future__ import annotations

SINK_NAME = "manifest_parquet"
MANIFEST = "_manifest.json"


def _build_datasource_class():
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _FileMsg(WriterCommitMessage):
        fname: str | None
        n_rows: int

    class ManifestParquetWriter(DataSourceArrowWriter):
        def __init__(self, path: str, inject_fail: bool) -> None:
            import uuid

            self.path = path
            self.inject_fail = inject_fail
            # Per-writer attempt id, embedded in every tmp name: the
            # commit/abort orphan sweep removes ONLY this writer's tmp
            # files, so a second concurrent writer appending to the
            # same path can never have its in-flight tmps deleted by
            # this writer's commit (ADVICE r13).  Assigned on the
            # driver; executors see the same id via the pickled writer.
            self.wid = uuid.uuid4().hex[:12]

        def _tmp_prefix(self) -> str:
            return f".tmp-{self.wid}-part-"

        def write(self, iterator):  # executor-side
            import os
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            batches = list(iterator)
            if self.inject_fail and pid == 0:
                # the crash fixture: fail AFTER consuming input so the
                # abort path has real work to prove it cleans up
                raise RuntimeError("injected task failure (fixture)")
            if not batches:
                return _FileMsg(None, 0)
            tbl = pa.Table.from_batches(batches)
            fname = f"{self._tmp_prefix()}{pid:05d}-{uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, os.path.join(self.path, fname))
            return _FileMsg(fname, tbl.num_rows)

        def commit(self, messages):  # driver-side: the commit point
            import json
            import os

            files = []
            for m in messages:
                if m is None or m.fname is None:
                    continue
                visible = "part-" + m.fname[len(self._tmp_prefix()) :]
                os.replace(
                    os.path.join(self.path, m.fname),
                    os.path.join(self.path, visible),
                )
                files.append({"file": visible, "n_rows": m.n_rows})
            tmp = os.path.join(self.path, f".{MANIFEST}.tmp")
            with open(tmp, "w") as fh:
                json.dump({"files": files}, fh)
            os.replace(tmp, os.path.join(self.path, MANIFEST))
            # Sweep orphaned tmp files from retried/speculative first
            # attempts OF THIS WRITER: every committed tmp was just
            # renamed, so any survivor with this writer's id is by
            # construction uncommitted (ADVICE r12); other writers'
            # tmps are left alone (ADVICE r13).
            self._sweep_own_tmps()

        def _sweep_own_tmps(self) -> None:
            import os

            for f in os.listdir(self.path):
                if f.startswith(self._tmp_prefix()):
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass

        def abort(self, messages):  # driver-side: leave no trace
            self._sweep_own_tmps()

    from pyspark.sql.datasource import DataSourceStreamArrowWriter

    class ManifestParquetStreamWriter(DataSourceStreamArrowWriter):
        """The streaming twin: one manifest PER EPOCH
        (`_manifest-<batchId>.json`), each published atomically at
        commit(batchId) — committed epochs stay readable across a
        failure, the failing epoch is invisible, and a retried epoch
        re-publishes its manifest so only ITS files are referenced
        (orphaned tmp data from the failed attempt is never resolved
        by a reader) — exactly-once visibility from at-least-once
        execution."""

        def __init__(self, path: str, fail_epoch: int | None) -> None:
            import uuid

            self.path = path
            self.fail_epoch = fail_epoch
            # Same per-writer tmp scoping as the batch writer: one id
            # per streaming query run; a concurrent writer to the same
            # path keeps its in-flight tmps (ADVICE r13).
            self.wid = uuid.uuid4().hex[:12]

        def _tmp_prefix(self) -> str:
            return f".tmp-{self.wid}-part-"

        def _sweep_own_tmps(self) -> None:
            import os

            for f in os.listdir(self.path):
                if f.startswith(self._tmp_prefix()):
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass

        def write(self, iterator):  # executor-side, same as batch
            import os
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            batches = list(iterator)
            if not batches:
                return _FileMsg(None, 0)
            tbl = pa.Table.from_batches(batches)
            fname = f"{self._tmp_prefix()}{pid:05d}-{uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, os.path.join(self.path, fname))
            return _FileMsg(fname, tbl.num_rows)

        def commit(self, messages, batchId: int) -> None:
            import json
            import os

            if self.fail_epoch is not None and batchId == self.fail_epoch:
                # crash fixture: die BETWEEN write and manifest publish
                # (the worst spot — data written, commit point not)
                raise RuntimeError(
                    f"injected commit failure at epoch {batchId}"
                )
            files = []
            for m in messages:
                if m is None or m.fname is None:
                    continue
                visible = "part-" + m.fname[len(self._tmp_prefix()) :]
                os.replace(
                    os.path.join(self.path, m.fname),
                    os.path.join(self.path, visible),
                )
                files.append({"file": visible, "n_rows": m.n_rows})
            tmp = os.path.join(self.path, f".manifest-{batchId}.tmp")
            with open(tmp, "w") as fh:
                json.dump({"epoch": batchId, "files": files}, fh)
            os.replace(tmp, os.path.join(self.path, f"_manifest-{batchId}.json"))
            # Same orphan sweep as the batch commit, scoped to THIS
            # writer's id: this query's epochs are sequential, so after
            # this epoch's renames any remaining own-id tmp is residue
            # of a failed prior attempt.
            self._sweep_own_tmps()

        def abort(self, messages, batchId: int) -> None:
            self._sweep_own_tmps()

    class ManifestParquetSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "manifest_parquet"

        def writer(self, schema, overwrite: bool):
            import os

            path = self.options.get("path")
            if not path:
                raise ValueError("manifest_parquet requires option 'path'")
            os.makedirs(path, exist_ok=True)
            return ManifestParquetWriter(
                path, self.options.get("inject_fail") == "1"
            )

        def streamWriter(self, schema, overwrite: bool):
            import os

            path = self.options.get("path")
            if not path:
                raise ValueError("manifest_parquet requires option 'path'")
            os.makedirs(path, exist_ok=True)
            fe = self.options.get("fail_epoch")
            return ManifestParquetStreamWriter(
                path, int(fe) if fe is not None else None
            )

    return ManifestParquetSink


def register(spark) -> None:
    """Idempotently register the sink with a SparkSession."""
    spark.dataSource.register(_build_datasource_class())


def read_committed(spark, path: str):
    """Resolve the manifest's file list and scan it with the ordinary
    parquet reader; a directory without a manifest serves NOTHING
    (the commit-point contract)."""
    import json
    import os

    mpath = os.path.join(path, MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        man = json.load(fh)
    files = [os.path.join(path, f["file"]) for f in man["files"]]
    if not files:
        return None
    return spark.read.parquet(*files), man


def read_committed_epochs(spark, path: str):
    """Union every epoch manifest's file list (the streaming sink's
    read path): only files a committed epoch references are served —
    orphans from failed attempts are invisible.  Returns
    (DataFrame | None, manifests sorted by epoch)."""
    import json
    import os
    import re

    mans = []
    for f in sorted(os.listdir(path)):
        if re.fullmatch(r"_manifest-(\d+)\.json", f):
            with open(os.path.join(path, f)) as fh:
                mans.append(json.load(fh))
    mans.sort(key=lambda m: m["epoch"])
    files = [
        os.path.join(path, e["file"]) for m in mans for e in m["files"]
    ]
    if not files:
        return None, mans
    return spark.read.parquet(*files), mans
