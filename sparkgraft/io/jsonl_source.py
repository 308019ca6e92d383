"""Custom Python DataSource (Spark 4 extension point): a partitioned JSONL
reader with correct byte-range split semantics and equality filter pushdown.

The engine's source surface (SURVEY §2.1: explicit-schema CSV via
``io.readers.read_csv``, parquet via ``read_table``) is built on Spark's
native readers; this module demonstrates the EXTENSION point — how a format
Spark does not ship gets first-class scan semantics:

- **splittable scans**: the file divides into byte slabs; a reader owns
  every line that STARTS in its slab (skip the partial first line unless at
  offset 0, read past the slab end to finish the last owned line) — the
  same convention as Hadoop TextInputFormat, so no line is lost or read
  twice at any partition count;
- **filter pushdown**: ``pushFilters`` accepts EqualTo on declared pushable
  columns and applies them during the scan (rows drop before ever reaching
  the engine), returning the rest for Spark to evaluate.

A production JSONL path would use Spark's native ``spark.read.json`` (JVM,
vectorized); this class is the template for sources with NO native reader
(proprietary formats, service APIs): the partition planning and pushdown
hooks are where the 100 TB behavior lives, and they are real here.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: columns an EqualTo filter may be pushed down on
PUSHABLE = ("lang", "source")

FORMAT_NAME = "sparkgraft_jsonl"


class _Slab(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.n_parts = int(options.get("numPartitions", "8"))
        self.pushed: list[tuple[str, object]] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and f.attribute[0] in PUSHABLE:
                self.pushed.append((f.attribute[0], f.value))
            else:
                remaining.append(f)
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
            if not files:
                # empty scan: a directory with no *.jsonl files. The Python
                # DataSource API requires >=1 partition, so emit one
                # zero-length sentinel slab read() skips (previously this
                # fell through to files[0] -> IndexError).
                return [_Slab("", 0, -1)]
        else:
            files = [self.path]
        n_per_file = max(1, self.n_parts // len(files))
        slabs: list[_Slab] = []
        for path in files:
            size = os.path.getsize(path)
            if size == 0:
                continue
            step = max(1, size // n_per_file)
            bounds = list(range(0, size, step)) + [size]
            slabs.extend(
                _Slab(path, bounds[i], bounds[i + 1])
                for i in range(len(bounds) - 1)
                if bounds[i] < bounds[i + 1]
            )
        return slabs or [_Slab(files[0], 0, 0)]

    def read(self, partition: _Slab) -> Iterator[tuple]:
        # Hadoop LineRecordReader ownership: this reader owns every line
        # whose START offset is in (start, end] — so it always discards the
        # first (possibly partial) line when start > 0, and reads one line
        # PAST end when a line starts exactly at end. The next slab begins
        # at end and discards that same line: no line is lost or duplicated
        # at any partition count, including line breaks exactly on slab
        # boundaries.
        fields = [f.name for f in self.schema.fields]
        if not partition.path:  # empty-scan sentinel (no input files)
            return
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                fh.readline()  # belongs to the previous slab
            pos = fh.tell()
            while pos <= partition.end:
                line = fh.readline()
                if not line:
                    break
                pos = fh.tell()
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if any(rec.get(k) != v for k, v in self.pushed):
                    continue
                yield tuple(rec.get(f) for f in fields)


class _Committed(WriterCommitMessage):
    def __init__(self, temp_path: str):
        self.temp_path = temp_path


class JsonlWriter(DataSourceWriter):
    """Task-isolated JSONL sink with a temp+rename commit protocol.

    Each task streams its rows to ``_temporary/part-<uuid>.jsonl``; only
    the driver-side ``commit`` renames the temp files into the output
    directory (rename is atomic on a POSIX fs), then removes the staging
    dir. A failed/speculative task's file stays in ``_temporary`` and is
    dropped by ``abort`` (or by the next overwrite) — readers never
    observe partial output. Same protocol shape as Hadoop
    FileOutputCommitter v1; on object stores, swap rename for a manifest
    commit (the message plumbing here is where that lives).
    """

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.fields = [f.name for f in schema.fields]
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        import os
        import uuid

        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, f"part-{uuid.uuid4().hex}.jsonl")
        with open(tmp, "w") as fh:
            for row in iterator:
                rec = {f: row[f] for f in self.fields}
                fh.write(json.dumps(rec) + "\n")
        return _Committed(tmp)

    def commit(self, messages) -> None:
        import os
        import shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            os.rename(
                m.temp_path, os.path.join(self.path, os.path.basename(m.temp_path))
            )
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        raise NotImplementedError(
            "sparkgraft_jsonl requires an explicit schema (.schema(...)) — "
            "no inference pass, same policy as io.readers.read_csv"
        )

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "JsonlSimpleStreamReader":  # noqa: N802
        return JsonlSimpleStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        import os

        os.makedirs(self.options["path"], exist_ok=True)
        return JsonlWriter(schema, self.options, overwrite)


def register(spark) -> None:
    """Register the format on a session (idempotent). Python-source filter
    pushdown is gated off by default; it is a dynamic SQL conf, so enable
    it here the same way readers.read_table sets its scan confs."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlDataSource)


class JsonlSimpleStreamReader:
    """Streaming face of the JSONL source (Spark 4
    ``SimpleDataSourceStreamReader``): one *.jsonl file per micro-batch,
    in sorted filename order.

    Offset protocol: the offset is the NAME of the last file read
    ({"last_file": name}), not a positional index — a positional index
    into a re-sorted listing breaks the moment a producer writes a file
    that sorts BEFORE already-read ones (the index then points at a
    different file: duplicated reads, skipped files, and corrupted
    ``readBetweenOffsets`` replay).  With a name watermark, replay of a
    committed span is exact under ANY later directory state: the span
    (start, end] selects files by name, which never re-maps.  The
    corollary producers must honor (standard for file streams): file
    names must be written in ascending sort order; a late file sorting
    below the watermark is ignored rather than silently corrupting
    offsets — same contract as a Kafka partition's monotone offsets.

    The simple-reader API reads on the DRIVER (Spark re-distributes rows
    to executors) — right for control-plane streams (file manifests,
    change feeds, service APIs); a data-plane firehose would implement
    the partitioned ``DataSourceStreamReader`` instead, with the same
    offset contract and the batch reader's slab semantics per partition.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.dir = options["path"]
        self.fields = [f.name for f in schema.fields]
        # positional legacy-offset translation is only sound on a directory
        # that was append-only since the legacy commit — a silent-corruption
        # risk the operator must accept explicitly (round-6 advice)
        self.legacy_resume = str(
            options.get("legacy_resume", "false")
        ).lower() in ("true", "1")

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"last_file": ""}

    def _files(self) -> list[str]:
        import glob
        import os

        return sorted(glob.glob(os.path.join(self.dir, "*.jsonl")))

    def _rows(self, path: str) -> list[tuple]:
        out = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    out.append(tuple(rec.get(f) for f in self.fields))
        return out

    def _last_file(self, offset: dict) -> str:
        """Extract the high-watermark filename from an offset, accepting
        the LEGACY ``{"files_read": N}`` format a pre-rename checkpoint
        may have committed: N files read == the Nth sorted filename is
        the watermark.  The legacy format is POSITIONAL, so this
        translation is exact only while the directory is append-only —
        the same assumption the legacy offsets themselves required to be
        meaningful.  A rotation that deletes old files AND adds new ones
        between the legacy commit and the resume keeps len(files)
        constant and would map N onto the wrong name undetectably (the
        range guard below only catches net shrinkage), so translating a
        MID-STREAM legacy offset requires the explicit
        ``legacy_resume=true`` source option — the operator's statement
        that the directory was append-only since the legacy commit;
        without it the resume refuses with guidance instead of risking a
        silent skip/duplication (``files_read: 0`` needs no such claim —
        it is the initial offset under any history).  The name-watermark
        format this source now commits has no such fragility — deletions
        below the watermark are harmless.  Unknown shapes raise a
        descriptive error instead of a bare KeyError so an operator
        knows to reset the checkpoint rather than chase a source bug."""
        import os

        if "last_file" in offset:
            return offset["last_file"]
        if "files_read" in offset:
            n = int(offset["files_read"])
            files = self._files()
            if n <= 0:
                return ""
            if not self.legacy_resume:
                raise ValueError(
                    f"checkpoint carries a legacy positional offset "
                    f"(files_read={n}); resuming it maps position onto "
                    f"filename and silently skips or re-reads data if "
                    f"{self.dir!r} rotated since the commit.  Pass source "
                    "option legacy_resume=true if the directory has only "
                    "ever been appended to, or reset the checkpoint "
                    "directory to restart from scratch"
                )
            if n > len(files):
                raise ValueError(
                    f"legacy offset files_read={n} exceeds the {len(files)} "
                    f"files currently in {self.dir!r} — files were deleted "
                    "after the checkpoint; reset the checkpoint directory"
                )
            return os.path.basename(files[n - 1])
        raise ValueError(
            f"unrecognized stream offset {offset!r} (expected 'last_file' "
            "or legacy 'files_read') — reset the checkpoint directory to "
            "restart this stream from scratch"
        )

    def read(self, start: dict):  # noqa: N802 (API name)
        import os

        last = self._last_file(start)
        pending = [f for f in self._files() if os.path.basename(f) > last]
        if not pending:
            return iter([]), {"last_file": last}
        nxt = pending[0]
        return iter(self._rows(nxt)), {"last_file": os.path.basename(nxt)}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        import os

        lo, hi = self._last_file(start), self._last_file(end)
        rows: list[tuple] = []
        for f in self._files():
            name = os.path.basename(f)
            if lo < name <= hi:
                rows.extend(self._rows(f))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass
