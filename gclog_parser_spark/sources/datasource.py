"""Spark 4 Python DataSource: ``spark.read.format("gclog")`` — the
reference's file source (SURVEY.md §2.1 S1/S2;
reference Main.scala:16-31 reads whole files single-threaded on the
driver) re-expressed as a first-class pluggable Spark source.

The source plans ONE partition per input file (the reference's
file-at-a-time loop becomes the partition boundary, so N files read on
N tasks) and yields ``(log_path, line_no, line)`` rows — the
line-grained shape the incremental window parse consumes.  Planning
happens driver-side from the file listing only; bytes are read inside
the executor task, Arrow-batched back to the JVM by the DataSource
runtime.

Usage::

    from gclog_parser_spark.sources.datasource import register
    register(spark)
    lines = (spark.read.format("gclog")
             .option("path", "/logs/*.log").load())
    tail = (spark.readStream.format("gclog")          # streaming twin
            .option("path", "/logs/*.log").load())    # file-arrival
                                                      # micro-batches

Scale: file-grained partitions match the GC-log domain (one JVM's log
is one file; logs are MBs, not TBs).  For pathological single huge
files, split upstream or use ``read_gc_logs`` (binaryFile) — this
source's contract is per-file ordered lines with stable numbering,
which byte-range splits cannot give without a seam protocol.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


@dataclass
class _FilePartition(InputPartition):
    path: str


def _expand(path: str) -> list[str]:
    """File, directory, or glob → sorted file list (deterministic
    partition order)."""
    import glob
    import os

    if any(ch in path for ch in "*?["):
        paths = glob.glob(path)
    elif os.path.isdir(path):
        paths = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        ]
    else:
        paths = [path]
    return sorted(paths)


class GcLogReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("gclog source requires .option('path', …)")
        self.path = path

    def partitions(self):
        paths = _expand(self.path)
        if not paths:
            raise FileNotFoundError(
                f"gclog source matched no files: {self.path}"
            )
        return [_FilePartition(p) for p in paths]

    def read(self, partition):
        # executor-side: stream the file, never whole-file in memory
        yield from _read_file(partition.path)


def _read_file(path: str):
    with open(path, encoding="utf-8", errors="replace") as f:
        for i, ln in enumerate(f):
            yield (path, i, ln.rstrip("\n"))


class GcLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin — the reference's stdin tail (StdIn.scala:9-23)
    as a micro-batch file-arrival stream: each batch consumes the files
    that appeared since the committed offset.

    Offset = ``{"files": [consumed file names…]}`` — a file is consumed
    exactly once even if listing order changes between batches, and
    ``readBetweenOffsets`` replays the exact file-set difference after
    a crash (deterministic replay = exactly-once with the idempotent
    sinks used throughout this repo).  Files must be closed/immutable
    when they land, the standard file-stream contract (Spark's own
    FileStreamSource assumes the same)."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("gclog source requires .option('path', …)")
        self.path = path

    def initialOffset(self) -> dict:
        return {"files": []}

    def read(self, start: dict):
        seen = set(start.get("files", []))
        files = [p for p in _expand(self.path) if p not in seen]
        # materialized (not a generator): the SimpleDataSourceStream
        # runtime prefetches batches driver-side and copy.copy()s the
        # iterator — list iterators support that, generators don't.
        # GC-log files are MBs; for TB-scale streams use the
        # partition-planning streamReader variant instead.
        rows = [r for p in files for r in _read_file(p)]
        end = {"files": sorted(seen | set(files))}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        new = sorted(
            set(end.get("files", [])) - set(start.get("files", []))
        )
        return iter([r for p in new for r in _read_file(p)])


class GcLogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gclog"

    def schema(self):
        return "log_path string, line_no int, line string"

    def reader(self, schema):
        return GcLogReader(self.options)

    def simpleStreamReader(self, schema):
        return GcLogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the ``gclog`` format."""
    spark.dataSource.register(GcLogDataSource)


def gclog_lines(spark, path: str):
    """Convenience: register + load."""
    register(spark)
    return spark.read.format("gclog").option("path", path).load()
