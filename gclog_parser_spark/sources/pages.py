"""Input sources (SURVEY.md §2.1 S1/S2).

The reference reads whole GC-log files (or stdin) into memory, one log
per file, and loops over N input files through one sink
(Main.scala:16-31, StdIn.scala:9-23).  Here every source normalizes to
the Common-Crawl-style pages shape (BASELINE.json input_hint):
``(url, warc_ts, html, text, lang)`` — so the one pipeline serves both
raw-log users of the reference and the web-scale Iceberg corpus.

* ``read_pages`` — columnar pages table: Parquet now, Iceberg when a
  catalog is configured (same call site; the sandbox image carries no
  Iceberg runtime jar).
* ``read_gc_logs`` — reference-style raw log files via the binaryFile
  source: ``url`` = file path, ``warc_ts`` = file mtime, ``text`` = the
  whole log (S1's whole-file read, but per-task and Arrow-batched, never
  driver-memory).  A glob or list of paths reproduces S2's multi-file
  loop as a single distributed scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gclog_parser_spark.schema import PAGES_SCHEMA


def read_pages(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan the pages table.

    ``columns`` prunes the scan (ReadSchema): the parse stage needs only
    (url, warc_ts, text) — never pay for the ``html`` binary bytes.
    """
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
    else:
        df = spark.read.schema(PAGES_SCHEMA).parquet(path)
    return df.select(*columns) if columns else df


def read_gc_logs(spark: SparkSession, paths) -> DataFrame:
    """Raw ``-verbose:gc`` log files → pages shape.

    One row per file; ``binaryFile`` keeps the read distributed (one
    task per file, many files in parallel) instead of the reference's
    single-threaded read-all-to-memory (Main.scala:21 'could be smarter
    than reading all to memory').
    """
    if isinstance(paths, str):
        paths = [paths]
    raw = spark.read.format("binaryFile").load(paths)
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.decode("content", "UTF-8").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def union_pages(*sources: DataFrame) -> DataFrame:
    """S2 multi-source union: one event stream over many inputs."""
    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out
