"""Spark-4 Python DataSource (format 'gclog') — partition planning,
ordering, and parity with the binaryFile S1 source.  Value parity vs
DuckDB read_text runs in test_oracle_parity.py (gc_source_lines)."""

import os

import pyspark.sql.functions as F
import pytest

import gclog_parser_spark
from gclog_parser_spark.sources.datasource import gclog_lines

RES = os.path.join(
    os.path.dirname(gclog_parser_spark.__file__), "resources"
)
GLOB = os.path.join(RES, "*.log")


def test_one_partition_per_file(spark):
    df = gclog_lines(spark, GLOB)
    import glob

    n_files = len(glob.glob(GLOB))
    assert df.rdd.getNumPartitions() == n_files
    assert df.columns == ["log_path", "line_no", "line"]


def test_lines_reassemble_to_binaryfile_text(spark):
    """Joining the source's ordered lines must reproduce the exact
    whole-file text the binaryFile S1 source reads (modulo one
    trailing newline)."""
    from gclog_parser_spark.sources.pages import read_gc_logs

    ours = (
        gclog_lines(spark, GLOB)
        .groupBy("log_path")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text")
        )
    )
    theirs = read_gc_logs(spark, GLOB).select(
        F.regexp_replace(F.col("url"), "^file:", "").alias("log_path"),
        F.regexp_replace(F.col("text"), "\\n+$", "").alias("text"),
    )
    got = {r["log_path"]: r["text"] for r in ours.collect()}
    want = {r["log_path"]: r["text"] for r in theirs.collect()}
    assert set(got) == set(want) and len(got) > 0
    for k in want:
        assert got[k] == want[k], k


def test_missing_path_fails_at_planning(spark):
    from gclog_parser_spark.sources.datasource import register

    register(spark)
    df = (
        spark.read.format("gclog")
        .option("path", "/nonexistent/nowhere-*.log")
        .load()
    )
    with pytest.raises(Exception, match="matched no files"):
        df.count()


def test_line_numbers_are_zero_based_and_dense(spark):
    df = gclog_lines(spark, os.path.join(RES, "basic-java8-gc.log"))
    rows = sorted(
        (r["line_no"] for r in df.collect())
    )
    assert rows == list(range(len(rows))) and rows[0] == 0


def test_stream_reader_consumes_each_file_exactly_once(spark, tmp_path):
    """Micro-batch file-arrival stream: files landing between batches
    are consumed exactly once, and a restart over the same checkpoint
    re-emits nothing (exactly-once into the file sink)."""
    from gclog_parser_spark.sources.datasource import register

    register(spark)
    src = tmp_path / "logs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (src / "a.log").write_text("a1\na2\n")
    (src / "b.log").write_text("b1\n")

    def start():
        return (
            spark.readStream.format("gclog")
            .option("path", str(src / "*.log"))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    (src / "c.log").write_text("c1\nc2\nc3\n")  # lands mid-stream
    q.processAllAvailable()
    q.stop()

    def rows():
        return sorted(
            (r["log_path"].split("/")[-1], r["line_no"], r["line"])
            for r in spark.read.parquet(out).collect()
        )

    assert rows() == [
        ("a.log", 0, "a1"), ("a.log", 1, "a2"),
        ("b.log", 0, "b1"),
        ("c.log", 0, "c1"), ("c.log", 1, "c2"), ("c.log", 2, "c3"),
    ]

    # restart on the same checkpoint: committed files never re-emit,
    # a file added after the restart arrives exactly once
    q2 = start()
    q2.processAllAvailable()
    (src / "d.log").write_text("d1\n")
    q2.processAllAvailable()
    q2.stop()
    got2 = rows()
    assert got2.count(("d.log", 0, "d1")) == 1
    assert len(got2) == 7
