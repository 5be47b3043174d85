"""Streaming pipeline == batch pipeline, plus restart/exactly-once
semantics via the streaming checkpoint."""

from __future__ import annotations

import pyspark.sql.functions as F

from gclog_parser_spark.datagen import pages_from_documents
from gclog_parser_spark.operators.aggregate import per_sink_hourly
from gclog_parser_spark.plans.pipeline import build_events
from gclog_parser_spark.streaming.stream import (
    run_fanout_stream,
    run_hourly_stream,
)


def _write_pages_in_slices(spark, sf_dir, path, slices=3):
    pages = pages_from_documents(spark, sf_dir)
    # several files so availableNow processes multiple micro-batch units
    pages.repartition(slices).write.parquet(path)
    return pages


def test_stream_fanout_matches_batch(spark, sf_dir, tmp_path):
    inp = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = _write_pages_in_slices(spark, sf_dir, inp)

    q = run_fanout_stream(spark, inp, out, ckpt)
    q.awaitTermination(300)

    batch = build_events(pages)
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    want_by_sink = {
        r["sink"]: r["n"]
        for r in batch.groupBy("sink").agg(F.count("*").alias("n")).collect()
    }
    got_by_sink = {
        r["sink"]: r["n"]
        for r in got.groupBy("sink").agg(F.count("*").alias("n")).collect()
    }
    assert got_by_sink == want_by_sink

    # restart with same checkpoint: offsets are committed, nothing re-reads
    q2 = run_fanout_stream(spark, inp, out, ckpt)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_hourly_agg_matches_batch(spark, sf_dir, tmp_path):
    inp = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    pages = _write_pages_in_slices(spark, sf_dir, inp)

    q = run_hourly_stream(spark, inp, ckpt, query_name="t_hourly")
    q.awaitTermination(300)

    got = {
        (r["sink"], r["hour"], r["events"], r["heap_reclaimed_sum"])
        for r in spark.sql("select * from t_hourly").collect()
    }
    batch = per_sink_hourly(build_events(pages), exact=True)
    want = {
        (r["sink"], r["hour"], r["events"], r["heap_reclaimed_sum"])
        for r in batch.select(
            "sink", "hour", "events", "heap_reclaimed_sum"
        ).collect()
    }
    assert got == want
