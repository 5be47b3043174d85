"""End-to-end Spark tests: deterministic pages → parse (both stitch
strategies) → events, checked against the pure-Python core parser and the
reference-pinned per-fixture event counts (FIXTURES.md §3)."""

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark import core
from gclog_parser_spark.datagen import (
    pages_from_documents,
    synth_pages,
)
from gclog_parser_spark.fixtures import all_classes, fixture_text
from gclog_parser_spark.operators.parse import extract_gc_text, parse_events


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, 40, parallelism=4, with_meta=True).cache()


def test_extracted_text_byte_identical(spark, pages):
    """The per-row invariant (BASELINE.json input_hint): extracted text
    equals the embedded fixture bytes exactly."""
    rows = extract_gc_text(pages.withColumnRenamed("doc_id", "d")).join(
        pages.select(F.col("url"), "gclog_class"), "url"
    ).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["gc_text"] == fixture_text(r["gclog_class"]), r["url"]


@pytest.mark.parametrize("stitch", ["narrow", "window"])
def test_gcline_counts_per_class(spark, pages, stitch):
    events = parse_events(pages, mode="gc_line", stitch=stitch)
    got = {
        r["gclog_class"]: r["n"]
        for r in events.join(
            pages.select("url", "gclog_class"), "url"
        )
        .groupBy("gclog_class")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expected = {}
    for _, name, _, n_line, _ in all_classes():
        expected[name] = expected.get(name, 0) + n_line * 4  # 40 pages / 10
    assert got == expected


@pytest.mark.parametrize("stitch", ["narrow", "window"])
def test_heap_stats_counts_per_class(spark, pages, stitch):
    events = parse_events(pages, mode="heap_stats", stitch=stitch)
    got = {
        r["gclog_class"]: r["n"]
        for r in events.join(pages.select("url", "gclog_class"), "url")
        .groupBy("gclog_class")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expected = {
        name: n_heap * 4 for _, name, _, _, n_heap in all_classes() if n_heap
    }
    assert got == expected


def test_narrow_equals_window(spark, pages):
    """Both physical strategies must produce identical logical results."""
    for mode in ("gc_line", "heap_stats"):
        a = parse_events(pages, mode=mode, stitch="narrow")
        b = parse_events(pages, mode=mode, stitch="window")
        cols = [c for c in a.columns]
        sa = sorted(map(repr, a.select(cols).collect()))
        sb = sorted(map(repr, b.select(cols).collect()))
        assert sa == sb, f"mode={mode}"


def test_events_match_core_parser(spark, pages):
    """Spark events equal the pure-Python core parse of the same fixture,
    field for field, for one url of every class."""
    sample = {
        r["gclog_class"]: r["url"]
        for r in pages.select("url", "gclog_class").collect()
    }
    events = (
        parse_events(pages, mode="gc_line", stitch="narrow")
        .where(F.col("url").isin(list(sample.values())))
        .collect()
    )
    by_url = {}
    for r in events:
        by_url.setdefault(r["url"], []).append(r)
    for cls, url in sample.items():
        expect = core.parse_log(fixture_text(cls))
        got = sorted(by_url.get(url, []), key=lambda r: r["event_idx"])
        assert len(got) == len(expect), cls
        for g, e in zip(got, expect):
            assert g["gc_type"] == e["gc_type"]
            assert g["jvm_age_seconds"] == e["age"]
            assert g["pause_seconds"] == e["pause"]
            assert g["gc_cause"] == e["gc_cause"]
            if e["heap"]:
                assert g["heap_before_bytes"] == core.to_bytes(e["heap"][0])
                assert g["heap_reclaimed_bytes"] == core.reclaimed_bytes(
                    e["heap"]
                )
            assert len(g["generations"] or []) == len(e["generations"])
            assert g["tz_offset"] == core.tz_offset_str(e["time"])


def test_pages_from_documents(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir, with_meta=True)
    n = pages.count()
    assert n == 500  # sf0.001 documents rows
    # every class present 50×
    counts = dict(
        pages.groupBy("gclog_class").count().collect()
    )
    assert all(v == 50 for v in counts.values()) and len(counts) == 10
    # hot-hour skew by construction
    hours = dict(
        pages.groupBy(F.hour("warc_ts").alias("h")).count().collect()
    )
    assert hours[4] > n * 0.6
