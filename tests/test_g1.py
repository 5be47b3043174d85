"""G1 collector support (SUPERSET — the reference grammar has no G1;
BASELINE.json's north star requires G1 phases).  Field-level goldens on
the G1 fixture plus the full Spark path: raw log → parse → enrich →
route."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark.core import calculate_rates, parse_log, to_bytes
from gclog_parser_spark.fixtures import G1LOG
from gclog_parser_spark.functions.export import to_seq_pairs
from gclog_parser_spark.operators.parse import parse_events
from gclog_parser_spark.operators.route import with_sink
from gclog_parser_spark.sources.pages import read_gc_logs


@pytest.fixture(scope="module")
def g1_events():
    return parse_log(G1LOG)


def test_g1_counts_and_classes(g1_events):
    assert len(g1_events) == 16
    by_class = {}
    for e in g1_events:
        by_class[e["gc_class"]] = by_class.get(e["gc_class"], 0) + 1
    # 6 concurrent phases + remark = 'g1'; pauses/cleanup/Full GC carry
    # heap and are structurally basic (incl. the humongous-allocation
    # and metadata-threshold initial-mark variants)
    assert by_class == {"g1": 7, "basic": 9}


def test_g1_evacuation_pause_fields(g1_events):
    ev = g1_events[0]
    assert ev["gc_type"] == "GC pause (young)"
    assert ev["gc_cause"] == "G1 Evacuation Pause"
    assert ev["heap"] == ("3785M", "3641M", "4096M")
    assert to_bytes(ev["heap"][0]) == 3785 * 1024 * 1024
    assert ev["pause"] == 0.0161942
    assert ev["age"] == 64.322


def test_g1_tags(g1_events):
    types = [e["gc_type"] for e in g1_events]
    assert "GC pause (young) (initial-mark)" in types
    assert "GC pause (mixed)" in types
    assert "GC pause (young) (to-space exhausted)" in types


def test_g1_remark_outer_pause_wins(g1_events):
    remark = next(e for e in g1_events if e["gc_type"] == "GC remark")
    # inner sub-phase brackets (Finalize Marking 0.0007422 etc.) are
    # discarded; the outer tail is the pause — same rule as ParNew's
    # inner pause (ParserTest.scala:170-180)
    assert remark["pause"] == 0.0281862


def test_g1_concurrent_start_zero_pause(g1_events):
    starts = [
        e for e in g1_events if e["gc_type"].endswith("-start")
    ]
    assert len(starts) == 3
    assert all(e["pause"] == 0.0 for e in starts)
    end = next(
        e
        for e in g1_events
        if e["gc_type"] == "GC concurrent-mark-end"
    )
    assert end["pause"] == 0.0756453


def test_g1_causeless_young_pause(g1_events):
    """'[GC pause (young) …' without -XX:+PrintGCCause: the tag must
    not be mistaken for a cause (tag-peek rule in _scan_collection)."""
    ev = g1_events[13]
    assert ev["gc_type"] == "GC pause (young)"
    assert ev["gc_cause"] is None
    assert ev["heap"] == ("1785M", "1641M", "4096M")


def test_g1_rates_full_gc(g1_events):
    rates = calculate_rates(g1_events)
    # Full GC (idx 12): allocated = own heap_before - prev heap_after
    # (prev = to-space-exhausted pause, 689M after)
    allocated = (5811 - 689) * 1024 * 1024
    millis = 69102 - 66222
    assert rates[12][0] == allocated
    assert rates[12][1] == millis
    assert rates[12][2] == allocated // millis


def test_g1_export_pairs(g1_events):
    pairs = to_seq_pairs(g1_events[0])
    assert pairs == [
        ("datetime", "2015-05-26 16:23:07.219"),
        ("age", "64.322"),
        ("type", "GC pause (young)"),
        ("cause", "G1 Evacuation Pause"),
        ("pause", "0.0161942"),
        ("heapBefore", str(3785 * 1024 * 1024)),
        ("heapAfter", str(3641 * 1024 * 1024)),
        ("heapReclaimed", str((3785 - 3641) * 1024 * 1024)),
        ("heapMax", str(4096 * 1024 * 1024)),
    ]


def test_g1_spark_path_routes_families(spark, tmp_path):
    p = tmp_path / "g1.log"
    p.write_text(G1LOG)
    events = parse_events(
        read_gc_logs(spark, str(p)), require_marker=False
    )
    routed = with_sink(events)
    fams = {
        r["sink"]: r["n"]
        for r in routed.groupBy("sink").agg(F.count("*").alias("n")).collect()
    }
    assert fams == {
        "g1_young": 6,       # young ×2 (one cause-less), initial-mark
                             # ×2, to-space exhausted, humongous alloc
        "g1_mixed": 1,
        "g1_concurrent": 8,  # 6 concurrent + remark + cleanup
        "full": 1,
    }
    assert events.count() == 16


def test_g1_humongous_pinned_fixture(spark):
    """G1 humongous analytics (round-5): every typed field pinned
    against hand-derived values from G1_HUMONGOUS_LOG — 2 legacy + 1
    unified alloc-pause causes, 3 region-accounting lines (18→2 and
    3→0 reclaim, 2→3 is growth and reclaims nothing), the 1M region
    size turning 19 reclaimed regions into bytes; both truncated tag
    lines must drop."""
    from datetime import datetime

    from gclog_parser_spark.fixtures import G1_HUMONGOUS_LOG
    from gclog_parser_spark.operators.enrich import (
        g1_humongous,
        g1_humongous_stats,
    )
    from gclog_parser_spark.schema import PAGES_SCHEMA

    pages = spark.createDataFrame(
        [("g1hum://t/0", datetime(2026, 8, 17), None,
          G1_HUMONGOUS_LOG, "en")],
        PAGES_SCHEMA,
    )
    rows = {r["line_no"]: r for r in g1_humongous(pages).collect()}
    assert sorted(rows) == [0, 2, 3, 4, 5, 7, 9]  # truncated 10,11 drop
    assert rows[0]["source"] == "legacy"
    assert rows[0]["kind"] == "alloc_pause"
    assert rows[0]["age_ms"] == 66222 and rows[0]["gc_id"] is None
    assert rows[2]["age_ms"] == 69102
    assert rows[3]["kind"] == "region_size"
    assert rows[3]["region_mb"] == 1 and rows[3]["age_ms"] is None
    assert rows[4]["source"] == "unified"
    assert rows[4]["kind"] == "alloc_pause"
    assert rows[4]["gc_id"] == 7 and rows[4]["age_ms"] == 1250
    assert rows[5]["kind"] == "regions"
    assert (rows[5]["regions_before"], rows[5]["regions_after"]) == (18, 2)
    assert (rows[7]["regions_before"], rows[7]["regions_after"]) == (2, 3)
    assert (rows[9]["regions_before"], rows[9]["regions_after"]) == (3, 0)

    (st,) = g1_humongous_stats(pages).collect()
    assert st["n_alloc_pauses"] == 3
    assert st["n_region_lines"] == 3
    assert st["peak_regions"] == 18
    assert st["regions_reclaimed"] == 16 + 0 + 3 == 19
    assert st["reclaimed_bytes"] == 19 * 1048576


def test_g1_humongous_no_region_size_line_yields_null_bytes(spark):
    """Without a gc,init Heap Region Size line the bytes column is
    NULL — never a guessed region size."""
    from datetime import datetime

    from gclog_parser_spark.operators.enrich import g1_humongous_stats
    from gclog_parser_spark.schema import PAGES_SCHEMA

    log = "\n".join([
        "[1.300s][info][gc,heap] GC(7) Humongous regions: 10->4",
    ])
    pages = spark.createDataFrame(
        [("g1hum://t/1", datetime(2026, 8, 17), None, log, "en")],
        PAGES_SCHEMA,
    )
    (st,) = g1_humongous_stats(pages).collect()
    assert st["regions_reclaimed"] == 6
    assert st["reclaimed_bytes"] is None
