"""JDK 9+ unified-logging (-Xlog:gc) support (SUPERSET — the reference
predates unified logging)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark.core import parse_log
from gclog_parser_spark.fixtures import UNIFIED_LOG
from gclog_parser_spark.operators.parse import parse_events
from gclog_parser_spark.operators.route import with_sink
from gclog_parser_spark.sources.pages import read_gc_logs


@pytest.fixture(scope="module")
def uni_events():
    return parse_log(UNIFIED_LOG)


def test_unified_counts_and_fields(uni_events):
    # 9 events: the [gc,start]/[gc,heap]/[gc,metaspace]/[gc,cpu] JDK 17
    # metadata lines are NOT events (only the [gc] summary is)
    assert len(uni_events) == 9
    first = uni_events[0]
    assert first["gc_type"] == "Pause Young (Normal)"
    assert first["gc_cause"] == "G1 Evacuation Pause"
    assert first["heap"] == ("24M", "4M", "256M")
    assert first["pause"] == 0.003523
    assert first["age"] == 0.231
    # optional ISO decoration parsed with offset preserved
    assert first["time"].isoformat() == "2026-08-17T01:02:03.456000+00:00"


def test_unified_phase_events(uni_events):
    cycle = uni_events[1]
    assert cycle["gc_class"] == "g1"
    assert cycle["gc_type"] == "Concurrent Mark Cycle"
    assert cycle["pause"] == 0.0
    mark = uni_events[2]
    assert mark["pause"] == 0.00123


def test_unified_full_gc_cause(uni_events):
    full = uni_events[6]
    assert full["gc_type"] == "Pause Full"
    assert full["gc_cause"] == "System.gc()"
    assert full["gc_class"] == "basic"
    assert full["pause"] == 0.102521


def test_unified_jdk17_variants(uni_events):
    """JDK 17 shapes: Prepare Mixed / Concurrent Start tags fold into
    the type; the surrounding [gc,start]/[gc,heap]/[gc,metaspace]/
    [gc,cpu] metadata lines yield no events."""
    prep = uni_events[7]
    assert prep["gc_type"] == "Pause Young (Prepare Mixed)"
    assert prep["gc_cause"] == "G1 Evacuation Pause"
    assert prep["heap"] == ("98M", "23M", "256M")
    assert prep["pause"] == 0.0031
    conc = uni_events[8]
    assert conc["gc_type"] == "Pause Young (Concurrent Start)"
    assert conc["gc_cause"] == "Metadata GC Threshold"


def test_unified_spark_both_stitch_strategies(spark, tmp_path):
    p = tmp_path / "uni.log"
    # interleave web-filler junk: must vanish silently
    lines = UNIFIED_LOG.split("\n")
    noisy = "\n".join(
        sum([[l, "some web page filler text"] for l in lines], [])
    )
    p.write_text(noisy)
    pages = read_gc_logs(spark, str(p))
    narrow = parse_events(pages, require_marker=False)
    window = parse_events(pages, stitch="window", require_marker=False)
    assert narrow.count() == 9
    cols = ["event_idx", "gc_class", "gc_type", "jvm_age_seconds",
            "heap_before_bytes", "pause_seconds"]
    assert sorted(map(tuple, narrow.select(*cols).collect())) == sorted(
        map(tuple, window.select(*cols).collect())
    )
    fams = {
        r["sink"]: r["n"]
        for r in with_sink(narrow)
        .groupBy("sink")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert fams == {
        "g1_young": 3,  # Normal + Prepare Mixed + Concurrent Start
        "g1_mixed": 1,
        "full": 1,
        "g1_concurrent": 4,
    }
