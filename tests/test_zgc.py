"""ZGC + Shenandoah unified-logging support (SUPERSET — the reference
predates both collectors)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark.core import parse_log
from gclog_parser_spark.fixtures import ZGC_LOG
from gclog_parser_spark.operators.parse import parse_events
from gclog_parser_spark.operators.route import with_sink
from gclog_parser_spark.sources.pages import read_gc_logs


@pytest.fixture(scope="module")
def zgc_events():
    return parse_log(ZGC_LOG)


def test_zgc_percent_heap_no_max(zgc_events):
    first = zgc_events[0]
    assert first["gc_type"] == "Garbage Collection"
    assert first["gc_cause"] == "Warmup"
    assert first["heap"] == ("104M", "88M", None)  # ZGC has no max
    assert first["gc_class"] == "basic"
    assert first["pause"] == 0.0
    assert first["time"].isoformat() == "2026-08-17T02:00:00.123000+00:00"


def test_zgc_generational_seconds_suffix(zgc_events):
    gen = zgc_events[2]
    assert gen["gc_type"] == "Minor Collection"
    assert gen["gc_cause"] == "Allocation Rate"
    assert gen["pause"] == 0.521
    assert gen["heap"] == ("3462M", "3252M", None)


def test_shenandoah_phases(zgc_events):
    init = zgc_events[4]
    assert init["gc_type"] == "Pause Init Mark"
    assert init["gc_class"] == "g1"  # heap-less pause = phase event
    assert init["pause"] == 0.000437
    marking = zgc_events[5]
    assert marking["gc_type"] == "Concurrent marking"
    assert marking["heap"] == ("16M", "17M", "64M")
    assert marking["gc_class"] == "basic"


def test_zgc_spark_path_and_routing(spark, tmp_path):
    p = tmp_path / "zgc.log"
    p.write_text(ZGC_LOG)
    events = parse_events(
        read_gc_logs(spark, str(p)), require_marker=False
    )
    assert events.count() == 8
    # ZGC rows carry NULL heap_max but real before/after bytes
    z = events.where(F.col("gc_type") == "Garbage Collection").collect()
    assert all(r["heap_max_bytes"] is None for r in z)
    assert all(r["heap_before_bytes"] > 0 for r in z)
    fams = {
        r["sink"]: r["n"]
        for r in with_sink(events)
        .groupBy("sink")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert fams == {
        "z_cycle": 4,        # 3 Garbage Collection + Minor Collection
        "shen_pause": 2,     # Init Mark + Final Mark
        "g1_concurrent": 2,  # Concurrent marking + cleanup
    }


def test_zgc_tsv_export_skips_heap_max(spark, tmp_path):
    """The dynamic export layout simply omits heapMax when ZGC has
    none — no crash, no empty field."""
    from gclog_parser_spark.operators.export import tsv_export
    from gclog_parser_spark.operators.rates import with_rates

    p = tmp_path / "zgc.log"
    p.write_text(ZGC_LOG)
    events = with_rates(
        parse_events(read_gc_logs(spark, str(p)), require_marker=False)
    )
    lines = [
        r["line"]
        for r in tsv_export(events).orderBy("line_no").collect()
    ]
    header = lines[0].split("\t")
    assert "heapBefore" in header and "heapMax" not in header


def test_zgc_generational_fixture_pinned(spark):
    """JDK 21+ generational ZGC (-Xlog:gc): 10 events from the 15
    fixture lines — 5 heap-less Minor/Major start phases + 5
    percent-transition completions with seconds pauses; the 5
    [gc,phases] y:/O: generation sub-phase lines are metadata and
    dropped.  Interleaved GC ids (minor 3 inside major 2) parse in
    line order; everything routes to the z_cycle sink."""
    from gclog_parser_spark.fixtures import ZGC_GEN_LOG

    events = parse_log(ZGC_GEN_LOG)
    assert len(events) == 10
    types = [e["gc_type"] for e in events]
    assert types.count("Minor Collection") == 6
    assert types.count("Major Collection") == 4
    # completions: percent heap transition (no max), seconds pause
    done = [e for e in events if e["heap"] is not None]
    assert len(done) == 5
    assert all(e["heap"][2] is None for e in done)
    assert [e["pause"] for e in done] == [
        0.051, 0.521, 0.2, 4.918, 0.462
    ]
    # the major completion carries its own cause again
    majors = [
        e for e in done if e["gc_type"] == "Major Collection"
    ]
    assert [e["gc_cause"] for e in majors] == [
        "Proactive", "Metadata GC Threshold"
    ]
    # start phases are heap-less zero-pause events (gc_class g1)
    starts = [e for e in events if e["heap"] is None]
    assert all(e["pause"] == 0.0 for e in starts)
    assert all(e["gc_class"] == "g1" for e in starts)
    # Spark route: every generational event lands in the z_cycle sink
    from gclog_parser_spark.schema import PAGES_SCHEMA
    from datetime import datetime

    pages = spark.createDataFrame(
        [("zgcgen://t/0", datetime(2026, 8, 17), None, ZGC_GEN_LOG,
          "en")],
        PAGES_SCHEMA,
    )
    ev = parse_events(pages, require_marker=False)
    sinks = {
        r["sink"]: r["n"]
        for r in with_sink(ev)
        .groupBy("sink")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sinks == {"z_cycle": 10}


def test_stall_rootcause_asof_semantics(spark):
    """Fixture walk-through: stalls BEFORE any completed cycle keep
    NULL cause columns; each later stall binds to the nearest
    STRICTLY-preceding completion (not a start line, not a later one);
    the truncated stall line never surfaces."""
    from datetime import datetime

    from gclog_parser_spark.fixtures import ZGC_STALL_LOG
    from gclog_parser_spark.operators.enrich import stall_rootcause
    from gclog_parser_spark.schema import PAGES_SCHEMA

    pages = spark.createDataFrame(
        [("z://1", datetime(2026, 8, 17), None, ZGC_STALL_LOG, "en")],
        PAGES_SCHEMA,
    )
    rows = {r["line_no"]: r for r in stall_rootcause(pages).collect()}
    # 8 stall-shaped lines minus the truncated one at line 9
    assert sorted(rows) == [1, 2, 3, 4, 6, 8, 11]
    for ln in (1, 2, 3, 4, 6):  # before the first completion (line 7)
        assert rows[ln]["gc_id"] is None
        assert rows[ln]["cycle_kind"] is None
        assert rows[ln]["lines_since"] is None
    r8 = rows[8]
    assert (r8["gc_id"], r8["cycle_kind"], r8["gc_cause"]) == (
        8, "Minor", "Allocation Rate",
    )
    assert r8["cycle_line_no"] == 7 and r8["lines_since"] == 1
    assert r8["cycle_us"] == 100000  # 0.100s, exact decimal cast
    r11 = rows[11]
    assert (r11["gc_id"], r11["cycle_kind"], r11["gc_cause"]) == (
        7, "Major", "Allocation Stall",
    )
    assert r11["cycle_line_no"] == 10 and r11["lines_since"] == 1
    assert r11["cycle_us"] == 4321000
    assert r11["stall_us"] == 33  # 0.033ms


def test_stall_rootcause_single_gen_dialect(spark):
    """Single-generation ZGC says 'Garbage Collection' and may omit the
    duration — the cycle binds, cycle_us stays NULL."""
    from datetime import datetime

    from gclog_parser_spark.operators.enrich import stall_rootcause
    from gclog_parser_spark.schema import PAGES_SCHEMA

    log = "\n".join([
        "[1.000s][info][gc] GC(3) Garbage Collection (Proactive)"
        " 8012M(94%)->2048M(24%)",
        "[1.100s][info][gc] Allocation Stall (worker) 5.000ms",
    ])
    pages = spark.createDataFrame(
        [("z://2", datetime(2026, 8, 17), None, log, "en")], PAGES_SCHEMA
    )
    r = stall_rootcause(pages).collect()
    assert len(r) == 1
    assert (r[0]["gc_id"], r[0]["cycle_kind"], r[0]["gc_cause"]) == (
        3, "Garbage", "Proactive",
    )
    assert r[0]["cycle_us"] is None
    assert r[0]["stall_us"] == 5000
