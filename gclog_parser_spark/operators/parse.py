"""parse stage: pages → events DataFrame (SURVEY.md §2.2, §3.4).

Two physical strategies with identical semantics and output schema:

``stitch='narrow'`` (default) — **zero-shuffle**.  One page row holds one
complete log, so line grouping + event stitching run inside a single
``mapInPandas`` pass (Arrow-batched).  At the 100 TB design point this is
the plan of choice: throughput scales linearly with executors because
there is no exchange at all between the columnar scan and the event rows.

``stitch='window'`` — the north-rule **window-based line grouping**
(replaces the reference's recursive descent, Parser.scala:117-145):
``posexplode`` the lines, classify them with *native* Spark predicates,
**drop web filler before the shuffle** (the shuffle then carries only GC
candidate lines — a small fraction of the corpus), assign
``event_seq = sum(is_start) over (partition by url order by line_no)``,
re-assemble blocks with a hash aggregate that *reuses the window's
hash(url) partitioning* (no second exchange), and parse the stitched
blocks in ``mapInPandas``.  Use this when a single log is too large for
one task or when logs arrive pre-split in line-oriented chunks.

Both plans keep all heavy lifting either in WholeStageCodegen (classify,
group, re-assemble) or in Arrow-vectorized Python (block parse); there is
no row-at-a-time Python UDF anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

from gclog_parser_spark import core
from gclog_parser_spark.datagen import CLOSE_MARK, OPEN_MARK
from gclog_parser_spark.schema import EVENTS_SCHEMA

# Inside the UDF, timestamps travel as int64 epoch-micros: per-row
# pandas.Timestamp boxing on the way in and per-object datetime
# inspection on the way out were a measurable share of the Arrow
# boundary cost.  The public schema (EVENTS_SCHEMA) is restored by a
# native projection right after the UDF.
_UDF_SCHEMA = T.StructType(
    [
        T.StructField(
            f.name,
            T.LongType()
            if f.name in ("warc_ts", "event_time")
            else f.dataType,
            True,
        )
        for f in EVENTS_SCHEMA.fields
    ]
)

# Native-Spark (Java regex) versions of the core classifier anchors — keep
# in lockstep with core.classify_line.
_TS = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}[+-]\d{4}"
_AGE = r"\d+\.\d+"
GC_START_RLIKE = rf"^(?:{_TS}: )?{_AGE}: \["
APPSTOP_START_RLIKE = (
    rf"^(?:{_TS}: )?{_AGE}: Total time for which application threads "
    rf"were stopped: {_AGE} seconds, Stopping threads took:"
)
CONT_RLIKE = (
    r"^(?:Desired survivor size \d+ bytes,|- age |: \d+[KMG]->"
    r"| ?\[[A-Za-z0-9 \-]+: )"
)
# JDK 9+ unified logging start (core.UNIFIED_START_RE's Java-regex twin)
UNIFIED_START_RLIKE = (
    rf"^(?:\[{_TS}\])?\[\d+\.\d+s\](?:\[[^\]]+\])*"
    rf"\[gc(?:,[a-z]+)*\] +GC\(\d+\) "
)


def extract_gc_text(
    pages: DataFrame, text_col: str = "text", require_marker: bool = True
) -> DataFrame:
    """Columnar extraction of the embedded log: the bytes strictly between
    OPEN_MARK and CLOSE_MARK (datagen layout).  ``substring_index`` stays
    in WholeStageCodegen; the contains() pre-filter is pushed into the
    scan so pages without logs are skipped before any string surgery.

    ``require_marker=False`` serves marker-less inputs (raw log files
    from sources.read_gc_logs): ``substring_index`` is the identity when
    the delimiter is absent, so the same expression handles both."""
    c = F.col(text_col)
    gc_text = F.substring_index(
        F.substring_index(c, OPEN_MARK + "\n", -1), CLOSE_MARK, 1
    )
    if require_marker:
        pages = pages.where(c.contains(OPEN_MARK))
    return pages.select(
        "url",
        F.unix_micros("warc_ts").alias("warc_ts"),
        gc_text.alias("gc_text"),
    )


# ---------------------------------------------------------------------------
# Event-dict → schema record
# ---------------------------------------------------------------------------

_EPOCH_ORD = datetime(1970, 1, 1).toordinal()


def _epoch_us(t) -> int:
    """Exact epoch-micros from an aware datetime via integer field
    arithmetic — both ``t.timestamp()`` (float, rounds) and
    ``(t - epoch) // timedelta`` (timedelta allocation + floordiv,
    ~20 µs/event) were measurably wrong/slow in the hot loop."""
    secs = (
        (t.toordinal() - _EPOCH_ORD) * 86400
        + t.hour * 3600
        + t.minute * 60
        + t.second
    )
    us = secs * 1_000_000 + t.microsecond
    off = t.utcoffset()
    if off is not None:
        us -= (off.days * 86400 + off.seconds) * 1_000_000
    return us


def _event_record(url, warc_ts, event_idx, line_no, ev):
    heap = ev["heap"]
    t = ev["time"]
    promoted = core.promoted_bytes(ev)
    tenuring = ev["tenuring"]
    return {
        "url": url,
        "warc_ts": warc_ts,
        "event_idx": event_idx,
        "line_no": line_no,
        "event_time": _epoch_us(t) if t is not None else None,
        "tz_offset": core.tz_offset_str(t),
        "jvm_age_seconds": ev["age"],
        "gc_class": (
            "detailed" if ev["regions"] else ev["gc_class"]
        ),
        "gc_type": ev["gc_type"],
        "gc_cause": ev["gc_cause"],
        "heap_before_bytes": core.to_bytes(heap[0]) if heap else None,
        "heap_after_bytes": core.to_bytes(heap[1]) if heap else None,
        # ZGC summary lines carry no capacity → max stays NULL
        "heap_max_bytes": (
            core.to_bytes(heap[2])
            if heap and heap[2] is not None
            else None
        ),
        "heap_reclaimed_bytes": (
            core.reclaimed_bytes(heap) if heap else None
        ),
        "pause_seconds": ev["pause"],
        "generations": [
            {
                "name": g[0],
                "before_bytes": core.to_bytes(g[1]),
                "after_bytes": core.to_bytes(g[2]),
                "capacity_bytes": core.to_bytes(g[3]),
            }
            for g in ev["generations"]
        ],
        "regions": [
            {
                "name": r[0],
                "used_before": r[1],
                "used_after": r[2],
                "capacity_before": r[3],
                "capacity_after": r[4],
            }
            for r in ev["regions"]
        ],
        "promoted_bytes": promoted,
        "desired_survivor_size": int(tenuring[0]) if tenuring else None,
        "new_threshold": int(tenuring[1]) if tenuring else None,
        "stopped_seconds": ev.get("stopped"),
        "seconds_to_stop": ev.get("to_stop"),
    }


_COLUMNS = [f.name for f in EVENTS_SCHEMA.fields]


def _restore_timestamps(events: DataFrame) -> DataFrame:
    """int64 micros (UDF wire format) → TimestampType, native exprs."""
    return events.withColumns(
        {
            "warc_ts": F.timestamp_micros("warc_ts"),
            "event_time": F.timestamp_micros("event_time"),
        }
    )


def _records_to_pdf(records) -> pd.DataFrame:
    if not records:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in _COLUMNS})
    return pd.DataFrame.from_records(records, columns=_COLUMNS)


def _parse_block(block: str, heap_stats: bool):
    """Parse one stitched block; malformed blocks vanish like the
    reference's IgnoredLine (Parser.scala:75)."""
    try:
        if heap_stats:
            if block.startswith("{"):
                return core.parse_heap_block(block)
            ev = core.parse_gc_line(block)
            return ev if ev and ev["gc_class"] == "app_stopped" else None
        return core.parse_gc_line(block)
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# narrow path
# ---------------------------------------------------------------------------

def _parse_pages_fn(heap_stats: bool, counters=None):
    """``counters``: optional dict of SparkContext accumulators
    ('pages'/'events'/'skipped_blocks') — the north rule's per-partition
    metrics; near-zero overhead (one add per page / per block)."""

    def fn(iterator):
        n_pages = n_events = n_skipped = 0
        for pdf in iterator:
            records = []
            for url, wts, text in zip(
                pdf["url"], pdf["warc_ts"], pdf["gc_text"]
            ):
                n_pages += 1
                idx = 0
                for line_no, block in core.split_blocks_pos(
                    text, heap_stats
                ):
                    ev = _parse_block(block, heap_stats)
                    if ev is not None:
                        records.append(
                            _event_record(url, wts, idx, line_no, ev)
                        )
                        idx += 1
                    else:
                        n_skipped += 1
                n_events += idx
            yield _records_to_pdf(records)
        if counters:
            counters["pages"].add(n_pages)
            counters["events"].add(n_events)
            counters["skipped_blocks"].add(n_skipped)

    return fn


def parse_events_narrow(
    pages: DataFrame,
    mode: str = "gc_line",
    require_marker: bool = True,
    counters=None,
) -> DataFrame:
    src = extract_gc_text(pages, require_marker=require_marker)
    return _restore_timestamps(
        src.mapInPandas(
            _parse_pages_fn(mode == "heap_stats", counters), _UDF_SCHEMA
        )
    )


# ---------------------------------------------------------------------------
# window path
# ---------------------------------------------------------------------------

def _parse_blocks_fn(heap_stats: bool):
    def fn(iterator):
        for pdf in iterator:
            records = []
            for url, wts, line_no, block in zip(
                pdf["url"], pdf["warc_ts"], pdf["line_no"], pdf["block"]
            ):
                ev = _parse_block(block, heap_stats)
                if ev is not None:
                    # event_idx re-derived below by a row_number window
                    records.append(
                        _event_record(url, wts, -1, int(line_no), ev)
                    )
            yield _records_to_pdf(records)

    return fn


def parse_events_window(
    pages: DataFrame, mode: str = "gc_line", require_marker: bool = True
) -> DataFrame:
    heap_stats = mode == "heap_stats"
    src = extract_gc_text(pages, require_marker=require_marker)

    line = F.col("line")
    lines = src.select(
        "url",
        "warc_ts",
        F.posexplode(F.split("gc_text", "\n")).alias("line_no", "line"),
    )
    # ONE alternation regex for all three start shapes: each extra
    # rlike is a full regex-engine pass over every one of the ~70
    # lines/page, and the flags are needed twice (filter + carried
    # column) — computing them once in a projection, then filtering on
    # the materialized flags, keeps it to 2 regex passes per line
    start_any = (
        f"(?:{GC_START_RLIKE})|(?:{APPSTOP_START_RLIKE})"
        f"|(?:{UNIFIED_START_RLIKE})"
    )
    is_start = line.rlike(start_any)
    is_cont = line.rlike(CONT_RLIKE)
    if heap_stats:
        is_open = line.startswith("{Heap before")
        is_close = F.rtrim(line) == "}"
        # region lines are space-prefixed; the bare 'Heap after ...'
        # header must survive the pre-shuffle filter too
        is_cont = (
            is_cont
            | line.startswith(" ")
            | line.rlike(r"^\{?Heap (before|after)")
        )
    else:
        is_open = F.lit(False)
        is_close = F.lit(False)

    # Filler is dropped HERE, map-side, before the one shuffle: the
    # exchange carries only GC-candidate lines.
    lines = lines.select(
        "url",
        "warc_ts",
        "line_no",
        "line",
        is_start.alias("is_start"),
        is_cont.alias("is_cont"),
        is_open.cast("int").alias("opens"),
        is_close.cast("int").alias("closes"),
    ).where(
        F.col("is_start") | F.col("is_cont")
        | (F.col("opens") == 1) | (F.col("closes") == 1)
    ).drop("is_cont")

    w_prev = (
        Window.partitionBy("url")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cur = (
        Window.partitionBy("url")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    depth = (
        F.coalesce(F.sum("opens").over(w_prev), F.lit(0))
        - F.coalesce(F.sum("closes").over(w_prev), F.lit(0))
    )
    eff_start = (
        ((F.col("opens") == 1) | F.col("is_start")) & (depth == 0)
        if heap_stats
        else F.col("is_start")
    )
    lines = lines.withColumn(
        "event_seq", F.sum(eff_start.cast("int")).over(w_cur)
    ).where(F.col("event_seq") > 0)

    # Re-assemble blocks natively.  The hash aggregate's clustering on
    # (url, event_seq) is satisfied by the window's hash(url) exchange,
    # so this does NOT shuffle again.
    blocks = lines.groupBy("url", "warc_ts", "event_seq").agg(
        F.min("line_no").alias("line_no"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_no", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("block"),
    )

    events = _restore_timestamps(
        blocks.select("url", "warc_ts", "line_no", "block").mapInPandas(
            _parse_blocks_fn(heap_stats), _UDF_SCHEMA
        )
    )

    # Gap-free per-url event index (events DF is tiny vs the line stream).
    w_idx = Window.partitionBy("url").orderBy("line_no")
    return events.withColumn(
        "event_idx", (F.row_number().over(w_idx) - 1).cast("int")
    )


def parse_events(
    pages: DataFrame,
    mode: str = "gc_line",
    stitch: str = "narrow",
    repartition: int | None = None,
    require_marker: bool = True,
    counters=None,
) -> DataFrame:
    """Public API (reference ``Parser.parseLog`` /
    ``parseWithHeapStats``, Parser.scala:119-132; JavaParser.java:7-11).

    mode: 'gc_line' | 'heap_stats'; stitch: 'narrow' | 'window'.

    ``repartition``: explicit url-hash repartition before the parse (the
    north rule's 'explicit repartitioning on url-hash').  Use when the
    upstream scan is unbalanced — e.g. few large input files, or a skewed
    producer; at the 100 TB design point a well-bucketed Iceberg scan
    makes this unnecessary for the narrow path, while the window path
    re-clusters on url anyway.
    """
    if mode not in ("gc_line", "heap_stats"):
        raise ValueError(f"unknown mode {mode!r}")
    if repartition:
        pages = pages.repartition(repartition, "url")
    if stitch == "narrow":
        return parse_events_narrow(pages, mode, require_marker, counters)
    if stitch == "window":
        return parse_events_window(pages, mode, require_marker)
    raise ValueError(f"unknown stitch {stitch!r}")


# ---------------------------------------------------------------------------
# UDTF lane
# ---------------------------------------------------------------------------

def register_block_udtf(spark, name: str = "split_gc_blocks"):
    """The block splitter as a Python UDTF (Spark 4's table-function
    extension point — the fourth Python lane in this repo after the
    DataSource, ``mapInPandas``, and ``applyInPandasWithState``):
    ``SELECT s.* FROM pages p, LATERAL split_gc_blocks(p.url, p.text) s``
    gives ad-hoc SQL users the line-grouped GC blocks without the
    DataFrame API.  Emits exactly the (line_no, block) stream the
    narrow parse consumes (pinned in tests/test_udtf.py), so
    ``parse_gc_line`` over the UDTF output is a third physical parse
    strategy.  Scale shape: per-row generator, no shuffle — identical
    distribution behavior to the mapInPandas path, minus Arrow
    batching (the UDTF protocol is row-oriented, so the DataFrame
    paths stay the production default)."""
    from pyspark.sql.functions import udtf

    from gclog_parser_spark import core

    @udtf(returnType="line_no int, block string")
    class SplitBlocks:
        def eval(self, url, text):
            for line_no, block in core.split_blocks_pos(text, False):
                yield line_no, block

    spark.udtf.register(name, SplitBlocks)
    return SplitBlocks
