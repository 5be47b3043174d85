"""Incremental tri-state consumption (Parser.scala:134-151; trace
behavior mirrored from ParserTest.scala:323-363): drive line-by-line
like the reference's streaming caller and assert the skip / accumulate /
emit replies and that the emitted events equal whole-log parsing."""

from __future__ import annotations

from gclog_parser_spark.core import (
    GC_EVENT_PARSED,
    NEED_ANOTHER_LINE,
    SKIP_LINE,
    incremental_parse,
    parse_log,
    parse_with_heap_stats,
)
from gclog_parser_spark.fixtures import fixture_text


def drive(text: str, heap_stats: bool = False):
    """Reference caller loop: accumulate lines; on parsed → emit+reset,
    on skip → drop the first buffered line and retry the remainder."""
    events, statuses, buf = [], [], []
    for line in text.split("\n"):
        buf.append(line)
        while buf:
            status, ev = incremental_parse(buf, heap_stats)
            statuses.append(status)
            if status == GC_EVENT_PARSED:
                events.append(ev)
                buf = []
            elif status == SKIP_LINE:
                buf = buf[1:]
            else:
                break
    # flush: drop head lines until nothing parses (EOF behavior)
    while buf:
        status, ev = incremental_parse(buf, heap_stats)
        if status == GC_EVENT_PARSED:
            events.append(ev)
            buf = []
        else:
            buf = buf[1:]
    return events, statuses


def test_single_line_event_immediate():
    line = "0.263: [GC 65536K->57253K(506816K), 0.0499922 secs]"
    status, ev = incremental_parse([line])
    assert status == GC_EVENT_PARSED
    assert ev["pause"] == 0.0499922


def test_banner_line_skipped():
    status, ev = incremental_parse(
        ["Java HotSpot(TM) 64-Bit Server VM (25.66-b17)"]
    )
    assert status == SKIP_LINE


def test_multiline_accumulates_then_emits():
    lines = [
        "2015-12-04T16:07:12.422+1100: 6994.482: [GC (Allocation Failure) "
        "6994.482: [ParNew",
        "Desired survivor size 41943040 bytes, new threshold 6 (max 6)",
        "- age   1:    4550112 bytes,    4550112 total",
        ": 670935K->9957K(737280K), 0.0165734 secs] "
        "670935K->9957K(2015232K), 0.0167094 secs] "
        "[Times: user=0.06 sys=0.00, real=0.02 secs]",
    ]
    for i in range(1, len(lines)):
        status, _ = incremental_parse(lines[:i])
        assert status == NEED_ANOTHER_LINE, i
    status, ev = incremental_parse(lines)
    assert status == GC_EVENT_PARSED
    assert ev["gc_type"] == "GC"
    assert ev["tenuring"] == ("41943040", "6")


def test_drive_matches_whole_log_parse():
    for name in ("basic7", "basic8", "details8", "cmsfull", "waits"):
        text = fixture_text(name)
        events, _ = drive(text)
        assert events == parse_log(text), name


def test_drive_heap_stats_matches():
    for name in ("fragment", "cms", "heap7", "heap8"):
        text = fixture_text(name)
        events, statuses = drive(text, heap_stats=True)
        assert events == parse_with_heap_stats(text), name
        assert NEED_ANOTHER_LINE in statuses  # brace blocks accumulated


def test_heap_block_waits_for_closing_brace():
    text = fixture_text("fragment")
    lines = text.split("\n")
    start = next(
        i for i, l in enumerate(lines) if l.startswith("{Heap before")
    )
    end = next(
        i for i in range(start, len(lines)) if lines[i].rstrip() == "}"
    )
    for i in range(start + 1, end + 1):
        status, _ = incremental_parse(lines[start:i], heap_stats=True)
        assert status == NEED_ANOTHER_LINE, i
    status, ev = incremental_parse(
        lines[start : end + 1], heap_stats=True
    )
    assert status == GC_EVENT_PARSED
    assert ev["regions"]
