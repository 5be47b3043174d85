"""Dynamic-column export + byte-identical string formatting.

Reproduces the reference's export layer exactly:

* ``to_export_pairs`` — the ordered, schema-dynamic (name, value) list of
  ``GCEvent.toExport`` (BasicGCEvent.scala:20-45, CmsGcEvent.scala:17-25,
  AppPausedEvent.scala:16-24, DetailedGCEvent.scala:13-21 incl. its
  ``distinct`` dedup of exact pairs).
* ``to_seq_pairs`` — the stringified form of ``GCEvent.toSeq``
  (GCEvent.scala:16-21): datetimes as 'yyyy-MM-dd HH:mm:ss.SSS' in the
  log's original offset, doubles in Java shortest-roundtrip form.
* ``tsv_lines`` / ``graphite_lines`` — the two output formats
  (output/OutputFormat.scala:9-36).

These run driver-side in tests and inside pandas UDFs in the Spark export
operators; they are pure functions over the core event dicts.
"""

from __future__ import annotations

from gclog_parser_spark.core import (
    jvm_age_millis,
    promoted_bytes,
    reclaimed_bytes,
    to_bytes,
)


def fmt_double(x: float) -> str:
    """Java ``Double.toString`` compatible rendering for the value ranges a
    GC log produces (|x| in [1e-3, 1e7): plain shortest round-trip decimal,
    trailing zeros stripped, at least one fractional digit).  Python's
    ``repr`` implements the same shortest-roundtrip rule in that range."""
    return repr(float(x))


def fmt_datetime(ev) -> str:
    """'yyyy-MM-dd HH:mm:ss.SSS' rendered in the parsed offset
    (GCEvent.scala:18; golden 'datetime,2015-12-04 16:07:12.422' for +1100
    at ParserTest.scala:26)."""
    t = ev["time"]
    return t.strftime("%Y-%m-%d %H:%M:%S.") + f"{t.microsecond // 1000:03d}"


def epoch_seconds(ev) -> int:
    """``time.getMillis / 1000`` (output/OutputFormat.scala:28)."""
    t = ev["time"]
    return int(t.timestamp())


def to_export_pairs(ev, rates=None):
    """Ordered (name, python-value) pairs for one event dict.

    ``rates`` is an optional (bytes_allocated, millis, alloc_rate,
    promo_rate) tuple appended as in GCEventWithRates.scala:13-19.
    """
    pairs = []
    cls = ev["gc_class"]
    if ev["time"] is not None:
        pairs.append(("datetime", fmt_datetime(ev)))
    pairs.append(("age", ev["age"]))
    pairs.append(("type", ev["gc_type"]))
    if cls == "app_stopped":
        # AppPausedEvent.scala:21-22: '%f' (6dp) formatting
        pairs.append(("stoppedSeconds", "%f" % ev["stopped"]))
        pairs.append(("secondsToStop", "%f" % ev["to_stop"]))
    else:
        if ev["gc_cause"] is not None:
            pairs.append(("cause", ev["gc_cause"]))
        pairs.append(("pause", ev["pause"]))
        if cls == "basic":
            heap = ev["heap"]
            pairs.append(("heapBefore", to_bytes(heap[0])))
            pairs.append(("heapAfter", to_bytes(heap[1])))
            pairs.append(("heapReclaimed", reclaimed_bytes(heap)))
            pairs.append(("heapMax", to_bytes(heap[2])))
            for name, b, a, c in ev["generations"]:
                pairs.append((f"{name}Before", to_bytes(b)))
                pairs.append((f"{name}After", to_bytes(a)))
                pairs.append((f"{name}Reclaimed", to_bytes(b) - to_bytes(a)))
                pairs.append((f"{name}Max", to_bytes(c)))
            promoted = promoted_bytes(ev)
            if promoted is not None:
                pairs.append(("promoted", promoted))
            if ev["tenuring"] is not None:
                desired, threshold = ev["tenuring"]
                pairs.append(("desiredSurvivorSize", desired))
                pairs.append(("newThreshold", threshold))
            for name, ub, ua, cb, ca in ev["regions"]:
                pairs.append((f"{name}Before", to_bytes(ub)))
                pairs.append((f"{name}After", to_bytes(ua)))
                pairs.append((f"{name}CapacityBefore", to_bytes(cb)))
                pairs.append((f"{name}CapacityAfter", to_bytes(ca)))
            if ev["regions"]:
                # DetailedGCEvent.scala:21 dedups exact (name, value) pairs
                # keeping first occurrence; the golden at
                # ParserTest.scala:271-308 depends on this.
                seen = set()
                deduped = []
                for p in pairs:
                    if p not in seen:
                        seen.add(p)
                        deduped.append(p)
                pairs = deduped
    if rates is not None:
        allocated, _, alloc_rate, promo_rate = rates
        pairs.append(("heapAllocated", allocated))
        pairs.append(("heapAllocationRate", alloc_rate))
        pairs.append(("promotionRate", promo_rate))
    return pairs


def to_seq_pairs(ev, rates=None):
    """Stringified export pairs (GCEvent.scala:16-21)."""
    out = []
    for name, value in to_export_pairs(ev, rates):
        if isinstance(value, float):
            out.append((name, fmt_double(value)))
        else:
            out.append((name, str(value)))
    return out


def tsv_lines(events, delimiter="\t", rates_list=None):
    """TsvOutputFormat (output/OutputFormat.scala:9-22): header from the
    *first* event's keys, then one delimited row per event.  (Later events
    with different shapes silently misalign — reference behavior kept for
    parity; the Spark export view uses the fixed superset schema instead.)
    """
    lines = []
    if events:
        first = to_seq_pairs(
            events[0], rates_list[0] if rates_list else None
        )
        lines.append(delimiter.join(k for k, _ in first))
    for i, ev in enumerate(events):
        pairs = to_seq_pairs(ev, rates_list[i] if rates_list else None)
        lines.append(delimiter.join(v for _, v in pairs))
    return lines


def graphite_lines(events, prefix="gc", rates_list=None):
    """GraphiteOutputFormat (output/OutputFormat.scala:24-36): unpivot to
    '<prefix>.<metric> <value> <epochSeconds>' lines, excluding the
    'datetime' key.  Requires event time (the reference NPEs otherwise)."""
    lines = []
    for i, ev in enumerate(events):
        ts = epoch_seconds(ev)
        for name, value in to_seq_pairs(
            ev, rates_list[i] if rates_list else None
        ):
            if name != "datetime":
                lines.append(f"{prefix}.{name} {value} {ts}")
    return lines
