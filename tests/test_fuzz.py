"""Robustness properties (hypothesis).  At the Common-Crawl design
point the parser sees arbitrary hostile text; the reference's contract
is 'unparseable lines silently vanish' (Parser.scala:75) — ours is the
same, strengthened to 'never raises, never hangs' for any input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gclog_parser_spark import core

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=400,
)

# adversarial fragments: things that LOOK like GC lines
NEARLY_GC = st.sampled_from(
    [
        "0.263: [GC",
        "1.2: [Full GC (Allocation",
        "2015-12-04T16:07:12.422+1100: 1.0: [GC 1K->2K(3K), 0.1 secs]",
        "{Heap before GC invocations=1 (full 0):",
        " PSYoungGen      total 66048K, used 1K [0x0, 0x0, 0x0)",
        "}",
        "Desired survivor size 100 bytes, new threshold 1 (max 6)",
        ": 1K->2K(3K), 0.1 secs]",
        "0.1: [GC 1K->2K(3K), secs]",
        "99.9: [GC-- 1K->2K(3K)",
        "0.5: Total time for which application threads were stopped: "
        "0.1 seconds",
        "[Times: user=0.01 sys=0.00, real=0.01 secs]",
        "1.0: [GC pause (G1 Evacuation Pause) (young)",
        "9.9: [CMS-concurrent-mark: 0.1/0.1 secs]",
    ]
)


@st.composite
def hostile_log(draw):
    parts = draw(
        st.lists(st.one_of(TEXT, NEARLY_GC), min_size=0, max_size=12)
    )
    return "\n".join(parts)


@settings(max_examples=300, deadline=None)
@given(hostile_log())
def test_parse_log_never_raises(text):
    for mode in (False, True):
        blocks = core.split_blocks(text, heap_stats=mode)
        for b in blocks:
            try:
                if mode and b.startswith("{"):
                    core.parse_heap_block(b)
                else:
                    core.parse_gc_line(b)
            except ValueError:
                pass  # the one sanctioned failure path (dropped upstream)


@settings(max_examples=300, deadline=None)
@given(hostile_log())
def test_incremental_never_raises_and_terminates(text):
    buf = []
    steps = 0
    for line in text.split("\n"):
        buf.append(line)
        while buf:
            steps += 1
            assert steps < 10_000
            status, _ = core.incremental_parse(buf)
            if status == core.GC_EVENT_PARSED:
                buf = []
            elif status == core.SKIP_LINE:
                buf = buf[1:]
            else:
                break


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**12),
       st.sampled_from("KMG%"))
def test_to_bytes_ladder(n, suffix):
    v = core.to_bytes(f"{n}{suffix}")
    mult = {"K": 1024, "M": 1024**2, "G": 1024**3, "%": 1}[suffix]
    assert v == n * mult


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # 0 basic-with-heap 1 cms 2 app 3 no-heap
            st.integers(0, 10**7),  # heap before K
            st.integers(0, 10**7),  # heap after K
            st.floats(0.001, 10**5),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_rate_invariants(specs):
    """calculate_rates on synthetic event streams: app-stopped rows are
    always (0,0,0,0); millis never negative for age-ordered input;
    rates are exactly truncating division."""
    events = []
    age = 0.0
    for kind, hb, ha, dage in specs:
        age += dage
        ev = {
            "gc_class": ["basic", "cms", "app_stopped", "basic"][kind],
            "gc_type": "GC",
            "gc_cause": None,
            "heap": (f"{hb}K", f"{ha}K", f"{hb + ha}K")
            if kind == 0
            else None,
            "generations": [],
            "pause": 0.0,
            "tenuring": None,
            "regions": [],
            "age": age,
            "time": None,
        }
        if kind == 2:
            ev.update({"stopped": 0.1, "to_stop": 0.01})
        events.append(ev)
    rates = core.calculate_rates(events)
    assert len(rates) == len(events)
    for ev, (alloc, millis, arate, prate) in zip(events, rates):
        if ev["gc_class"] == "app_stopped":
            assert (alloc, millis, arate, prate) == (0, 0, 0, 0)
        else:
            assert millis >= 0
            if millis > 0:
                q = abs(alloc) // millis
                assert arate == (q if alloc >= 0 else -q)
            else:
                assert arate == 0
