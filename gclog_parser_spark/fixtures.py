"""GC-log payload corpus for the deterministic pages generator.

Ten content classes (FIXTURES.md §3): the nine reference fixture files
(embedded verbatim — the per-row invariant is byte-identical extracted
text per url) plus one inline class composed from the reference's inline
test lines (CMS full cycle, promotion failures, plumbr.eu handbook
examples; ParserTest.scala:428-519).

Expected per-class event counts are pinned by the reference tests and
re-checked in tests/test_datagen.py; the driver-facing aggregate oracles
derive from them.
"""

from __future__ import annotations

from importlib.resources import files

_RES = files("gclog_parser_spark") / "resources"

#: inline class: full CMS cycle + GC-- + java8 '--' promotion failure +
#: CMS Full GC + plumbr serial/parallel examples (15 GcLine events).
CMSFULL = "\n".join(
    [
        "2015-05-26T16:23:07.321-0200: 64.425: [GC (CMS Initial Mark) [1 CMS-initial-mark: 10812086K(11901376K)] 10887844K(12514816K), 0.0001997 secs] [Times: user=0.00 sys=0.00, real=0.00 secs]",
        "2015-05-26T16:23:07.321-0200: 64.425: [CMS-concurrent-mark-start]",
        "2015-05-26T16:23:07.357-0200: 64.460: [CMS-concurrent-mark: 0.035/0.035 secs] [Times: user=0.07 sys=0.00, real=0.03 secs]",
        "2015-05-26T16:23:07.357-0200: 64.460: [CMS-concurrent-preclean-start]",
        "2015-05-26T16:23:07.373-0200: 64.476: [CMS-concurrent-preclean: 0.016/0.016 secs] [Times: user=0.02 sys=0.00, real=0.02 secs]",
        "2015-05-26T16:23:07.373-0200: 64.476: [CMS-concurrent-abortable-preclean-start]",
        "2015-05-26T16:23:08.446-0200: 65.550: [CMS-concurrent-abortable-preclean: 0.167/1.074 secs] [Times: user=0.20 sys=0.00, real=1.07 secs]",
        "2015-05-26T16:23:08.447-0200: 65.550: [GC (CMS Final Remark) [YG occupancy: 387920 K (613440 K)]65.550: [Rescan (parallel) , 0.0085125 secs]65.559: [weak refs processing, 0.0000243 secs]65.559: [class unloading, 0.0013120 secs]65.560: [scrub symbol table, 0.0008345 secs]65.561: [scrub string table, 0.0001759 secs][1 CMS-remark: 10812086K(11901376K)] 11200006K(12514816K), 0.0110730 secs] [Times: user=0.06 sys=0.00, real=0.01 secs]",
        "2015-05-26T16:23:08.458-0200: 65.561: [CMS-concurrent-sweep-start]",
        "2015-05-26T16:23:08.485-0200: 65.588: [CMS-concurrent-sweep: 0.027/0.027 secs] [Times: user=0.03 sys=0.00, real=0.03 secs]",
        "2015-05-26T16:23:08.485-0200: 65.589: [CMS-concurrent-reset-start]",
        "2015-05-26T16:23:08.497-0200: 65.601: [CMS-concurrent-reset: 0.012/0.012 secs] [Times: user=0.01 sys=0.00, real=0.01 secs]",
        "2015-12-10T15:42:08.076+1100: 523890.136: [GC-- [PSYoungGen: 1275256K->1275256K(1275264K)] 4007798K->4071477K(4071488K), 0.3913740 secs] [Times: user=0.54 sys=0.00, real=0.39 secs]",
        "2016-01-28T16:20:24.390+1100: 94045.178: [GC (Allocation Failure) --[PSYoungGen: 1256250K->1256250K(1256448K)] 4037337K->4052791K(4052992K), 0.4414726 secs] [Times: user=0.51 sys=0.00, real=0.45 secs]",
        "29517.100: [Full GC (Allocation Failure) 29517.100: [CMS: 819199K->819199K(819200K), 3.2809595 secs] 1762879K->1762879K(1762880K), [Metaspace: 21995K->21995K(1069056K)], 3.2810538 secs] [Times: user=3.28 sys=0.00, real=3.28 secs]",
    ]
)

#: G1 collector log (SUPERSET — the reference grammar has no G1; the
#: north star requires G1 phases).  Composed from the standard
#: -XX:+UseG1GC -verbose:gc line shapes: evacuation pauses
#: (young / initial-mark / mixed / to-space exhausted), the concurrent
#: cycle (root-region-scan, mark, cleanup), remark with sub-phases,
#: cleanup with sizes, and a G1 Full GC.  Not part of the pages datagen
#: (class ids are frozen by the driver oracles); exercised via the
#: raw-log source and core goldens.
G1LOG = "\n".join(
    [
        "2015-05-26T16:23:07.219-0200: 64.322: [GC pause (G1 Evacuation Pause) (young) 3785M->3641M(4096M), 0.0161942 secs]",
        "2015-05-26T16:23:07.321-0200: 64.425: [GC pause (G1 Evacuation Pause) (young) (initial-mark) 3857M->3643M(4096M), 0.0304710 secs]",
        "2015-05-26T16:23:07.357-0200: 64.460: [GC concurrent-root-region-scan-start]",
        "2015-05-26T16:23:07.359-0200: 64.462: [GC concurrent-root-region-scan-end, 0.0022521 secs]",
        "2015-05-26T16:23:07.359-0200: 64.462: [GC concurrent-mark-start]",
        "2015-05-26T16:23:07.435-0200: 64.538: [GC concurrent-mark-end, 0.0756453 secs]",
        "2015-05-26T16:23:07.435-0200: 64.538: [GC remark 64.538: [Finalize Marking, 0.0007422 secs] 64.539: [GC ref-proc, 0.0155548 secs] 64.555: [Unloading, 0.0078692 secs], 0.0281862 secs] [Times: user=0.09 sys=0.00, real=0.03 secs]",
        "2015-05-26T16:23:07.465-0200: 64.568: [GC cleanup 1213M->1213M(1885M), 0.0001026 secs]",
        "2015-05-26T16:23:07.465-0200: 64.568: [GC concurrent-cleanup-start]",
        "2015-05-26T16:23:07.465-0200: 64.568: [GC concurrent-cleanup-end, 0.0000827 secs]",
        "2015-05-26T16:23:08.000-0200: 65.102: [GC pause (G1 Evacuation Pause) (mixed) 3791M->3100M(4096M), 0.0675559 secs]",
        "2015-05-26T16:23:09.120-0200: 66.222: [GC pause (G1 Evacuation Pause) (young) (to-space exhausted) 1694M->689M(2048M), 0.1158856 secs]",
        "2015-05-26T16:23:12.000-0200: 69.102: [Full GC (Allocation Failure) 5811M->1316M(6144M), 16.7476886 secs]",
        "2015-05-26T16:23:13.000-0200: 70.102: [GC pause (young) 1785M->1641M(4096M), 0.0121942 secs]",
        "2015-05-26T16:23:14.100-0200: 71.202: [GC pause (G1 Humongous Allocation) (young) 1805M->1661M(4096M), 0.0131942 secs]",
        "2015-05-26T16:23:15.100-0200: 72.202: [GC pause (Metadata GC Threshold) (young) (initial-mark) 1905M->1761M(4096M), 0.0141942 secs]",
    ]
)

#: JDK 9+ unified-logging (-Xlog:gc) G1 log (SUPERSET — the reference
#: predates unified logging).  Standard default-decoration line shapes:
#: young/mixed evacuation pauses with causes, the concurrent mark cycle,
#: remark/cleanup, and a Full GC; one line carries the optional ISO
#: timestamp decoration.
UNIFIED_LOG = "\n".join(
    [
        "[2026-08-17T01:02:03.456+0000][0.231s][info][gc] GC(0) Pause Young (Normal) (G1 Evacuation Pause) 24M->4M(256M) 3.523ms",
        "[0.550s][info][gc] GC(1) Concurrent Mark Cycle",
        "[0.560s][info][gc,marking] GC(1) Concurrent Mark 1.230ms",
        "[0.600s][info][gc] GC(1) Pause Remark 20M->20M(256M) 1.611ms",
        "[0.640s][info][gc] GC(1) Pause Cleanup 20M->20M(256M) 0.104ms",
        "[1.234s][info][gc] GC(2) Pause Young (Mixed) (G1 Evacuation Pause) 187M->100M(256M) 10.221ms",
        "[2.000s][info][gc] GC(3) Pause Full (System.gc()) 187M->100M(256M) 102.521ms",
        # JDK 17 shapes: [gc,start] begin marker, [gc,heap] region
        # transitions, [gc,metaspace], [gc,cpu] — all per-event
        # METADATA (ignored); only the [gc] summary line is the event.
        "[2.500s][info][gc,start] GC(4) Pause Young (Prepare Mixed) (G1 Evacuation Pause)",
        "[2.502s][info][gc,heap] GC(4) Eden regions: 24->0(153)",
        "[2.502s][info][gc,heap] GC(4) Survivor regions: 3->4(20)",
        "[2.502s][info][gc,heap] GC(4) Old regions: 50->60",
        "[2.502s][info][gc,heap] GC(4) Humongous regions: 2->2",
        "[2.502s][info][gc,metaspace] GC(4) Metaspace: 21995K->21995K(1069056K)",
        "[2.503s][info][gc] GC(4) Pause Young (Prepare Mixed) (G1 Evacuation Pause) 98M->23M(256M) 3.100ms",
        "[2.503s][info][gc,cpu] GC(4) User=0.01s Sys=0.00s Real=0.00s",
        "[3.000s][info][gc] GC(5) Pause Young (Concurrent Start) (Metadata GC Threshold) 81M->30M(256M) 4.771ms",
    ]
)

#: ZGC (percent-occupancy heap, no capacity, optional generational
#: seconds suffix) + Shenandoah (pause/concurrent phases with classic
#: heap triples) under unified logging — SUPERSET, like UNIFIED_LOG.
ZGC_LOG = "\n".join(
    [
        "[2026-08-17T02:00:00.123+0000][1.000s][info][gc] GC(0) Garbage Collection (Warmup) 104M(10%)->88M(9%)",
        "[2.000s][info][gc] GC(1) Garbage Collection (Allocation Rate) 934M(91%)->422M(41%)",
        "[2.500s][info][gc] GC(2) Minor Collection (Allocation Rate) 3462M(28%)->3252M(26%) 0.521s",
        "[3.000s][info][gc] GC(3) Garbage Collection (Proactive) 110M(11%)->90M(9%)",
        "[4.000s][info][gc] GC(4) Pause Init Mark 0.437ms",
        "[4.010s][info][gc] GC(4) Concurrent marking 16M->17M(64M) 6.023ms",
        "[4.020s][info][gc] GC(4) Pause Final Mark 0.698ms",
        "[4.021s][info][gc] GC(4) Concurrent cleanup 17M->10M(64M) 0.325ms",
    ]
)

#: JDK 21+ GENERATIONAL ZGC (-Xlog:gc, OpenJDK zDriver/zGeneration
#: line shapes): each collection logs a heap-less start line
#: ('GC(n) Minor|Major Collection (Cause)') and a completion line with
#: the percent-occupancy transition plus a seconds suffix; minor
#: collections interleave inside a running major (ids 2/3 below);
#: [gc,phases] carries the y:/O: generation-tagged sub-phases, which
#: are per-event metadata (dropped, like [gc,heap]/[gc,cpu]).
#: SUPERSET — the reference grammar predates ZGC entirely; charter is
#: the north rule's "every unified shape" superset clause.
ZGC_GEN_LOG = "\n".join(
    [
        "[2026-08-17T03:00:00.250+0000][0.250s][info][gc] GC(0) Minor Collection (Warmup)",
        "[0.251s][info][gc,phases] GC(0) y: Pause Mark Start 0.030ms",
        "[0.260s][info][gc,phases] GC(0) y: Concurrent Mark 2.351ms",
        "[0.262s][info][gc,phases] GC(0) y: Pause Relocate Start 0.011ms",
        "[0.301s][info][gc] GC(0) Minor Collection (Warmup) 38M(2%)->28M(1%) 0.051s",
        "[1.000s][info][gc] GC(1) Minor Collection (Allocation Rate)",
        "[1.521s][info][gc] GC(1) Minor Collection (Allocation Rate) 3462M(28%)->3252M(26%) 0.521s",
        "[2.000s][info][gc] GC(2) Major Collection (Proactive)",
        "[2.100s][info][gc,phases] GC(2) O: Pause Mark Start 0.042ms",
        "[2.200s][info][gc,phases] GC(2) O: Concurrent Mark 180.044ms",
        "[3.000s][info][gc] GC(3) Minor Collection (High Usage)",
        "[3.200s][info][gc] GC(3) Minor Collection (High Usage) 5120M(40%)->4096M(32%) 0.200s",
        "[6.918s][info][gc] GC(2) Major Collection (Proactive) 4930M(60%)->1284M(16%) 4.918s",
        "[8.000s][info][gc] GC(4) Major Collection (Metadata GC Threshold)",
        "[8.462s][info][gc] GC(4) Major Collection (Metadata GC Threshold) 134M(8%)->54M(3%) 0.462s",
    ]
)

#: JDK 9+ unified-logging G1 log WITH heap-region transition lines
#: (-Xlog:gc,gc+heap=info): each collection emits one ``[gc,heap]``
#: line per region kind (`GC(n) Eden regions: B->A(T)`; Old/Humongous/
#: Archive carry no target) between the [gc,start] marker and the [gc]
#: summary — the unified twin of the legacy `{Heap before/after}` block
#: mode (gc_region_deltas).  SUPERSET; counts pinned in test_unified.
UNIFIED_HEAP_LOG = "\n".join(
    [
        "[2026-08-17T04:00:00.100+0000][0.300s][info][gc,start] GC(0) Pause Young (Normal) (G1 Evacuation Pause)",
        "[0.302s][info][gc,heap] GC(0) Eden regions: 24->0(153)",
        "[0.302s][info][gc,heap] GC(0) Survivor regions: 3->4(20)",
        "[0.302s][info][gc,heap] GC(0) Old regions: 50->60",
        "[0.302s][info][gc,heap] GC(0) Humongous regions: 2->2",
        "[0.302s][info][gc,metaspace] GC(0) Metaspace: 21995K->21995K(1069056K)",
        "[0.303s][info][gc] GC(0) Pause Young (Normal) (G1 Evacuation Pause) 98M->23M(256M) 3.100ms",
        "[1.100s][info][gc,start] GC(1) Pause Young (Concurrent Start) (Metadata GC Threshold)",
        "[1.102s][info][gc,heap] GC(1) Eden regions: 120->0(140)",
        "[1.102s][info][gc,heap] GC(1) Survivor regions: 4->6(18)",
        "[1.102s][info][gc,heap] GC(1) Old regions: 60->60",
        "[1.102s][info][gc,heap] GC(1) Humongous regions: 2->3",
        "[1.102s][info][gc,heap] GC(1) Archive regions: 2->2",
        "[1.102s][info][gc,metaspace] GC(1) Metaspace: 30100K->30100K(1069056K)",
        "[1.103s][info][gc] GC(1) Pause Young (Concurrent Start) (Metadata GC Threshold) 150M->40M(256M) 4.200ms",
        "[2.400s][info][gc,start] GC(2) Pause Full (System.gc())",
        "[2.450s][info][gc,heap] GC(2) Eden regions: 10->0(153)",
        "[2.450s][info][gc,heap] GC(2) Survivor regions: 6->0(20)",
        "[2.450s][info][gc,heap] GC(2) Old regions: 80->41",
        "[2.450s][info][gc,heap] GC(2) Humongous regions: 3->2",
        "[2.450s][info][gc,metaspace] GC(2) Metaspace: 30100K->29800K(1069056K)",
        "[2.455s][info][gc] GC(2) Pause Full (System.gc()) 200M->80M(256M) 95.300ms",
    ]
)

#: JDK 9-13 CMS under unified logging (-Xlog:gc with
#: -XX:+UseConcMarkSweepGC, removed in JDK 14): initial-mark/remark
#: pauses carry heap triples, concurrent phases ms durations —
#: SUPERSET, parsed by the same unified classifier.
CMS_UNIFIED_LOG = "\n".join(
    [
        "[2026-08-17T03:00:00.500+0000][0.234s][info][gc] GC(3) Pause Initial Mark 34M->34M(247M) 1.122ms",
        "[0.240s][info][gc] GC(3) Concurrent Mark 5.132ms",
        "[0.245s][info][gc] GC(3) Concurrent Preclean 0.113ms",
        "[0.250s][info][gc] GC(3) Pause Remark 36M->36M(247M) 0.878ms",
        "[0.260s][info][gc] GC(3) Concurrent Sweep 2.001ms",
        "[0.266s][info][gc] GC(3) Concurrent Reset 0.044ms",
        "[0.300s][info][gc] GC(4) Pause Young (Allocation Failure) 62M->15M(241M) 4.500ms",
        "[0.350s][info][gc] GC(5) Pause Full (Allocation Failure) 93M->10M(247M) 21.742ms",
    ]
)

#: class_id → (class_name, resource file or None for inline,
#:             events in GcLine mode, events in heap-stats mode)
#: GcLine-mode counts: ParserTest.scala:128-168,104-111,527-537;
#: JDK 13+ unified-logging ``[safepoint]`` lines (-Xlog:safepoint) —
#: the per-VM-operation twin of the legacy ``Total time for which
#: application threads were stopped`` long form (P13): each safepoint
#: carries time-since-last / time-to-safepoint (reaching) / optional
#: cleanup (JDK 16+ adds the ``Cleanup:`` field) / at-safepoint /
#: total, all exact nanosecond integers.  SUPERSET (the reference
#: grammar predates unified logging); interleaved gc lines and a
#: truncated safepoint line prove the filter.
SAFEPOINT_LOG = "\n".join(
    [
        '[0.512s][info][safepoint] Safepoint "G1CollectForAllocation", Time since last: 123456789 ns, Reaching safepoint: 234567 ns, At safepoint: 3456789 ns, Total: 3691356 ns',
        "[0.513s][info][gc] GC(0) Pause Young (Normal) (G1 Evacuation Pause) 98M->23M(256M) 3.456ms",
        '[0.801s][info][safepoint] Safepoint "ThreadDump", Time since last: 288765432 ns, Reaching safepoint: 98765 ns, At safepoint: 456123 ns, Total: 554888 ns',
        '[1.204s][info][safepoint] Safepoint "G1CollectForAllocation", Time since last: 402333111 ns, Reaching safepoint: 187654 ns, Cleanup: 23456 ns, At safepoint: 2987654 ns, Total: 3198764 ns',
        '[1.500s][info][safepoint] Safepoint "RevokeBias", Time since last: 295888000 ns, Reaching safepoint: 45678 ns, At safepoint: 87654 ns, Total: 133332 ns',
        '[2.001s][info][safepoint] Safepoint "Cleanup", Time since last: 500123456 ns, Reaching safepoint: 65432 ns, Cleanup: 12345 ns, At safepoint: 234567 ns, Total: 312344 ns',
        '[2.002s][info][safepoint] Safepoint "ICBufferFull", Time since last: 1234567 ns, Reaching safepoint: 34567 ns, At safepoint: 123456 ns, Total: 158023 ns',
        "[2.100s][info][gc] GC(1) Pause Young (Concurrent Start) (Metadata GC Threshold) 150M->40M(256M) 4.200ms",
        '[2.950s][info][safepoint] Safepoint "G1Concurrent", Time since last: 947000000 ns, Reaching safepoint: 156789 ns, Cleanup: 9876 ns, At safepoint: 1456789 ns, Total: 1623454 ns',
        '[3.400s][info][safepoint] Safepoint "ThreadDump", Time since last: 449876543 ns, Reaching safepoint: 76543 ns, At safepoint: 398765 ns, Total: 475308 ns',
        '[3.500s][info][safepoint] Safepoint "G1CollectForAllocation", Time since last: 99000000 ns, Reaching safepoint: 201234 ns, At safepoint: 4123456 ns',
    ]
)

#: ZGC allocation/relocation stalls (-Xlog:gc, single-gen and JDK 21+
#: generational alike): when the mutator outruns the collector, each
#: stalled thread logs ``(Allocation|Relocation) Stall (<thread>)
#: <ms>ms`` — the latency signal a ZGC tuning investigation reads
#: first.  SUPERSET (the reference grammar predates ZGC); interleaved
#: collection lines and a truncated stall line prove the filter.
ZGC_STALL_LOG = "\n".join(
    [
        "[2026-08-17T06:00:00.000+0000][5.000s][info][gc] GC(7) Major Collection (Allocation Stall)",
        "[5.123s][info][gc] Allocation Stall (main) 12.040ms",
        "[5.130s][info][gc] Allocation Stall (HttpWorker-3) 3.512ms",
        "[5.131s][info][gc] Relocation Stall (HttpWorker-3) 0.204ms",
        "[5.200s][info][gc] Allocation Stall (HttpWorker-7) 25.001ms",
        "[6.000s][info][gc] GC(8) Minor Collection (Allocation Rate)",
        "[6.100s][info][gc] Allocation Stall (main) 1.250ms",
        "[6.200s][info][gc] GC(8) Minor Collection (Allocation Rate) 3462M(28%)->3252M(26%) 0.100s",
        "[6.300s][info][gc] Relocation Stall (queue-worker-1) 7.777ms",
        "[6.301s][info][gc] Allocation Stall (queue-worker-1)",
        "[9.321s][info][gc] GC(7) Major Collection (Allocation Stall) 8012M(94%)->2048M(24%) 4.321s",
        "[9.400s][info][gc] Allocation Stall (main) 0.033ms",
    ]
)

#: G1 evacuation failure ("to-space exhausted") in BOTH log dialects:
#: legacy Java 8 puts the tag inline in the pause line; unified (JDK
#: 9+) logs a separate ``GC(n) To-space exhausted`` line before the
#: pause summary.  The heap-exhaustion signal that precedes G1 Full
#: GCs — SUPERSET (the reference grammar has no G1 at all); noise
#: lines and a truncated tag prove the filters.
G1_EVAC_LOG = "\n".join(
    [
        "2015-05-26T16:23:09.120-0200: 66.222: [GC pause (G1 Evacuation Pause) (young) (to-space exhausted) 1694M->689M(2048M), 0.1158856 secs]",
        "2015-05-26T16:23:10.000-0200: 67.102: [GC pause (G1 Evacuation Pause) (mixed) 3791M->3100M(4096M), 0.0675559 secs]",
        "2015-05-26T16:23:11.500-0200: 68.602: [GC pause (G1 Evacuation Pause) (mixed) (to-space exhausted) 4000M->3900M(4096M), 0.2158856 secs]",
        "[2026-08-17T07:00:00.100+0000][1.250s][info][gc] GC(7) To-space exhausted",
        "[1.251s][info][gc] GC(7) Pause Young (Normal) (G1 Evacuation Pause) 4090M->4096M(4096M) 102.341ms",
        "[2.000s][info][gc] GC(8) Pause Young (Concurrent Start) (Metadata GC Threshold) 150M->40M(256M) 4.200ms",
        "[3.475s][info][gc] GC(9) To-space exhausted",
        "[3.500s][info][gc] GC(10) Pause Full (G1 Compaction Pause) 4096M->1024M(4096M) 812.000ms",
        "[4.000s][info][gc] GC(11) To-space",
    ]
)

#: heap-stats counts: ParserTest.scala:261-321,539-547.
CLASSES = [
    (0, "basic7", "basic-java7-gc.log", 7, 0),
    (1, "basic8", "basic-java8-gc.log", 7, 0),
    (2, "details7", "details-java7-gc.log", 7, 0),
    (3, "details8", "details-java8-gc.log", 7, 0),
    (4, "heap7", "heap-java7-gc.log", 7, 7),
    (5, "heap8", "heap-java8-gc.log", 7, 7),
    (6, "fragment", "fragment.txt", 2, 2),
    (7, "cms", "cms-fragment.txt", 1, 1),
    (8, "waits", "fragment-with-wait-times.txt", 16, 16),
    (9, "cmsfull", None, 15, 0),
]


def fixture_text(name_or_id) -> str:
    for cid, name, resource, _, _ in CLASSES:
        if name_or_id in (cid, name):
            if resource is None:
                return CMSFULL
            return (_RES / resource).read_text()
    raise KeyError(name_or_id)


def all_classes():
    """[(class_id, class_name, text, gcline_events, heap_events)]"""
    return [
        (cid, name, fixture_text(cid), n_line, n_heap)
        for cid, name, _, n_line, n_heap in CLASSES
    ]

#: G1 humongous-allocation activity in BOTH log dialects — the G1
#: fragmentation runbook signal (objects >= half a region allocate as
#: contiguous humongous regions; churn shows up as Humongous
#: Allocation pause causes and per-GC humongous region accounting).
#: Legacy Java 8 tags the pause cause inline; unified (JDK 9+) has the
#: cause in the Pause Young line, per-GC ``Humongous regions: X->Y``
#: accounting under gc,heap, and the gc,init ``Heap Region Size`` line
#: that turns region counts into bytes.  SUPERSET (the reference
#: grammar has no G1 at all); noise lines and truncated tags prove the
#: filters.
G1_HUMONGOUS_LOG = "\n".join(
    [
        "2015-05-26T16:23:09.120-0200: 66.222: [GC pause (G1 Humongous Allocation) (young) (initial-mark) 1694M->689M(2048M), 0.1158856 secs]",
        "2015-05-26T16:23:10.000-0200: 67.102: [GC pause (G1 Evacuation Pause) (young) 379M->310M(4096M), 0.0675559 secs]",
        "2015-05-26T16:23:12.000-0200: 69.102: [GC pause (G1 Humongous Allocation) (young) 2694M->1689M(4096M), 0.2158856 secs]",
        "[0.008s][info][gc,init] Heap Region Size: 1M",
        "[1.250s][info][gc] GC(7) Pause Young (Concurrent Start) (G1 Humongous Allocation) 4090M->3000M(4096M) 102.341ms",
        "[1.300s][info][gc,heap] GC(7) Humongous regions: 18->2",
        "[2.000s][info][gc] GC(8) Pause Young (Normal) (G1 Evacuation Pause) 150M->40M(256M) 4.200ms",
        "[2.100s][info][gc,heap] GC(8) Humongous regions: 2->3",
        "[3.475s][info][gc] GC(9) Pause Full (G1 Compaction Pause) 4096M->1024M(4096M) 812.000ms",
        "[3.600s][info][gc,heap] GC(9) Humongous regions: 3->0",
        "[3.700s][info][gc,heap] GC(10) Humongous regions:",
        "[GC pause (G1 Humongous Allocation)",
    ]
)
