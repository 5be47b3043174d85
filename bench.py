"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

Method notes (all deliberate, mirroring the 100 TB design point):

* The sf-dir documents table is tiny (sf0.1 = 5000 docs), so the
  throughput numbers come from a deterministic synthetic pages corpus
  (``$SPARK_GRAFT_BENCH_PAGES``, default 40000 pages ≈ 2.7M candidate
  lines) **materialized to parquet first** — the pipeline's real input
  shape is columnar-scan → parse, not generate → parse.
* All Python workers are warmed before timing: a long-running cluster
  job amortizes worker spawn over hours; a cold 1.5 s fork+import per
  worker would otherwise dominate these second-scale runs.
* ``docs_per_sec`` / ``events_per_sec`` are measured on the zero-shuffle
  narrow parse — the BASELINE's target metric.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

import pyspark.sql.functions as F


def _timeit(timings, name, fn, quiet):
    """min of 2 runs — steady-state timing (run 1 may still pay worker
    spawn / shuffle-service init / page-cache faults that a long-lived
    cluster job amortizes away)."""
    best, out = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    timings[name] = round(best, 3)
    if not quiet:
        print(f"  {name}: {best:.2f}s -> {out}", file=sys.stderr)
    return out, best


def run_bench(cpus: int | None = None, pages_n: int | None = None,
              quiet: bool = False, pages_path: str | None = None) -> dict:
    from gclog_parser_spark.datagen import pages_from_documents, synth_pages
    from gclog_parser_spark.operators.aggregate import per_sink_hourly
    from gclog_parser_spark.operators.parse import parse_events
    from gclog_parser_spark.operators.rates import with_rates
    from gclog_parser_spark.operators.route import with_sink
    from gclog_parser_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages_n = pages_n or int(
        os.environ.get("SPARK_GRAFT_BENCH_PAGES", "40000")
    )
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # local small-file corpus: size the scan splits so the columnar read
    # parallelizes like a real many-file Iceberg table would
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the synthetic corpus (columnar input, like the real
    # Iceberg scan); not part of the timed pipeline
    pages_path = pages_path or f"/tmp/bench_pages_{pages_n}"
    if not os.path.exists(pages_path):
        synth_pages(spark, pages_n, parallelism=cpus * 4).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages_bench = spark.read.parquet(pages_path)

    # warm every Python worker (steady-state measurement)
    parse_events(
        synth_pages(spark, cpus * 8, parallelism=cpus * 2), stitch="narrow"
    ).count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    t = lambda name, fn: _timeit(timings, name, fn, quiet)  # noqa: E731

    # --- sf-dir pipeline (driver-comparable, small) ---
    pages_sf = pages_from_documents(spark, sf_dir)
    t("parse_narrow_sf", lambda: parse_events(
        pages_sf, stitch="narrow", repartition=cpus).count())
    t("flagship_agg_sf", lambda: len(per_sink_hourly(with_sink(
        parse_events(pages_sf, stitch="narrow", repartition=cpus)
    )).collect()))

    # --- synthetic corpus (throughput-relevant) ---
    n_events, dt_narrow = t(
        "parse_narrow", lambda: parse_events(
            pages_bench, stitch="narrow").count())
    t("parse_window", lambda: parse_events(
        pages_bench, stitch="window").count())
    t("parse_heap", lambda: parse_events(
        pages_bench, mode="heap_stats", stitch="narrow").count())
    t("flagship_agg", lambda: len(per_sink_hourly(with_sink(
        parse_events(pages_bench, stitch="narrow"))).collect()))
    t("rates", lambda: with_rates(
        parse_events(pages_bench, stitch="narrow")
    ).agg(F.sum("heap_allocation_rate")).collect()[0][0])

    extras["synth_pages"] = pages_n
    extras["synth_events"] = n_events
    extras["docs_per_sec"] = round(pages_n / dt_narrow, 1)
    extras["events_per_sec"] = round(n_events / dt_narrow, 1)

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "gclog pipeline wall clock (headline queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
