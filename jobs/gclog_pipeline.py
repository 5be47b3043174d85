"""spark-submit entry for the full parse → enrich → route → aggregate
pipeline (the reference CLI Main.scala:16-31 re-imagined for a cluster;
BASELINE.json run mode: ``spark-submit --py-files``).

Usage (sandbox / local):

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/gclog_pipeline.py \
        --input /data/pages_parquet --output /data/out \
        --chunks 8 --stitch narrow

On a real cluster drop ``--master`` and let the cluster manager decide;
``--input`` can be an Iceberg table (``--input-format iceberg``) or a
directory of raw GC log files (``--input-format rawlogs``, the
reference's multi-file mode).  Re-running with the same ``--output``
resumes from the chunk ledger (crash-safe, idempotent per chunk).

Outputs under ``--output``:
    events/   chunk_id=*/sink=*/  routed per-sink event rows (fan-out)
    agg/      per-(sink, hour) aggregates over all routed events
    ledger/   chunk lineage: pages/events/skipped counts + wall seconds

**Export mode** (reference CLI parity, Main.scala:35-73): pass
``--format tsv|graphite`` to format rated events instead of running the
parquet pipeline — with ``--delimiter`` / ``--prefix`` / ``--limit`` /
``--heap-stats`` exactly as the reference flags, ``--input -`` for
stdin (the reference's default input), ``--dest host:port`` for the
graphite TCP sink, ``--output`` for distributed per-log text, or
stdout when neither is given (single log ordered like the reference;
multi-log stdout is ordered by url, not input order).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# On a cluster the package ships via --py-files; running the script
# directly from the repo needs the repo root on sys.path.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def run_export(spark, pages, args, require_marker):
    """Reference CLI behavior (Main.scala:16-31): parse (± heap stats)
    → rates → optional per-log limit → tsv/graphite → stdout, TCP
    socket, or per-log text files."""
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.export import (
        graphite_export,
        tsv_export,
        write_lines,
    )
    from gclog_parser_spark.operators.limit import limit_per_log
    from gclog_parser_spark.operators.parse import parse_events
    from gclog_parser_spark.operators.rates import with_rates

    events = with_rates(
        parse_events(
            pages,
            mode=args.mode,
            stitch=args.stitch,
            require_marker=require_marker,
        )
    )
    if args.limit is not None:
        events = limit_per_log(events, args.limit)
    if args.format == "graphite":
        # the reference NPEs on events without a timestamp; we drop them
        lines = graphite_export(
            events.where(F.col("event_time").isNotNull()),
            prefix=args.prefix,
        )
    else:
        lines = tsv_export(events, delimiter=args.delimiter)

    if args.dest is not None:
        from gclog_parser_spark.sources.sinks import write_socket

        host, _, port = args.dest.partition(":")
        write_socket(lines, host, int(port) if port else 2003)
    elif args.output is not None:
        write_lines(lines, args.output, per_log=True)
    else:
        for r in lines.orderBy("url", "line_no").toLocalIterator():
            print(r["line"])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="path, or '-' for stdin (one log, like the"
                        " reference's default input)")
    p.add_argument(
        "--input-format",
        choices=["pages", "iceberg", "rawlogs"],
        default="pages",
    )
    p.add_argument("--output", default=None)
    p.add_argument("--mode", choices=["gc_line", "heap_stats"],
                   default="gc_line")
    p.add_argument("--heap-stats", action="store_true",
                   help="reference flag: same as --mode heap_stats")
    p.add_argument("--stitch", choices=["narrow", "window"],
                   default="narrow")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    # reference CLI export flags (Main.scala:42-70)
    p.add_argument("-o", "--format", choices=["tsv", "graphite"],
                   default=None,
                   help="export mode: format rated events instead of"
                        " running the parquet pipeline")
    p.add_argument("--delimiter", default="\t")
    p.add_argument("--prefix", default="gc")
    p.add_argument("-n", "--limit", type=int, default=None,
                   help="at most N events per log")
    p.add_argument("--dest", default=None,
                   help="host:port TCP sink for the formatted lines")
    p.add_argument("--sink-catalog", action="store_true",
                   help="additionally fan the routed events out to"
                        " per-sink snapshot-catalog tables under"
                        " OUTPUT/sinks (the north rule's per-sink"
                        " Iceberg-table shape)")
    args = p.parse_args(argv)
    if args.heap_stats:
        args.mode = "heap_stats"
    if args.format is None and args.output is None:
        p.error("--output is required unless --format (export mode)")
    if args.input == "-" and args.format is None:
        p.error("stdin input is only supported in export mode")

    from gclog_parser_spark.operators.aggregate import per_sink_hourly
    from gclog_parser_spark.plans.ledger import run_checkpointed
    from gclog_parser_spark.session import get_spark
    from gclog_parser_spark.sources.pages import read_gc_logs, read_pages

    spark = get_spark(
        master=args.master,
        app_name="gclog-pipeline",
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.input == "-":
        from datetime import datetime, timezone

        from gclog_parser_spark.schema import PAGES_SCHEMA

        text = sys.stdin.read()
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        pages = spark.createDataFrame(
            [("stdin", now, None, text, None)], PAGES_SCHEMA
        )
        require_marker = False
    elif args.input_format == "rawlogs":
        pages = read_gc_logs(spark, args.input)
        require_marker = False
    else:
        fmt = "iceberg" if args.input_format == "iceberg" else "parquet"
        pages = read_pages(
            spark, args.input, fmt=fmt, columns=["url", "warc_ts", "text"]
        )
        require_marker = True

    if args.format is not None:
        run_export(spark, pages, args, require_marker)
        spark.stop()
        return

    summary = run_checkpointed(
        spark,
        pages,
        out_path=f"{args.output}/events",
        ledger_path=f"{args.output}/ledger",
        n_chunks=args.chunks,
        mode=args.mode,
        stitch=args.stitch,
        require_marker=require_marker,
        log=lambda m: print(f"[pipeline] {m}", file=sys.stderr),
    )

    events = spark.read.parquet(f"{args.output}/events")
    per_sink_hourly(events, exact=True).write.mode("overwrite").parquet(
        f"{args.output}/agg"
    )
    if args.sink_catalog:
        from gclog_parser_spark.operators.route import fanout_commit_catalog

        committed = fanout_commit_catalog(events, f"{args.output}/sinks")
        summary["sink_snapshots"] = committed
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
