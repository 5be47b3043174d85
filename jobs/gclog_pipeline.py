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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument(
        "--input-format",
        choices=["pages", "iceberg", "rawlogs"],
        default="pages",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--mode", choices=["gc_line", "heap_stats"],
                   default="gc_line")
    p.add_argument("--stitch", choices=["narrow", "window"],
                   default="narrow")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

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

    if args.input_format == "rawlogs":
        pages = read_gc_logs(spark, args.input)
        require_marker = False
    else:
        fmt = "iceberg" if args.input_format == "iceberg" else "parquet"
        pages = read_pages(
            spark, args.input, fmt=fmt, columns=["url", "warc_ts", "text"]
        )
        require_marker = True

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
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
