"""spark-submit entry for checksum table reconciliation: verify a
replica/migrated/re-routed copy of a table against its source without
shipping either (quality.table_diff — the anti-entropy pattern).

Usage:

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/reconcile.py \
        --left /data/primary --right /data/replica \
        --keys event_id --output /data/diff_out

Outputs under ``--output``:
    diff/     (key..., diff_kind) rows — empty when the tables match
    stats/    one-row parquet: per-kind counts + a boolean ``equal``

Exit code 0 when equal, 3 when differences were found (scriptable as a
CI/replication gate).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def run_reconcile(
    spark,
    left,
    right,
    keys: list[str],
    out: str,
    compare_cols: list[str] | None = None,
    n_buckets: int = 1 << 14,
) -> dict:
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.quality import table_diff

    diff = table_diff(
        left,
        right,
        key_cols=keys,
        compare_cols=compare_cols,
        n_buckets=n_buckets,
    )
    diff.write.mode("overwrite").parquet(f"{out}/diff")
    diff_back = spark.read.parquet(f"{out}/diff")
    kinds = {
        r["diff_kind"]: r["n"]
        for r in diff_back.groupBy("diff_kind")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stats = {
        "n_only_left": int(kinds.get("only_left", 0)),
        "n_only_right": int(kinds.get("only_right", 0)),
        "n_changed": int(kinds.get("changed", 0)),
        "equal": not kinds,
    }
    spark.createDataFrame([stats]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/stats")
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--left", required=True, help="source parquet path")
    ap.add_argument("--right", required=True, help="replica parquet path")
    ap.add_argument("--keys", required=True,
                    help="comma-separated key columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--compare", default=None,
                    help="comma-separated value columns (default: all "
                         "non-key columns)")
    ap.add_argument("--buckets", type=int, default=1 << 14)
    ap.add_argument("--master", default=None,
                    help="override (tests); normally spark-submit's")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("reconcile")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    stats = run_reconcile(
        spark,
        spark.read.parquet(args.left),
        spark.read.parquet(args.right),
        keys=args.keys.split(","),
        out=args.output,
        compare_cols=args.compare.split(",") if args.compare else None,
        n_buckets=args.buckets,
    )
    import json

    print(json.dumps(stats))
    spark.stop()
    sys.exit(0 if stats["equal"] else 3)


if __name__ == "__main__":
    main()
