"""spark-submit entry for snapshot-catalog table maintenance — the
scheduled housekeeping pass a 100 TB lake needs (Iceberg's
``rewrite_data_files`` + ``expire_snapshots`` jobs, over the sandbox's
catalog from ``sources/catalog.py``):

* ``--compact``            materialize merge-on-read deletes and
                           collapse accumulated small append commits
                           into one overwrite commit
* ``--zorder c1,c2``       compact WITH a Z-order clustered layout so
                           every listed column gets footer-stats file
                           skipping afterwards
* ``--expire-keep N``      drop all but the newest N snapshots and
                           collect unreferenced data/manifest files
                           (including aborted WAP stages and crashed
                           writers' orphans)

Usage (sandbox / local):

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/table_maintenance.py --table /data/tbl \
        --zorder event_id,user_id --expire-keep 2

Prints one JSON line with the actions taken (before/after snapshot
ids, file counts, bytes reclaimed) — the audit row the scheduler
archives.  Idempotent: a re-run on an already-maintained table
commits another (identical-content) rewrite but never corrupts
history; reads stay consistent throughout because every step is an
atomic snapshot commit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def run_maintenance(
    spark,
    table: str,
    compact: bool = False,
    zorder: list[str] | None = None,
    n_files: int = 8,
    expire_keep: int | None = None,
) -> dict:
    from gclog_parser_spark.operators.layout import zorder_table
    from gclog_parser_spark.sources import catalog as cat

    report: dict = {"table": table, "actions": []}
    before = cat.current_snapshot_id(table)
    if before is None:
        raise FileNotFoundError(f"no snapshots in {table}")
    report["snapshot_before"] = before
    report["files_before"] = len(
        cat._manifest_files(table, cat.load_snapshot(table))
    )

    if zorder:
        df = cat.read_snapshot(spark, table)
        snap = zorder_table(df, table, zorder, n_files=n_files)
        report["actions"].append(
            {"op": "zorder", "columns": zorder, "snapshot": snap.snapshot_id}
        )
    elif compact:
        snap = cat.rewrite_compact(spark, table)
        report["actions"].append(
            {"op": "compact", "snapshot": snap.snapshot_id}
        )

    if expire_keep is not None:
        removed = cat.expire_snapshots(table, keep_last=expire_keep)
        report["actions"].append({"op": "expire", **removed})

    after = cat.load_snapshot(table)
    report["snapshot_after"] = after.snapshot_id
    report["files_after"] = len(cat._manifest_files(table, after))
    report["total_rows"] = after.summary.get("total_rows")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True)
    p.add_argument("--compact", action="store_true")
    p.add_argument("--zorder", default=None, help="comma-separated columns")
    p.add_argument("--n-files", type=int, default=8)
    p.add_argument("--expire-keep", type=int, default=None)
    args = p.parse_args(argv)

    from gclog_parser_spark.session import get_spark

    spark = get_spark()
    try:
        report = run_maintenance(
            spark,
            args.table,
            compact=args.compact,
            zorder=args.zorder.split(",") if args.zorder else None,
            n_files=args.n_files,
            expire_keep=args.expire_keep,
        )
        print(json.dumps(report))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
