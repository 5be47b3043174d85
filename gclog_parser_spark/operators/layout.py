"""Table-maintenance: compaction + sorted data layout.

At 100 TB the dominant operational failure of an append-heavy lake
(`route.fanout_write` streams many small per-batch files) is the
small-files problem, and the dominant read-path win is clustering data
so parquet min/max footers prune row groups.  ``compact_table`` is the
maintenance pass that fixes both in one job, using only Spark's own
levers — no extra count() job, no driver-side planning:

* one shuffle: ``repartition(partition_cols)`` co-locates each output
  hive-partition on few tasks (the classic dynamic-partition-write
  shuffle that prevents tasks×partitions file explosions);
* ``sortWithinPartitions(sort_cols)`` clusters rows inside each task
  so every written file covers a narrow sort-key range (footer
  min/max pruning works);
* the ``maxRecordsPerFile`` writer option caps file size — Spark
  splits a task's output into N-record files by itself, which is how
  compactors bound file size without counting first.

On a real deployment the same plan runs as an Iceberg
``rewrite_data_files``; the hive-layout parquet stands in for the
sandbox (see `route.fanout_write`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bucket_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted)
    table — the co-location lever for repeated fact-to-fact joins.

    Two tables bucketed on the join key with the same bucket count
    join with ZERO exchanges (and zero sorts when ``sort_by`` matches
    the key): at 100 TB that converts every recurring
    lineitem⋈orders-shaped join from a full two-sided shuffle into a
    local per-bucket merge.  This is the parquet/hive stand-in for
    Iceberg's ``bucket(N, col)`` partition transform (same hash, same
    effect; see route.fanout_write for the Iceberg note).

    ``path`` makes it an external table (tests point this at a tmp
    dir); bucketing requires the table catalog, so this is
    ``saveAsTable``, not a bare ``parquet()`` write.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def compact_table(
    df: DataFrame,
    out_path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as a compacted, sorted, hive-partitioned table.

    ``files_per_partition`` > 1 spreads each hive partition over that
    many tasks (hash on the partition key + a within-key split) when
    single-task-per-partition would bottleneck on a skewed partition;
    the default 1 gives maximal compaction.
    """
    partition_by = partition_by or []
    sort_by = sort_by or []
    out = df
    if partition_by:
        n_parts = files_per_partition * max(
            df.sparkSession.sparkContext.defaultParallelism, 1
        )
        # hash-cluster on the hive keys: each output directory is
        # written by ~files_per_partition tasks, not by every task
        out = out.repartition(n_parts, *partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*(partition_by + sort_by))
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
