"""Routing + fan-out sinks (north rule: 'route to per-sink tables';
reference sinks at output/OutputSink.scala:11-36, SURVEY.md §2.1 S3-S4).

Routing key = the broadcast-joined collector family.  The fan-out write
is a single partitioned append — one pass over the events, one
subdirectory (≅ per-sink Iceberg table) per sink.  On a real cluster
swap ``format='parquet'`` for an Iceberg catalog table; the sandbox image
has no Iceberg runtime jar, so the layout (hive-style ``sink=...``
partitions, atomic per-job commit via the output committer) stands in
for Iceberg's atomic append (documented in SURVEY.md §7.7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gclog_parser_spark.operators.enrich import enrich_collector_family


def with_sink(events: DataFrame) -> DataFrame:
    """Adds the routing column ``sink`` (= collector family)."""
    if "family" not in events.columns:
        events = enrich_collector_family(events)
    return events.withColumn("sink", F.col("family"))


def fanout_write(
    events: DataFrame,
    base_path: str,
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """One-pass fan-out: dynamic partition write on the routing key.

    The sink column has low cardinality (≤ ~8 families) so dynamic
    partitioning produces a bounded number of directories; within each
    task files stay executor-local (no extra shuffle).
    """
    routed = with_sink(events)
    (
        routed.write.mode(mode)
        .partitionBy("sink")
        .format(fmt)
        .save(base_path)
    )


def read_sink(spark, base_path: str, sink: str) -> DataFrame:
    """Read one routed per-sink table back (partition-pruned scan)."""
    return spark.read.parquet(base_path).where(F.col("sink") == sink)
