"""SparkSession factory with scale-appropriate defaults.

Every knob here is chosen for the 100 TB design point and merely *sized*
for the sandbox (SURVEY.md §4 'what needs explicit handling'):

* AQE on — runtime partition coalescing + skew-join splitting.
* Arrow on with a large batch size — the parse stage is Arrow-batched
  pandas (`mapInPandas` / `applyInPandas`); bigger batches amortize the
  JVM↔Python hop.
* shuffle partitions ~ cores locally; on a real cluster this is set per
  job from input volume (`spark-submit --conf`).
* session timezone pinned UTC so TimestampType round-trips through Arrow
  and matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "gclog-parser-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k rows/batch: the JVM↔Python Arrow boundary costs as much
        # as the parse itself at 4k rows; bigger batches amortize the
        # per-batch pandas assembly + stream framing (measured -28 %
        # parse wall at 16 cores).  ~50 MB per in-flight batch at 3 KB
        # text rows — size down only for very wide rows.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        # parse emits many events per input page; cap Arrow batch memory
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
