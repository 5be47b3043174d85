"""Broadcast-join enrichment (north rule: 'lookup enrich').

The reference has no joins (SURVEY.md §2.5); the north rule adds two
lookup dims (FIXTURES.md §2).  Both are tiny → ``F.broadcast`` keeps the
100 TB fact side shuffle-free through this stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gclog_parser_spark.schema import collector_family_df, heap_region_df


def enrich_collector_family(events: DataFrame) -> DataFrame:
    """events + `family` via broadcast left join on gc_type; CMS phases
    not in the dim fall back to 'cms_concurrent' by prefix, everything
    else to 'other'."""
    spark = events.sparkSession
    dim = collector_family_df(spark)
    joined = events.join(F.broadcast(dim), "gc_type", "left")
    t = F.col("gc_type")
    return joined.withColumn(
        "family",
        F.coalesce(
            "family",
            F.when(t.startswith("CMS"), F.lit("cms_concurrent"))
            .when(
                (t.startswith("GC pause") & t.contains("(mixed)"))
                | (t.startswith("Pause Young") & t.contains("(Mixed)")),
                F.lit("g1_mixed"),
            )
            .when(
                t.startswith("GC pause") | t.startswith("Pause Young"),
                F.lit("g1_young"),
            )
            .when(t.startswith("Pause Full"), F.lit("full"))
            .when(
                t.isin(
                    "Garbage Collection",
                    "Minor Collection",
                    "Major Collection",
                ),
                F.lit("z_cycle"),
            )
            .when(
                t.startswith("Pause Init")
                | t.startswith("Pause Final")
                | t.startswith("Pause Degenerated"),
                F.lit("shen_pause"),
            )
            .when(
                t.startswith("GC concurrent")
                | t.startswith("Concurrent")
                | t.isin(
                    "GC remark",
                    "GC cleanup",
                    "Pause Remark",
                    "Pause Cleanup",
                ),
                F.lit("g1_concurrent"),
            )
            .otherwise(F.lit("other")),
        ),
    )


def explode_region_deltas(events: DataFrame) -> DataFrame:
    """Unnest the region deltas of detailed events and enrich each with
    its region kind (young/old/perm/meta/survivor_space) via broadcast
    join.  Returns one row per (event, region)."""
    spark = events.sparkSession
    dim = heap_region_df(spark)
    regions = events.where(F.size("regions") > 0).select(
        "url",
        "warc_ts",
        "event_idx",
        "gc_type",
        F.posexplode("regions").alias("region_pos", "region"),
    )
    flat = regions.select(
        "url",
        "warc_ts",
        "event_idx",
        "gc_type",
        "region_pos",
        F.col("region.name").alias("region_name"),
        F.col("region.used_before").alias("used_before"),
        F.col("region.used_after").alias("used_after"),
        F.col("region.capacity_before").alias("capacity_before"),
        F.col("region.capacity_after").alias("capacity_after"),
    )
    return flat.join(F.broadcast(dim), "region_name", "left").withColumn(
        "kind", F.coalesce("kind", F.lit("other"))
    )
