"""Allocation/promotion rates (SURVEY.md §2.4 W1-W3).

The reference's ``RateCalculator`` (RateCalculator.scala:5-43) is a
single-pass stateful scan carrying the *previous* event.  Distributed
re-expression: a ``last(..., ignoreNulls)`` window over
``(url, event_idx)`` — the ignore-nulls trick reproduces the reference's
"AppStopped events do not advance previous" rule (RateCalculator.scala:15)
exactly, while staying fully inside Catalyst (whole-stage codegen window,
no Python).

Semantics pinned by RateCalculatorTest.scala:
* first event: allocated = own heap-before (0 without heap), elapsed =
  own jvmAgeMillis;
* later: allocated = cur.heap_before − prev.heap_after, but 0 unless
  BOTH events carry a heap (CMS events advance `previous` yet allocate 0);
* AppStopped rows: (0, 0) and skipped as `previous`;
* rates are truncating integer division, 0 when elapsed millis is 0
  (GCEventWithRates.scala:26-46).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_rates(events: DataFrame) -> DataFrame:
    is_app = F.col("gc_class") == "app_stopped"
    age_ms = (F.col("jvm_age_seconds") * 1000).cast("long")

    w_prev = (
        Window.partitionBy("url")
        .orderBy("event_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # last non-AppStopped predecessor (struct is non-null iff the row
    # qualifies, so ignoreNulls skips AppStopped rows even when their
    # payload fields are null)
    prev = F.last(
        F.when(
            ~is_app,
            F.struct(
                age_ms.alias("age_ms"),
                F.col("heap_after_bytes").alias("heap_after_bytes"),
            ),
        ),
        ignorenulls=True,
    ).over(w_prev)

    allocated = (
        F.when(is_app, F.lit(0))
        .when(prev.isNull(), F.coalesce("heap_before_bytes", F.lit(0)))
        .when(
            F.col("heap_before_bytes").isNotNull()
            & prev["heap_after_bytes"].isNotNull(),
            F.col("heap_before_bytes") - prev["heap_after_bytes"],
        )
        .otherwise(F.lit(0))
    )
    millis = (
        F.when(is_app, F.lit(0))
        .when(prev.isNull(), age_ms)
        .otherwise(age_ms - prev["age_ms"])
    )

    out = events.withColumn(
        "bytes_allocated_since_last", allocated
    ).withColumn("millis_since_last", millis)
    # `div` = Spark integral division (truncates toward zero, JVM parity)
    out = out.withColumn(
        "heap_allocation_rate",
        F.when(F.col("millis_since_last") == 0, F.lit(0)).otherwise(
            F.expr("bytes_allocated_since_last div millis_since_last")
        ),
    ).withColumn(
        "promotion_rate",
        F.when(
            F.col("promoted_bytes").isNotNull()
            & (F.col("millis_since_last") != 0),
            F.expr("promoted_bytes div millis_since_last"),
        ).otherwise(F.lit(0)),
    )
    return out
