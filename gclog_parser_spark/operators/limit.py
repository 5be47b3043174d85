"""Per-log ordered prefix (reference ``--limit n``: Main.scala:28,65-67
takes the first n events *per input file* in log order).

Global ``df.limit(n)`` is order-arbitrary in a distributed frame; the
faithful distributed form is a rank over the per-log event order.  The
window partitions by url, so it shuffles once on hash(url) — or not at
all when the upstream already clusters by url (the rates window does).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def limit_per_log(events: DataFrame, n: int) -> DataFrame:
    w = Window.partitionBy("url").orderBy("event_idx")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
