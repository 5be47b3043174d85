"""Data-quality constraint audit — the expectations layer every
production table needs before analytics trusts it (Deequ/Great
Expectations shape, relational core only).

Each check compiles to one aggregate or one anti-join over the target
table and returns a single ``(check, violations)`` row; ``dq_audit``
unions them into the audit report.  At 100 TB each check is exactly
one scan (+ one broadcast/shuffle anti-join for referential checks) —
violations counts are algebraic, so every check pre-aggregates
map-side; nothing ever collects rows to the driver."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _report(name: str, count_df: DataFrame) -> DataFrame:
    return count_df.select(
        F.lit(name).alias("check"),
        F.col("violations").cast("long").alias("violations"),
    )


def null_check(df: DataFrame, col: str, name: str | None = None):
    """Rows where ``col`` IS NULL."""
    return _report(
        name or f"{col}_not_null",
        df.agg(
            F.count_if(F.col(col).isNull()).alias("violations")
        ),
    )


def unique_check(df: DataFrame, cols: list[str], name=None):
    """Duplicate rows beyond the first per key: COUNT(*) − COUNT
    (DISTINCT key) — exact, two-phase partial-dedup shape."""
    return _report(
        name or f"{'_'.join(cols)}_unique",
        df.agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(c) for c in cols])
            ).alias("violations")
        ),
    )


def fk_check(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name=None,
):
    """Orphaned child rows (LEFT ANTI against the parent key set —
    broadcast when the parent is dim-sized, shuffle otherwise; never
    a full outer)."""
    orphans = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return _report(
        name or f"{child_col}_fk",
        orphans.agg(F.count(F.lit(1)).alias("violations")),
    )


def range_check(df: DataFrame, col: str, lo, hi, name=None):
    """Rows outside [lo, hi) (nulls don't count — pair with
    null_check)."""
    bad = (F.col(col) < F.lit(lo)) | (F.col(col) >= F.lit(hi))
    return _report(
        name or f"{col}_range",
        df.agg(F.count_if(bad & F.col(col).isNotNull()).alias("violations")),
    )


def coverage_check(
    left: DataFrame, left_col: str, right: DataFrame, right_col: str,
    name=None,
):
    """Left keys with NO right match — not a constraint violation but
    the coverage stat (e.g. orders that never shipped a lineitem)."""
    return fk_check(left, left_col, right, right_col, name=name)


def dq_audit(checks: list[DataFrame]) -> DataFrame:
    """Union the single-row check reports into the audit table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
