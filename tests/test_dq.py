"""DQ checks must actually fire on dirty data (the contract gate runs
them over clean-by-construction tables, where zeros could hide a
vacuous implementation)."""

from __future__ import annotations


def test_checks_fire_on_dirty_data(spark):
    from gclog_parser_spark.operators.dq import (
        dq_audit,
        fk_check,
        null_check,
        range_check,
        unique_check,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20), (3, None), (4, 99)],
        "id long, parent_id long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    vals = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 9.5), (4, 10.0), (5, None)],
        "id long, v double",
    )
    rep = {
        r.check: r.violations
        for r in dq_audit([
            unique_check(child, ["id"]),
            fk_check(child.where("parent_id IS NOT NULL"),
                     "parent_id", parent, "pid"),
            null_check(child, "parent_id"),
            range_check(vals, "v", 0, 10),
        ]).collect()
    }
    assert rep == {
        "id_unique": 1,          # id=2 twice
        "parent_id_fk": 1,       # 99 is an orphan
        "parent_id_not_null": 1,
        "v_range": 2,            # -5 below, 10.0 at the open bound
    }


def test_clean_data_reports_zero(spark):
    from gclog_parser_spark.operators.dq import dq_audit, unique_check

    df = spark.createDataFrame([(1,), (2,)], "id long")
    [r] = dq_audit([unique_check(df, ["id"])]).collect()
    assert (r.check, r.violations) == ("id_unique", 0)
