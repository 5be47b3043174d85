"""CDC compaction semantics (operators/cdc.py) — value parity vs
DuckDB runs in test_oracle_parity.py; here the merge rules are pinned
on a constructed changelog."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from gclog_parser_spark.operators.cdc import apply_changes, latest_snapshot


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t, float(v), "{}")
            for (i, d, h, u, t, v) in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_latest_snapshot_picks_newest_with_seq_tiebreak(spark):
    ev = _ev(
        spark,
        [
            (0, 1, 0, 7, "view", 1),
            (1, 2, 0, 7, "click", 2),   # newest ts for user 7
            (2, 1, 0, 8, "view", 3),
            (3, 1, 0, 8, "view", 4),    # same ts as event 2 -> higher seq wins
        ],
    )
    got = {
        (r["user_id"], r["event_id"])
        for r in latest_snapshot(ev).collect()
    }
    assert got == {(7, 1), (8, 3)}


def test_apply_changes_upsert_insert_delete(spark):
    base_log = _ev(
        spark,
        [
            (0, 1, 0, 1, "view", 10),
            (1, 1, 0, 2, "view", 20),
            (2, 1, 0, 3, "view", 30),
        ],
    )
    base = latest_snapshot(base_log)
    changes = _ev(
        spark,
        [
            # ts BEFORE the base row's ts: the change still wins (MERGE)
            (10, 1, 0, 1, "click", 11),
            (11, 2, 0, 4, "signup", 40),   # brand-new key -> insert
            (12, 2, 0, 3, "error", 0),     # tombstone -> delete key 3
        ],
    ).withColumn("is_del", F.col("event_type") == "error")

    got = {
        (r["user_id"], r["event_id"], r["event_type"])
        for r in apply_changes(base, changes, delete_col="is_del").collect()
    }
    assert got == {
        (1, 10, "click"),   # updated despite older ts
        (2, 1, "view"),     # untouched base row survives
        (4, 11, "signup"),  # inserted
    }                        # user 3 deleted


def test_apply_changes_newest_change_wins_within_key(spark):
    base = latest_snapshot(_ev(spark, [(0, 1, 0, 5, "view", 1)]))
    changes = _ev(
        spark,
        [
            (10, 3, 0, 5, "click", 2),
            (11, 4, 0, 5, "purchase", 3),  # newest change wins
            (12, 2, 0, 5, "error", 0),     # older tombstone loses
        ],
    ).withColumn("is_del", F.col("event_type") == "error")
    got = [
        (r["user_id"], r["event_id"])
        for r in apply_changes(base, changes, delete_col="is_del").collect()
    ]
    assert got == [(5, 11)]
