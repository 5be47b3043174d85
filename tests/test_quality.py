"""Data-quality constraint checks (operators/quality.py): each check
detects its deliberate violation and reports the exact ratio."""

from __future__ import annotations

from gclog_parser_spark.operators.quality import (
    accepted_values_check,
    dq_report,
    fk_check,
    null_check,
    range_check,
    unique_check,
)


def test_dq_checks_detect_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20), (3, None), (4, 999)],
        "k int, v int",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")

    report = {
        r["rule"]: r
        for r in dq_report(
            [
                unique_check(child, ["k"], "k_unique"),
                null_check(child, "v", "v_not_null"),
                range_check(child, "v", 0, 100, "v_range"),
                accepted_values_check(
                    child, "v", [10, 20], "v_domain"
                ),
                fk_check(child, parent, "k", "pk", "fk"),
            ]
        ).collect()
    }
    # 5 rows, 4 distinct k -> 1/5 duplicate ratio
    assert report["k_unique"]["metric"] == 0.2
    assert report["k_unique"]["passed"] is False
    # one NULL v
    assert report["v_not_null"]["metric"] == 0.2
    # 999 out of range (NULL not counted as range violation)
    assert report["v_range"]["metric"] == 0.2
    # 999 and NULL both outside the accepted set -> 2/5
    assert report["v_domain"]["metric"] == 0.4
    # k=4 has no parent -> 1/5
    assert report["fk"]["metric"] == 0.2
    assert report["fk"]["passed"] is False


def test_dq_checks_all_pass_when_clean(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], "k int, v int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    rows = dq_report(
        [
            unique_check(df, ["k"], "u"),
            null_check(df, "v", "n"),
            range_check(df, "v", 0, 10, "r"),
            accepted_values_check(df, "v", [5, 7], "d"),
            fk_check(df, parent, "k", "pk", "f"),
        ]
    ).collect()
    assert all(r["passed"] for r in rows)
    assert all(r["metric"] == 0.0 for r in rows)


def test_profile_table_counts_nulls_and_types(spark):
    from gclog_parser_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "bc", None)],
        "k bigint, s string, v double",
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 2
    assert (prof["k"]["min_num"], prof["k"]["max_num"]) == (1.0, 2.0)
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["sum_len"] == 3
    assert prof["s"]["min_num"] is None  # strings: no numeric range
    assert prof["v"]["n_distinct"] == 2 and prof["v"]["max_num"] == 2.5


def test_table_diff_equal_tables_is_empty(spark, sf_dir):
    from gclog_parser_spark.operators.quality import table_diff

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert table_diff(ev, ev, key_cols=["event_id"]).count() == 0


def test_table_diff_classifies_damage(spark):
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.quality import table_diff

    left = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(40)],
        "id long, tag string, v double",
    )
    right = (
        left.where(F.col("id") != 7)                       # only_left: 7
        .withColumn(
            "v", F.when(F.col("id") == 11, F.col("v") + 0.5)
            .otherwise(F.col("v"))                          # changed: 11
        )
        .unionByName(
            spark.createDataFrame(
                [(99, "uX", 0.0)], "id long, tag string, v double"
            )                                               # only_right: 99
        )
    )
    got = {
        r["id"]: r["diff_kind"]
        for r in table_diff(left, right, key_cols=["id"]).collect()
    }
    assert got == {7: "only_left", 11: "changed", 99: "only_right"}


def test_table_diff_null_vs_value_is_changed(spark):
    """NULL -> value and value -> NULL must classify as changed (the
    digest's null sentinel and the null-safe compare agree)."""
    from gclog_parser_spark.operators.quality import table_diff

    left = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "keep")], "id long, s string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "keep")], "id long, s string"
    )
    got = {
        r["id"]: r["diff_kind"]
        for r in table_diff(left, right, key_cols=["id"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}


def test_reconcile_job_exit_codes(spark, sf_dir, tmp_path):
    """The reconcile job as a replication gate: equal tables exit 0
    with an empty diff; a damaged replica exits 3 with the counts."""
    import json
    import subprocess
    import sys as _sys

    ev = f"{sf_dir}/events.parquet"
    damaged_dir = str(tmp_path / "damaged")
    spark.read.parquet(ev).where(
        "event_id % 50 != 0"
    ).write.parquet(damaged_dir)

    def run(right, out):
        res = subprocess.run(
            [
                _sys.executable, "jobs/reconcile.py",
                "--master", "local[4]",
                "--left", ev, "--right", right,
                "--keys", "event_id", "--output", out,
            ],
            capture_output=True, text=True, cwd="/root/repo",
            timeout=600,
        )
        return res.returncode, json.loads(
            res.stdout.strip().splitlines()[-1]
        )

    rc, stats = run(ev, str(tmp_path / "o1"))
    assert rc == 0 and stats["equal"] is True

    rc, stats = run(damaged_dir, str(tmp_path / "o2"))
    assert rc == 3 and stats["equal"] is False
    assert stats["n_only_left"] > 0
    assert stats["n_changed"] == 0 and stats["n_only_right"] == 0
