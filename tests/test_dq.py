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


def test_embedding_checks_dirty_corpus(spark):
    """Each violation class fires on a hand-built dirty corpus, and
    the fused one-scan report agrees with DuckDB on the same rows."""
    import duckdb

    from gclog_parser_spark.operators.quality import embedding_checks

    rows = [
        (0, [1.0, 2.0]),            # clean
        (1, None),                  # null vector
        (2, [1.0, 2.0, 3.0]),       # wrong width
        (3, [None, 2.0]),           # null component
        (4, [float("nan"), 1.0]),   # non-finite
        (5, [float("inf"), 1.0]),   # non-finite
        (6, [0.0, 0.0]),            # zero vector
        (7, [None, 0.0]),           # null comp, NOT a zero vector
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = {
        r["rule"]: (r["metric"], r["passed"])
        for r in embedding_checks(emb, dim=2).collect()
    }
    assert got == {
        "emb_vector_not_null": (0.125, False),
        "emb_dim_consistent": (0.125, False),
        "emb_no_null_components": (0.25, False),
        "emb_components_finite": (0.25, False),
        "emb_no_zero_vectors": (0.125, False),
    }
    # oracle lockstep on the same dirty rows
    from gclog_parser_spark.oracle_text import embedding_checks_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES"
        " (0, [1.0, 2.0]), (1, NULL), (2, [1.0, 2.0, 3.0]),"
        " (3, [NULL, 2.0]), (4, ['nan'::DOUBLE, 1.0]),"
        " (5, ['inf'::DOUBLE, 1.0]), (6, [0.0, 0.0]),"
        " (7, [NULL, 0.0])) t(vec_id, embedding)"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(embedding_checks_sql(dim=2)).fetchall()
    }
    assert want == got


def test_embedding_checks_clean_corpus_passes(spark, sf_dir):
    from gclog_parser_spark.operators.quality import embedding_checks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = embedding_checks(emb, dim=64).collect()
    assert len(rows) == 5 and all(r["passed"] for r in rows)
