"""Similarity-operator edge cases and scale-shape tests: tie-break
parity with the DuckDB oracle, LSH-bucket blocking for near-dup, and
the numpy scan variants."""

from __future__ import annotations

import duckdb
import pytest

from gclog_parser_spark.operators.similarity import EMB_DIM, _lcg


@pytest.fixture(scope="module")
def tied_emb(spark, tmp_path_factory):
    """21 embeddings where vec_id 0 (the query) is ALL ZEROS — every
    centroid dot product ties at 0, so the probe-cell choice is pure
    tie-break."""
    g = _lcg(99)
    rows = [(0, [0.0] * EMB_DIM, "a")]
    for i in range(1, 21):
        rows.append(
            (i, [round(next(g), 6) for _ in range(EMB_DIM)], "a")
        )
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label string"
    )
    path = str(tmp_path_factory.mktemp("tied") / "embeddings.parquet")
    df.coalesce(1).write.parquet(path)
    return path


def test_ivf_zero_query_tie_break_matches_oracle(spark, tied_emb):
    """All-zero query ⇒ all centroid scores tie ⇒ both engines must
    probe the SAME (lowest) cells; results must match exactly."""
    from gclog_parser_spark.oracle_text import ann_ivf_sql
    from gclog_parser_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(tied_emb)
    got = sorted(
        (r["vec_id"], r["sim"])
        for r in ivf_topk(emb, query_vec_id=0, k=5).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tied_emb}/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(ann_ivf_sql(0, 5)).fetchall()))
    con.close()
    # zero-norm query ⇒ sim is NULL on both sides (the guard), and the
    # result set is decided purely by probe-cell + vec_id tie-breaks
    assert got == want
    assert all(s is None for _, s in got)
