"""Incremental (batch-vs-corpus) dedup semantics on crafted corpora;
value parity vs DuckDB is tests/test_oracle_parity.py[dedup_incremental]."""

from __future__ import annotations

import pyspark.sql.functions as F

from gclog_parser_spark.operators.dedup import (
    incremental_dedup,
    minhash_band_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the crawler fetches pages from the web every day"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_verdict_classes(spark):
    corpus = _df(spark, [(0, BASE), (2, "totally unrelated content here "
                                        "nothing shared with anything")])
    batch = _df(
        spark,
        [
            (1, BASE),  # exact copy of corpus doc 0
            (3, BASE.replace("dog", "cat")),  # near-dup of corpus doc 0
            (5, "fresh unique document about spark adaptive execution "
                "planning and shuffle partition coalescing at runtime"),
            (7, "fresh unique document about spark adaptive execution "
                "planning and shuffle partition coalescing at runtime "
                "with one extra tail clause"),  # near-dup of batch doc 5
        ],
    )
    v = {r["doc_id"]: r for r in incremental_dedup(corpus, batch).collect()}
    assert v[1]["dup_exact"] and v[1]["dup_of_corpus"] and not v[1]["keep"]
    assert not v[3]["dup_exact"] and v[3]["dup_of_corpus"] and not v[3]["keep"]
    assert v[5]["keep"] and not (
        v[5]["dup_exact"] or v[5]["dup_of_corpus"] or v[5]["dup_in_batch"]
    )
    # the LATER within-batch member is the duplicate; the earlier keeps
    assert v[7]["dup_in_batch"] and not v[7]["keep"]
    assert not v[5]["dup_in_batch"]


def test_one_verdict_row_per_batch_doc(spark):
    corpus = _df(spark, [(0, BASE)])
    batch = _df(spark, [(1, BASE), (3, BASE), (5, "x")])  # 5: no shingles
    out = incremental_dedup(corpus, batch)
    assert out.count() == 3
    assert out.select("doc_id").distinct().count() == 3
    # a doc too short to shingle still gets a row (near stages skip it)
    v = {r["doc_id"]: r for r in out.collect()}
    assert v[5]["keep"] and not v[5]["dup_of_corpus"]


def test_agrees_with_full_reclustering_pairs(spark, sf_dir):
    """Every batch doc flagged near-dup must appear in the full-corpus
    band-pair set with an endpoint on the claimed side, and vice versa
    — the incremental path finds exactly the cross/within pairs full
    re-clustering would."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    v = incremental_dedup(corpus, batch).collect()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_band_pairs(docs).select("doc_a", "doc_b")
        .distinct().collect()
    }
    cross = {
        (a if a % 2 == 1 else b)
        for a, b in pairs
        if (a % 2) != (b % 2)
    }
    within = {b for a, b in pairs if a % 2 == 1 and b % 2 == 1}
    got_cross = {r["doc_id"] for r in v if r["dup_of_corpus"]}
    got_within = {r["doc_id"] for r in v if r["dup_in_batch"]}
    assert got_cross == cross
    assert got_within == within
