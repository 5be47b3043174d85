"""ExactSubstr span dedup (operators/dedup.py::span_dedup): semantics
on constructed corpora, the plan shape, and the degenerate inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark.operators.dedup import span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_duplicate_span_removed(spark):
    """A 5-gram shared by two docs is removed from BOTH (the rule is
    occurrence-count > 1, not keep-first), and each doc keeps its
    unique flanks."""
    shared = "alpha beta gamma delta epsilon"
    docs = _docs(
        spark,
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} four five six seven"),
        ],
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, k=5).collect()}
    assert out[1]["clean_text"] == "one two three"
    assert out[1]["n_removed"] == 5
    assert out[2]["clean_text"] == "four five six seven"
    assert out[2]["n_removed"] == 5


def test_within_doc_repeat_counts_as_duplicate(spark):
    """ExactSubstr counts ANY second occurrence, including within one
    document — both copies are covered."""
    span = "a b c d e"
    docs = _docs(spark, [(1, f"{span} x {span} y")])
    r = span_dedup(docs, k=5).collect()[0]
    assert r["clean_text"] == "x y"
    assert r["n_tokens"] == 12
    assert r["n_removed"] == 10


def test_overlapping_coverage_is_a_union_not_a_sum(spark):
    """Two duplicated grams overlapping by four tokens cover six
    tokens, not ten: coverage is the union of [s, s+k-1] intervals."""
    docs = _docs(
        spark,
        [
            (1, "p q r s t u"),  # grams pqrst and qrstu both start here
            (2, "p q r s t zzz"),
            (3, "yyy q r s t u"),
        ],
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, k=5).collect()}
    assert out[1]["clean_text"] == ""
    assert out[1]["n_removed"] == 6
    assert out[2]["clean_text"] == "zzz"
    assert out[3]["clean_text"] == "yyy"


def test_short_docs_have_no_grams_and_survive(spark):
    docs = _docs(spark, [(1, "tiny doc"), (2, "tiny doc")])
    out = {r["doc_id"]: r for r in span_dedup(docs, k=5).collect()}
    assert out[1]["clean_text"] == "tiny doc"
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 0


def test_empty_input(spark):
    docs = _docs(spark, []).where(F.lit(False))
    assert span_dedup(docs).count() == 0


def test_plan_no_python_and_linear_shuffles(spark):
    """Plan pin: no Python eval anywhere (pure relational path) and a
    bounded exchange count — gram count, gram join, the (doc,pos)
    probe join, and the doc-keyed window/reassembly."""
    docs = _docs(spark, [(1, "a b c d e f")])
    plan = (
        span_dedup(docs, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 5
