"""BPE trainer semantics: greedy left-to-right merge, deterministic
tie-break, early stop, and the encode fold.  The cross-engine value
parity is covered by tests/test_oracle_parity.py[text_bpe_merges];
these pin the algorithm's behavior on crafted corpora where the
general-purpose oracle would be overkill."""

from __future__ import annotations

import pyspark.sql.functions as F

from gclog_parser_spark.operators.tokenizer import (
    bpe_encode,
    bpe_merges,
    word_freqs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_greedy_non_overlapping_run(spark):
    """'aaaa' with pair (a,a): merges at positions 1 and 3, never the
    overlapping middle pair — the single most bug-prone BPE case."""
    docs = _docs(spark, ["aaaa"])
    m = bpe_merges(docs, n_merges=2).collect()
    # step 1: (a,a) appears 3 times (positions 1-2, 2-3, 3-4)
    assert (m[0]["lhs"], m[0]["rhs"], m[0]["n"]) == ("a", "a", 3)
    # after the greedy pass 'aaaa' -> [aa, aa]; the only pair is (aa, aa)
    assert (m[1]["lhs"], m[1]["rhs"], m[1]["n"]) == ("aa", "aa", 1)


def test_tie_break_is_lexicographic(spark):
    """Equal-count pairs: (lhs, rhs) ascending wins, deterministically."""
    docs = _docs(spark, ["zy ab zy ab"])
    m = bpe_merges(docs, n_merges=1).collect()
    assert (m[0]["lhs"], m[0]["rhs"]) == ("a", "b")


def test_early_stop_when_pairs_exhausted(spark):
    """Single-char vocab has no adjacent pairs after 0 merges."""
    docs = _docs(spark, ["a b a b a"])
    m = bpe_merges(docs, n_merges=8).collect()
    assert m == []


def test_merge_counts_weighted_by_word_freq(spark):
    """Pair counts weight by corpus word frequency, not distinct-word
    presence: 'ab' x3 beats 'cd' x2."""
    docs = _docs(spark, ["ab ab cd", "ab cd"])
    m = bpe_merges(docs, n_merges=1).collect()
    assert (m[0]["lhs"], m[0]["rhs"], m[0]["n"]) == ("a", "b", 3)


def test_max_word_len_guard(spark):
    """Overlong junk tokens are excluded from training."""
    docs = _docs(spark, ["ab ab " + "x" * 100])
    wf = word_freqs(docs).collect()
    assert {r["word"] for r in wf} == {"ab"}


def test_encode_applies_merges_in_order(spark):
    """Encoding with k learned merges shrinks subword counts
    monotonically and exactly reproduces the trained segmentation."""
    docs = _docs(spark, ["abab abab", "ab"])
    merges = bpe_merges(docs, n_merges=2).collect()
    # chars per doc: doc0 has 8, doc1 has 2
    n0 = {
        r["doc_id"]: r["n_subwords"]
        for r in bpe_encode(docs, []).collect()
    }
    n2 = {
        r["doc_id"]: r["n_subwords"]
        for r in bpe_encode(docs, merges).collect()
    }
    assert n0 == {0: 8, 1: 2}
    assert all(n2[d] <= n0[d] for d in n0)
    # merge 1 is (a,b) count 5; merge 2 is (ab,ab) count 2
    assert (merges[0]["lhs"], merges[0]["rhs"], merges[0]["n"]) == (
        "a",
        "b",
        5,
    )
    assert n2 == {0: 2, 1: 1}


def test_training_plan_has_no_python(spark):
    """The per-iteration pair-count plan stays JVM-side: no
    BatchEvalPython / ArrowEvalPython anywhere (fold + explode +
    hash-agg are all codegen)."""
    from gclog_parser_spark.operators.tokenizer import _pair_counts

    docs = _docs(spark, ["ab ab cd"])
    vocab = word_freqs(docs).select(
        F.split(
            F.trim(F.regexp_replace("word", "(.)", "$1 ")), " "
        ).alias("syms"),
        "freq",
    )
    plan = _pair_counts(vocab)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
