"""Media phash dedup: bit-rule correctness, banding completeness vs
the all-pairs scan, and the small-payload fallback path."""

from __future__ import annotations

import pytest

from gclog_parser_spark.operators.multimodal import (
    PHASH_BITS,
    media_phash,
    media_phash_pairs,
)


def _pages(spark, payloads):
    rows = [
        (f"u{i:03d}", t.encode("utf-8")) for i, t in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def _ref_phash(text: str, bits: int = PHASH_BITS) -> int:
    """Independent reference implementation of the documented rule."""
    cps = [ord(c) for c in text]
    n = len(cps)
    total = sum(cps)
    bs = [0] * bits
    bn = [0] * bits
    for pos, c in enumerate(cps):
        b = pos * bits // n
        bs[b] += c
        bn[b] += 1
    h = 0
    for i in range(bits):
        if bn[i] and bs[i] * n >= total * bn[i]:
            h |= 1 << (bits - 1 - i)
    return h


def test_phash_matches_reference_rule(spark):
    texts = [
        "a" * 50 + "z" * 50,
        "hello world " * 40,
        "x" * 30,  # n < bits: exercises the small-payload loop
        "abc",
    ]
    got = {
        r.url: (r.n_cp, r.phash)
        for r in media_phash(_pages(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        assert got[f"u{i:03d}"] == (len(t), _ref_phash(t)), t[:20]


def test_phash_identical_payloads_collide_at_zero(spark):
    t = "the same payload " * 30
    pairs = media_phash_pairs(
        _pages(spark, [t, t, "completely different " * 40]),
        max_hamming=3,
        bands=5,
    ).collect()
    assert [(p.url_a, p.url_b, p.hamming) for p in pairs] == [
        ("u000", "u001", 0)
    ]


def test_phash_banding_complete_vs_bruteforce(spark):
    """Every pair within the Hamming threshold must survive banding
    (pigeonhole guarantee) — checked against the all-pairs scan."""
    import itertools

    base = "lorem ipsum dolor sit amet " * 20
    texts = [base[:i] + base[i] * 3 + base[i:] for i in range(0, 60, 4)]
    hs = {i: _ref_phash(t) for i, t in enumerate(texts)}
    want = sorted(
        (f"u{a:03d}", f"u{b:03d}", bin(hs[a] ^ hs[b]).count("1"))
        for a, b in itertools.combinations(hs, 2)
        if bin(hs[a] ^ hs[b]).count("1") <= 12
    )
    got = sorted(
        (p.url_a, p.url_b, p.hamming)
        for p in media_phash_pairs(
            _pages(spark, texts), max_hamming=12, bands=15
        ).collect()
    )
    assert got == want
    assert len(got) >= 1  # the corpus actually produced near-dups


def test_phash_pairs_param_validation(spark):
    pages = _pages(spark, ["abc def " * 20])
    with pytest.raises(ValueError, match="pigeonhole"):
        media_phash_pairs(pages, max_hamming=5, bands=5)
    with pytest.raises(ValueError, match="divide"):
        media_phash_pairs(pages, max_hamming=3, bands=7)
