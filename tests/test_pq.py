"""Product quantization (operators/similarity.py::pq_*): training
improves the codebooks, codes are bounded, and ADC search finds real
L2 neighbors."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark.operators.similarity import (
    PQ_KS,
    PQ_M,
    PQ_TICKS,
    pq_encode,
    pq_init,
    pq_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _quant_error(spark, emb, cents):
    """Total integer-tick reconstruction error Σ_vec Σ_m ||x_m −
    c_code||² — the k-means objective PQ training minimizes."""
    sub = 64 // len(cents)
    cdf = spark.createDataFrame(
        [
            (m, c, i, cents[m][c][i])
            for m in range(len(cents))
            for c in range(len(cents[m]))
            for i in range(sub)
        ],
        "m int, cell int, i int, ct long",
    )
    codes = pq_encode(emb, cents)
    t = emb.join(codes, "vec_id").select(
        "vec_id",
        F.array(*[F.col(f"code_{m}") for m in range(len(cents))]).alias(
            "a"
        ),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        (F.col("pos") / sub).cast("int").alias("m"),
        F.element_at("a", (F.col("pos") / sub).cast("int") + 1).alias(
            "cell"
        ),
        F.pmod("pos", F.lit(sub)).cast("int").alias("i"),
        F.round(F.col("val").cast("double") * PQ_TICKS)
        .cast("long")
        .alias("t"),
    )
    return (
        t.join(F.broadcast(cdf), ["m", "cell", "i"])
        .select(
            ((F.col("t") - F.col("ct")) * (F.col("t") - F.col("ct"))).alias(
                "e"
            )
        )
        .agg(F.sum("e"))
        .collect()[0][0]
    )


def test_training_reduces_quantization_error(spark, emb):
    init = pq_init(emb)
    trained = pq_train(emb, iters=2)
    e0 = _quant_error(spark, emb, init)
    e2 = _quant_error(spark, emb, trained)
    assert e2 < e0 * 0.9  # Lloyd's must actually move the codebooks


def test_codes_bounded_and_total(emb):
    codes = pq_encode(emb, pq_init(emb))
    n = emb.count()
    assert codes.count() == n
    for m in range(PQ_M):
        mm = codes.agg(
            F.min(f"code_{m}"), F.max(f"code_{m}")
        ).collect()[0]
        assert 0 <= mm[0] and mm[1] <= PQ_KS - 1


def test_adc_finds_true_l2_neighbors(emb):
    """PQ top-10 must overlap the exact tick-L2 top-20 (lossy codes,
    but not random)."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    T = np.copysign(np.floor(np.abs(M * PQ_TICKS) + 0.5), M)
    q = T[ids == 0][0]
    d = ((T - q) ** 2).sum(axis=1)
    order = ids[np.argsort(d, kind="stable")]
    true20 = {int(v) for v in order if v != 0}
    true20 = set(list(true20)[:0]) | set(
        int(v) for v in order[order != 0][:20]
    )
    cents = pq_train(emb, iters=2)
    got = {r["vec_id"] for r in pq_topk(emb, cents, k=10).collect()}
    assert len(got & true20) >= 4


def test_empty_cells_keep_previous_centroid(spark):
    """A degenerate corpus (all identical vectors) trains without
    error and keeps init centroids for the cells nothing maps to."""
    emb = spark.createDataFrame(
        [(i, [float(1)] * 64, 0) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = pq_train(emb, iters=1)
    assert len(cents) == PQ_M and len(cents[0]) == PQ_KS


def test_pq_np_assigner_trains_identical_codebooks(spark, sf_dir):
    """The Arrow int64 assigner (the default) must reproduce the
    codegen literal-argmin path's codebooks BIT-FOR-BIT (integer
    ticks + HALF_UP replication + first-minimum tie rule) — it is a
    construction-cost optimization, not an approximation.  The expr
    path is the cross-engine parity witness the oracle mirrors."""
    from gclog_parser_spark.operators.similarity import pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert pq_train(emb, iters=2, assigner="expr") == pq_train(
        emb, iters=2, assigner="np"
    )


def test_ivfpq_candidates_come_from_probe_cells(spark, sf_dir):
    """Every IVF-PQ result sits in one of the query's n_probe coarse
    cells, and its ADC distance equals the full-corpus PQ distance
    for the same vec_id (the cell filter prunes candidates, never
    changes the metric)."""
    from gclog_parser_spark.operators.similarity import (
        _query_probes,
        centroid_components,
        ivf_assign,
        ivfpq_topk,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents_pq = pq_train(emb, iters=2)
    got = ivfpq_topk(emb, cents_pq, k=10, n_probe=2).collect()
    assert len(got) == 10

    cents_ivf = centroid_components()
    cells = {
        r["cell"]
        for r in _query_probes(emb, 0, cents_ivf, 2).collect()
    }
    assigned = {
        r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents=cents_ivf).collect()
    }
    for r in got:
        assert assigned[r["vec_id"]] in cells

    full = {
        r["vec_id"]: r["pq_dist_ticks"]
        for r in pq_topk(emb, cents_pq, k=10**9 // 2).collect()
    }
    for r in got:
        assert full[r["vec_id"]] == r["pq_dist_ticks"]
