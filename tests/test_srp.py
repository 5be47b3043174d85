"""Signed random projection (operators/similarity.py::srp_project):
the two physical paths are bit-identical, the JL distance-preservation
property actually holds on real embeddings, and the plans have the
right shape."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from gclog_parser_spark.operators.similarity import (
    _srp_sign,
    srp_project,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_np_path_equals_rel_path_bitwise(emb):
    """Integer matmul vs broadcast-join-aggregate: same exact int64s
    (this is the property float scorers can't have — integer ticks
    make accumulation order irrelevant)."""
    rel = {(r["vec_id"], r["j"]): r["pt"]
           for r in srp_project(emb, path="rel").collect()}
    np_ = {(r["vec_id"], r["j"]): r["pt"]
           for r in srp_project(emb, path="np").collect()}
    assert rel == np_
    assert len(rel) == emb.count() * 16


def test_sign_matrix_is_balanced_and_deterministic():
    """md5 parity gives a near-balanced ±1 matrix and the same matrix
    every call (it is a pure function, not RNG state)."""
    vals = [_srp_sign(i, j) for i in range(64) for j in range(16)]
    assert set(vals) == {1, -1}
    frac_pos = sum(v == 1 for v in vals) / len(vals)
    assert 0.4 < frac_pos < 0.6
    assert vals == [_srp_sign(i, j) for i in range(64) for j in range(16)]


def test_jl_preserves_relative_distances(emb):
    """The point of the transform: projected similarities track
    original similarities IN AGGREGATE (the actual JL statement —
    per-neighbor rank preservation at 2-4× reduction is noise on this
    near-isotropic synthetic corpus, where the strongest off-diagonal
    cosine is ~0.3).  Pearson r between all-pairs true and projected
    cosine must clear 0.5 at out_dim=32 and grow with out_dim."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").limit(200).collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    iu = np.triu_indices(len(M), 1)
    true_s = (M @ M.T)[iu]

    def proj_sims(out_dim):
        pv = {}
        for r in srp_project(emb, out_dim=out_dim, path="np").collect():
            pv.setdefault(r["vec_id"], [0] * out_dim)[r["j"]] = r["pt"]
        P = np.array([pv[i] for i in ids], dtype=np.float64)
        P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
        return (P @ P.T)[iu]

    r16 = np.corrcoef(true_s, proj_sims(16))[0, 1]
    r32 = np.corrcoef(true_s, proj_sims(32))[0, 1]
    assert r32 > 0.5
    assert r32 > r16 > 0.3


def test_rel_plan_broadcasts_sign_matrix(emb):
    plan = (
        srp_project(emb, path="rel")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    import re

    # one exchange: the (vec_id, j) partial-aggregated sum
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_np_plan_is_exchange_free(emb):
    plan = (
        srp_project(emb, path="np")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_empty_input(spark, emb):
    assert srp_project(emb.where(F.lit(False)), path="np").count() == 0
    assert srp_project(emb.where(F.lit(False)), path="rel").count() == 0


def test_unknown_path_raises(emb):
    with pytest.raises(ValueError):
        srp_project(emb, path="bogus")
