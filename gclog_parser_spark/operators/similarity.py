"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k: `F.aggregate`/`zip_with`
  dot products, fully JVM-side.  This is the correctness baseline and
  the right plan when the query set is small (broadcast the queries,
  scan the corpus once).
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH.  Plane
  components are deterministic literals (seeded in Python, shared with
  the DuckDB oracle), bucket = sign bits; candidate generation is an
  equi-join on the bucket id, so shuffle volume ∝ corpus, not pairs.
* ``neardup_pairs`` — embedding-cosine near-duplicate pairs within a
  blocking key (label), the standard blocked-similarity-join shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: deterministic pseudo-random hyperplanes (seeded linear congruential
#: generator — literal-stable across engines and sessions)
N_PLANES = 8
EMB_DIM = 64


def _lcg(seed: int):
    x = seed
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield (x >> 33) / float(1 << 31) - 1.0  # in [-1, 1)


def plane_components(
    n_planes: int = N_PLANES, dim: int = EMB_DIM, seed: int = 42
):
    g = _lcg(seed)
    return [
        [round(next(g), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _cos_sim(a, b):
    """Rounded cosine similarity; NULL when either vector has zero norm
    (web-scale corpora DO contain all-zero embeddings, and under ANSI
    mode a bare 0/0 aborts the whole scan).  NULLs sort last under the
    DESC orderings here — identical in DuckDB (default_null_order
    nulls_last)."""
    denom = _norm(a) * _norm(b)
    return F.when(
        denom != 0, F.round(_dot(a, b) / denom, 6)
    )


def cosine_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity to the embedding of
    ``query_vec_id`` (excluded from results).  Deterministic ordering:
    (rounded sim desc, vec_id asc)."""
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    scored = (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q"))
                / (_norm(F.col("embedding")) * _norm(F.col("q"))),
                6,
            ).alias("sim"),
        )
    )
    return (
        scored.orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "sim")
    )


def lsh_buckets(emb: DataFrame, seed: int = 42) -> DataFrame:
    """(vec_id, bucket) — bucket = sign-bit string of the hyperplane
    dot products."""
    planes = plane_components(seed=seed)
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(c) for c in p])
        bits.append(
            F.when(_dot(F.col("embedding"), lit) >= 0, F.lit("1"))
            .otherwise(F.lit("0"))
        )
    return emb.select(
        "vec_id", "embedding", F.concat(*bits).alias("bucket")
    )


def lsh_bucket_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 5, seed: int = 42
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket — the candidate set an IVF/LSH index would scan."""
    b = lsh_buckets(emb, seed)
    q = b.where(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"),
        F.col("embedding").alias("q"),
    )
    cand = b.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).where(F.col("vec_id") != query_vec_id)
    scored = cand.select(
        "vec_id",
        _cos_sim(F.col("embedding"), F.col("q")).alias("sim"),
    )
    return (
        scored.orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "sim")
    )


#: IVF coarse quantizer: deterministic pseudo-random centroids (same
#: LCG as the LSH planes, different seed) — literal-stable across
#: engines so the DuckDB oracle replicates assignment exactly.
N_CELLS = 8


def centroid_components(
    n_cells: int = N_CELLS, dim: int = EMB_DIM, seed: int = 7
):
    g = _lcg(seed)
    return [
        [round(next(g), 6) for _ in range(dim)] for _ in range(n_cells)
    ]


def ivf_assign(emb: DataFrame, seed: int = 7) -> DataFrame:
    """(vec_id, embedding, cell) — cell = argmax over centroids of the
    dot product (spherical coarse quantization).  Computed scan-side;
    at 10^12 scale the assignment is a one-pass projection and the
    cell becomes the table's partition key."""
    cents = centroid_components(seed=seed)
    scores = [
        _dot(F.col("embedding"), F.array(*[F.lit(c) for c in cent]))
        for cent in cents
    ]
    best = F.greatest(*scores)
    cell = F.lit(len(cents) - 1)
    for j in range(len(cents) - 2, -1, -1):  # earliest cell wins ties
        cell = F.when(scores[j] == best, F.lit(j)).otherwise(cell)
    return emb.select(
        "vec_id", "embedding", cell.cast("int").alias("cell")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 5,
    n_probe: int = 2,
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: exact cosine, but only within the
    ``n_probe`` cells whose centroids score highest for the query —
    the inverted-file candidate set.  Candidate generation is an
    equi-join on the cell id (shuffle ∝ corpus, never ∝ pairs); at
    scale the cells are partition-pruned instead of joined."""
    assigned = ivf_assign(emb, seed)
    cents = centroid_components(seed=seed)
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    qscores = q.select(
        "q",
        *[
            _dot(F.col("q"), F.array(*[F.lit(c) for c in cent])).alias(
                f"qs{j}"
            )
            for j, cent in enumerate(cents)
        ],
    )
    # top-n_probe query cells, computed on the single query row.
    # Sort key is (-score, cell) ASCENDING so tied scores break to the
    # LOWEST cell — identical to the oracle's ORDER BY s DESC, cell ASC
    # (reverse(array_sort) would pick the highest cell on ties).
    score_arr = F.array(
        *[
            F.struct(
                (-F.col(f"qs{j}")).alias("neg_s"), F.lit(j).alias("cell")
            )
            for j in range(len(cents))
        ]
    )
    probes = qscores.select(
        "q",
        F.slice(F.array_sort(score_arr), 1, n_probe).alias("top"),
    ).select("q", F.explode("top.cell").alias("cell"))

    cand = assigned.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != query_vec_id
    )
    scored = cand.select(
        "vec_id",
        _cos_sim(F.col("embedding"), F.col("q")).alias("sim"),
    )
    return (
        scored.orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "sim")
    )


def neardup_pairs(
    emb: DataFrame, threshold: float = 0.9, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.
    At 10^12 scale the block key comes from LSH buckets; here the
    provided label column doubles as the block."""
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = _cos_sim(F.col("a.embedding"), F.col("b.embedding"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
