"""Iterative graph algorithms over edge DataFrames.

PageRank is the classic link-graph quality prior for web corpora
(Common Crawl ranks hosts this way; LLM corpus pipelines use it as a
document-quality feature next to the text heuristics in
``operators/textstats.py``).  The reference repo has no graph surface —
this belongs to the north rule's web-corpus superset, alongside
``dedup.connected_components`` (which shares the same iterative-plan
discipline: bounded rounds, lineage truncation, O(1) driver state).

Exact cross-engine parity trick: ranks are **integer ticks**
(rank × 10^12 as BIGINT) and every update uses only integer ops —
``DIV`` floor division and BIGINT sums — so the DuckDB oracle's
unrolled-CTE reimplementation matches bit-for-bit, with no
float-summation-order tolerance games.  The tick formulas:

    r0        = scale DIV N                      (every node)
    base      = ((100-d)·(scale DIV N)) DIV 100
    contrib_e = r_src DIV outdeg_src             (per edge)
    r'        = base + (d · Σ contrib_in) DIV 100

Dangling mass is dropped (the no-redistribution PageRank variant) —
both engines implement the identical rule.

Scale: each iteration is one shuffle join of edges⋈ranks on src plus
one partial-aggregated shuffle on dst — shuffle ∝ edges, state ∝
nodes, never quadratic.  Lineage is truncated with ``localCheckpoint``
each round (same reasoning as dedup.connected_components — 5 chained
joins would otherwise nest 10 shuffles in one lineage tree and
re-plan/re-execute on any recompute).  The only driver-side scalars
are the node count and (for the events-derived demo graph) the user
count — O(1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration integer-tick PageRank over distinct edges.

    Returns ``(node, rank_ticks)`` for every node that appears as a
    source or destination.  ``damping_pct`` is the damping factor in
    percent (85 = the canonical 0.85) so the damping multiply stays in
    BIGINT.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank over an empty edge set")
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100

    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(outdeg, "src")
    ranks = nodes.withColumn("rank_ticks", F.lit(r0).cast("long"))
    for _ in range(n_iter):
        contrib = (
            ed.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ticks DIV deg").alias("c"),
            )
        )
        insum = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(insum, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT)))"
                        " DIV 100"
                    )
                ).cast("long").alias("rank_ticks"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def events_link_graph(events: DataFrame) -> DataFrame:
    """Deterministic demo link graph from the events table: user u
    links to ``event_id mod n_users`` for each of u's events (distinct
    pairs).  Dense node ids 0..n_users-1, so the node set is exactly
    the user set — reproducible by the DuckDB oracle with the same
    modular arithmetic."""
    n_users = events.select(F.countDistinct("user_id")).first()[0]
    return events.select(
        F.col("user_id").alias("src"),
        (F.col("event_id") % F.lit(int(n_users))).alias("dst"),
    ).distinct()
