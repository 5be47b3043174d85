"""PageRank semantics on hand-checked graphs (the DuckDB oracle in
__spark_entry__ is the large-scale cross-check; here a third,
plain-Python reimplementation pins the integer-tick formulas)."""

import pyspark.sql.functions as F

from gclog_parser_spark.operators.graph import events_link_graph, pagerank


def _py_pagerank(edges, n_iter=5, d=85, scale=10**12):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    r0 = scale // n
    base = ((100 - d) * r0) // 100
    deg = {}
    for s, _ in set(edges):
        deg[s] = deg.get(s, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(n_iter):
        s_in = {v: 0 for v in nodes}
        for a, b in set(edges):
            s_in[b] += r[a] // deg[a]
        r = {v: base + (d * s_in[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_python_reimpl(spark):
    edges = [(1, 2), (2, 1), (3, 1), (3, 2), (4, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for n_iter in (1, 5):
        got = {
            r["node"]: r["rank_ticks"]
            for r in pagerank(df, n_iter=n_iter).collect()
        }
        assert got == _py_pagerank(edges, n_iter=n_iter)


def test_pagerank_source_only_node_gets_base_rank(spark):
    # node 3 has no in-links: rank = base term exactly; the hub (1)
    # outranks everything
    edges = [(1, 2), (2, 1), (3, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["rank_ticks"] for r in pagerank(df).collect()}
    base = ((100 - 85) * (10**12 // 3)) // 100
    assert got[3] == base
    assert got[1] > got[2] > got[3]


def test_pagerank_dedups_multi_edges(spark):
    # duplicate edges must not double a contribution
    once = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], "src bigint, dst bigint"
    )
    a = {r["node"]: r["rank_ticks"] for r in pagerank(once).collect()}
    b = {r["node"]: r["rank_ticks"] for r in pagerank(dup).collect()}
    assert a == b


def test_events_link_graph_is_deterministic(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g1 = events_link_graph(ev)
    g2 = events_link_graph(ev)
    assert g1.exceptAll(g2).count() == 0
    n_users = ev.select(F.countDistinct("user_id")).first()[0]
    mx = g1.agg(F.max("dst")).first()[0]
    assert mx < n_users


def test_triangles_k4(spark):
    """K4: every node sits in C(3,2)=3 triangles; 4 triangles total."""
    from gclog_parser_spark.operators.graph import triangle_counts

    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_star_and_path_are_zero(spark):
    """A hub star has maximal wedges but zero triangles — the case the
    degree orientation exists for."""
    from gclog_parser_spark.operators.graph import triangle_counts

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src bigint, dst bigint"
    )
    assert (
        triangle_counts(star).agg(F.sum("n_triangles")).first()[0] == 0
    )


def test_triangles_ignore_direction_loops_and_dups(spark):
    """(1,2),(2,1),(2,2) + a closing edge count one triangle once."""
    from gclog_parser_spark.operators.graph import triangle_counts

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 2), (2, 3), (3, 1), (1, 3)],
        "src bigint, dst bigint",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_hits_star_graph_pinned(spark):
    """Hub 0 -> authorities 1,2,3: node 0 takes the whole hub mass
    (10^12 ticks), each authority gets floor(scale/3), and the
    opposite scores are zero — exact integer expectations."""
    from gclog_parser_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src bigint, dst bigint"
    )
    got = {r["node"]: r for r in hits(e).collect()}
    scale = 10**12
    assert got[0]["hub_ticks"] == scale
    assert got[0]["auth_ticks"] == 0
    for v in (1, 2, 3):
        assert got[v]["auth_ticks"] == scale // 3
        assert got[v]["hub_ticks"] == 0


def test_hits_l1_mass_bounded_and_deterministic(spark):
    """On a small mixed graph the L1 tick totals stay within scale
    (floor loss only) and a re-run is bit-identical."""
    from gclog_parser_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3), (4, 1)],
        "src bigint, dst bigint",
    )
    r1 = sorted(map(tuple, hits(e).collect()))
    r2 = sorted(map(tuple, hits(e).collect()))
    assert r1 == r2
    scale = 10**12
    auth = sum(t[1] for t in r1)
    hub = sum(t[2] for t in r1)
    assert scale - 10 <= auth <= scale
    assert scale - 10 <= hub <= scale


def test_hits_rejects_zero_iterations(spark):
    """Round-4 advice regression: n_iter=0 used to leave auth unset
    and crash with AttributeError on the final join — now a loud
    ValueError, like the empty-edge-set guard."""
    import pytest

    from gclog_parser_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(e, n_iter=0)
