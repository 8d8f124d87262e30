"""HITS hubs & authorities: hand-computed semantics, distributed-vs-numpy
path equivalence, isolated-vertex handling."""

import math

import pytest


def _ref_hits(edges, nodes, iters):
    """Independent pure-python reference (no numpy, no shared code)."""
    h = {n: 1.0 for n in nodes}
    a = {n: 0.0 for n in nodes}
    for _ in range(iters):
        a = {n: 0.0 for n in nodes}
        for s, d in edges:
            a[d] += h[s]
        na = math.sqrt(sum(v * v for v in a.values()))
        if na > 0:
            a = {n: v / na for n, v in a.items()}
        h = {n: 0.0 for n in nodes}
        for s, d in edges:
            h[s] += a[d]
        nh = math.sqrt(sum(v * v for v in h.values()))
        if nh > 0:
            h = {n: v / nh for n, v in h.items()}
    return a, h


EDGES = [(1, 3), (2, 3), (3, 4), (2, 4), (5, 1)]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_hits_matches_reference(spark, edges_df):
    from searchengine_spark.graph import compute_hits

    nodes = sorted({s for s, _ in EDGES} | {d for _, d in EDGES})
    a_ref, h_ref = _ref_hits(EDGES, nodes, 20)
    got = {r["node"]: (r["authority"], r["hub"]) for r in
           compute_hits(edges_df, 20).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert math.isclose(got[n][0], a_ref[n], abs_tol=1e-9), n
        assert math.isclose(got[n][1], h_ref[n], abs_tol=1e-9), n
    # structural sanity: 3 and 4 split the authority mass; 2 (links to
    # both) is the best hub
    assert got[4][0] > got[1][0] and got[3][0] > got[1][0]
    assert got[2][1] == max(v[1] for v in got.values())


def test_hits_distributed_path_equivalence(spark, edges_df):
    from searchengine_spark.graph import compute_hits

    fast = {r["node"]: (r["authority"], r["hub"]) for r in
            compute_hits(edges_df, 5).collect()}
    dist = {r["node"]: (r["authority"], r["hub"]) for r in
            compute_hits(edges_df, 5, driver_max_graph=0).collect()}
    assert set(fast) == set(dist)
    for n in fast:
        assert math.isclose(fast[n][0], dist[n][0], abs_tol=1e-9), n
        assert math.isclose(fast[n][1], dist[n][1], abs_tol=1e-9), n


def test_hits_isolated_vertex_scores_zero(spark, edges_df):
    from searchengine_spark.graph import compute_hits

    nodes = spark.createDataFrame([(99,)], "node long")
    got = {r["node"]: r for r in compute_hits(edges_df, 3, nodes=nodes).collect()}
    assert got[99]["authority"] == 0.0 and got[99]["hub"] == 0.0
    # augmenting the universe does not change connected nodes' scores
    base = {r["node"]: r["authority"] for r in compute_hits(edges_df, 3).collect()}
    for n, v in base.items():
        assert math.isclose(got[n]["authority"], v, abs_tol=1e-12)


def test_hits_empty_graph(spark):
    from searchengine_spark.graph import compute_hits

    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    got = compute_hits(edges, 3, nodes=nodes).collect()
    assert {(r["node"], r["authority"], r["hub"]) for r in got} == {
        (1, 0.0, 0.0),
        (2, 0.0, 0.0),
    }
