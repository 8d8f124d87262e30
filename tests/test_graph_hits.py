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


# ---------------------------------------------------------------------------
# triangle counting (graph/triangles.py)
# ---------------------------------------------------------------------------


def _tri_counts(spark, edges):
    from searchengine_spark.graph.triangles import node_triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.n_tri for r in node_triangle_counts(df).collect()}


def test_triangles_hand_graphs(spark):
    from searchengine_spark.graph.triangles import triangle_count

    # K3: one triangle, every node in it
    assert _tri_counts(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}
    # K4: 4 triangles, every node in 3 of them
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri_counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # square without diagonals: zero triangles but ALL nodes reported
    sq = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _tri_counts(spark, sq) == {1: 0, 2: 0, 3: 0, 4: 0}
    # duplicates, reversed duplicates and self-loops collapse/drop
    noisy = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (2, 2)]
    assert _tri_counts(spark, noisy) == {1: 1, 2: 1, 3: 1}
    import pyspark.sql.functions as F  # noqa: F401
    from searchengine_spark.graph.triangles import triangles

    k4df = spark.createDataFrame(k4, "src long, dst long")
    tri = [tuple(r) for r in triangles(k4df).collect()]
    assert len(tri) == len(set(tri)) == 4  # each triangle exactly once
    assert triangle_count(k4df) == 4


def test_triangles_orientation_handles_hubs(spark):
    """A star hub (degree n) plus one rim edge: the hub must not be a
    wedge SOURCE (degree orientation points every spoke AT the hub), and
    the count is exactly the rim edges' triangles."""
    star = [(100, i) for i in range(20)] + [(0, 1), (2, 3)]
    got = _tri_counts(spark, star)
    assert got[100] == 2 and got[0] == got[1] == got[2] == got[3] == 1
    assert sum(got.values()) == 6  # 3 corners per triangle, 2 triangles
    from searchengine_spark.graph.triangles import oriented_edges

    df = spark.createDataFrame(star, "src long, dst long")
    o = oriented_edges(df)
    from pyspark.sql import functions as F

    # hub never appears as the wedge source
    assert o.where(F.col("lo") == 100).count() == 0


# ---------------------------------------------------------------------------
# k-core (graph/kcore.py)
# ---------------------------------------------------------------------------


def test_kcore_matches_python_twin_and_hand_graphs(spark):
    from searchengine_spark.graph.kcore import kcore_nodes, py_kcore

    # triangle + pendant chain: 2-core = the triangle only
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.deg for r in kcore_nodes(df, 2).collect()}
    assert got == py_kcore(edges, 2) == {1: 2, 2: 2, 3: 2}
    # cascading peel: removing the chain tail re-exposes 4 then nothing new
    assert py_kcore(edges, 1) == {1: 2, 2: 2, 3: 3, 4: 2, 5: 1}
    assert {r.node for r in kcore_nodes(df, 1).collect()} == {1, 2, 3, 4, 5}
    # empty core
    assert kcore_nodes(df, 4).count() == 0
    # K5 is its own 4-core
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5df = spark.createDataFrame(k5, "src long, dst long")
    got5 = {r.node: r.deg for r in kcore_nodes(k5df, 4).collect()}
    assert got5 == {i: 4 for i in range(5)}
    with pytest.raises(ValueError, match="k must be"):
        kcore_nodes(df, 0)


def test_kcore_random_graph_matches_twin(spark):
    import random

    from searchengine_spark.graph.kcore import kcore_nodes, py_kcore

    rng = random.Random(42)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(150)})
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3, 4):
        got = {r.node: r.deg for r in kcore_nodes(df, k).collect()}
        assert got == py_kcore(edges, k), f"k={k}"


# ---------------------------------------------------------------------------
# multi-source BFS seed distance (graph/bfs.py)
# ---------------------------------------------------------------------------


def test_bfs_hand_graph_and_twin(spark):
    from searchengine_spark.graph.bfs import bfs_distances, py_bfs

    # path 1-2-3-4 plus a triangle hanging off 2; seed {1}
    edges = [(1, 2), (2, 3), (3, 4), (2, 5), (5, 6), (6, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.dist for r in bfs_distances(df, [1]).collect()}
    assert got == py_bfs(edges, [1]) == {1: 0, 2: 1, 3: 2, 5: 2, 4: 3, 6: 2}
    # multi-source: min over seeds, seeds at 0 even when one dominates
    got2 = {r.node: r.dist for r in bfs_distances(df, [1, 4]).collect()}
    assert got2 == py_bfs(edges, [1, 4])
    assert got2[4] == 0 and got2[3] == 1
    with pytest.raises(ValueError, match="non-empty"):
        bfs_distances(df, [])


def test_bfs_isolated_seed_and_hop_cap(spark):
    from searchengine_spark.graph.bfs import bfs_distances, py_bfs

    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # seed 99 touches no edge: result is just the seed at dist 0
    got = {r.node: r.dist for r in bfs_distances(df, [99]).collect()}
    assert got == {99: 0}
    # max_hops truncates the frontier identically to the twin
    got1 = {r.node: r.dist for r in bfs_distances(df, [1], max_hops=1).collect()}
    assert got1 == py_bfs(edges, [1], max_hops=1) == {1: 0, 2: 1}


def test_bfs_fixture_graph_matches_twin_and_unroll_depth_sufficed(spark):
    """Differential test on the oracle's exact fixture + the unroll-slack
    guard: the fixture graph's true eccentricity from the seeds must leave
    >= 2 rounds of slack under the oracle's unrolled depth (extra rounds
    are empty-frontier no-ops, so slack is harmless; a deeper graph would
    silently truncate BOTH sides identically — this pins that the entry
    reflects the COMPLETE fixed point, not a truncation)."""
    from searchengine_spark.entry_queries import (
        _BFS_MAX_HOPS,
        _BFS_ORACLE_ROUNDS,
        _BFS_SOURCES,
    )
    from searchengine_spark.fixtures import graph_edges_df, graph_edges_pandas
    from searchengine_spark.graph.bfs import bfs_distances, py_bfs

    pdf = graph_edges_pandas(n_nodes=200)
    edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    twin = py_bfs(edges, _BFS_SOURCES, max_hops=100)
    got = {
        r.node: r.dist
        for r in bfs_distances(
            graph_edges_df(spark, n_nodes=200), _BFS_SOURCES, _BFS_MAX_HOPS
        ).collect()
    }
    assert got == twin
    assert max(twin.values()) <= _BFS_ORACLE_ROUNDS - 2
    assert max(twin.values()) <= _BFS_MAX_HOPS - 2


# ---------------------------------------------------------------------------
# label-propagation communities (graph/labelprop.py)
# ---------------------------------------------------------------------------


def test_labelprop_two_cliques_bridge(spark):
    from searchengine_spark.graph.labelprop import (
        label_propagation,
        py_label_propagation,
    )

    # two triangles joined by one bridge edge: two communities, each
    # labeled by its smallest member
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, 5).collect()}
    assert got == py_label_propagation(edges, 5)
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == got[6]
    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(df, -1)


def test_labelprop_zero_rounds_is_identity(spark):
    from searchengine_spark.graph.labelprop import label_propagation

    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, 0).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}


def test_labelprop_random_graph_matches_twin_per_round(spark):
    """Synchronous-update parity: the distributed and python twins agree
    after EVERY round count (not just the last), pinning that updates are
    synchronous and ties break to the smallest label."""
    import random

    from searchengine_spark.graph.labelprop import (
        label_propagation,
        py_label_propagation,
    )

    rng = random.Random(11)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(80)})
    df = spark.createDataFrame(edges, "src long, dst long")
    for it in (1, 2, 4):
        got = {r.node: r.label for r in label_propagation(df, it).collect()}
        assert got == py_label_propagation(edges, it), f"n_iter={it}"


# ---------------------------------------------------------------------------
# deterministic random walks (graph/walks.py)
# ---------------------------------------------------------------------------


def test_walks_path_graph_bounces(spark):
    from searchengine_spark.graph.walks import random_walks

    # single edge: both endpoints have degree 1, so every pick is forced
    # and the walks strictly alternate
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {
        (r.walk_id, r.pos): r.node
        for r in random_walks(df, walk_length=4).collect()
    }
    assert got == {
        (1, 0): 1, (1, 1): 2, (1, 2): 1, (1, 3): 2,
        (2, 0): 2, (2, 1): 1, (2, 2): 2, (2, 3): 1,
    }


def test_walks_random_graph_matches_twin(spark):
    """Distributed walks replay the pure-python twin hop-for-hop,
    including multiple replicas per start node and a non-default seed."""
    import random

    from searchengine_spark.graph.walks import py_random_walks, random_walks

    rng = random.Random(23)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.walk_id, r.pos): r.node
        for r in random_walks(
            df, walk_length=5, walks_per_node=2, seed=7
        ).collect()
    }
    want = py_random_walks(edges, walk_length=5, walks_per_node=2, seed=7)
    assert got == want
    # every live node starts exactly walks_per_node full-length walks
    n_nodes = len({n for e in edges if e[0] != e[1] for n in e})
    assert len(got) == n_nodes * 2 * 5


def test_walks_rejects_bad_params(spark):
    import pytest as _pytest

    from searchengine_spark.graph.walks import random_walks

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="walk_length"):
        random_walks(df, walk_length=0)
    with _pytest.raises(ValueError, match="walks_per_node"):
        random_walks(df, walk_length=2, walks_per_node=0)


# ---------------------------------------------------------------------------
# skip-gram pair export (textops/skipgram.py) over the walk corpus
# ---------------------------------------------------------------------------


def _sg_counts(spark, rows, window):
    from searchengine_spark.textops.skipgram import skipgram_counts

    df = spark.createDataFrame(rows, "seq_id long, pos int, token string")
    return {
        (r.center, r.context): r.n
        for r in skipgram_counts(df, window=window).collect()
    }


def test_skipgram_hand_sequence(spark):
    # a b c d, window 2: ab ac bc bd cd forward, each doubled
    rows = [(1, i, t) for i, t in enumerate("abcd")]
    got = _sg_counts(spark, rows, window=2)
    fwd = {("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")}
    want = {p: 1 for p in fwd} | {(b, a): 1 for a, b in fwd}
    assert got == want


def test_skipgram_gapped_positions_use_stream_order(spark):
    # positions 0/5/9 still count as adjacent ranks (token-stream
    # semantics — upstream filtering must not tear windows apart)
    rows = [(1, 0, "a"), (1, 5, "b"), (1, 9, "c")]
    got = _sg_counts(spark, rows, window=1)
    assert got == {("a", "b"): 1, ("b", "a"): 1,
                   ("b", "c"): 1, ("c", "b"): 1}


def test_skipgram_matches_twin_random(spark):
    import random

    from searchengine_spark.textops.skipgram import py_skipgram_counts

    rng = random.Random(31)
    rows = [
        (s, p, rng.choice("abcdef"))
        for s in range(6)
        for p in range(rng.randrange(1, 12))
    ]
    for w in (1, 2, 3):
        assert _sg_counts(spark, rows, window=w) == py_skipgram_counts(
            rows, window=w
        ), f"window={w}"


def test_skipgram_rejects_bad_window(spark):
    import pytest as _pytest

    from searchengine_spark.textops.skipgram import skipgram_pairs

    df = spark.createDataFrame([(1, 0, "a")], "seq_id long, pos int, token string")
    with _pytest.raises(ValueError, match="window"):
        skipgram_pairs(df, window=0)


def test_ppmi_hand_counts(spark):
    import math

    from searchengine_spark.textops.skipgram import ppmi_weights

    # counts: (a,b)=4 (a,c)=1 (b,a)=4 (c,a)=1 ; N=10
    counts = spark.createDataFrame(
        [("a", "b", 4), ("a", "c", 1), ("b", "a", 4), ("c", "a", 1)],
        "center string, context string, n long",
    )
    got = {
        (r.center, r.context): r.ppmi_r
        for r in ppmi_weights(counts).collect()
    }
    # p(a,b)=.4, p(a)=.5, p_ctx(b)=.4 -> pmi = ln(.4/.2) = ln 2 > 0
    assert got[("a", "b")] == round(math.log(2.0), 6)
    # p(a,c)=.1, p(a)=.5, p_ctx(c)=.1 -> pmi = ln(2) too
    assert got[("a", "c")] == round(math.log(2.0), 6)
    # (b,a): .4 / (.4 * .5) = 2 ; (c,a): .1/(.1*.5)=2 — all positive here
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")}


def test_ppmi_matches_twin_and_drops_negatives(spark):
    import random

    from searchengine_spark.textops.skipgram import (
        ppmi_weights,
        py_ppmi,
        py_skipgram_counts,
    )

    rng = random.Random(47)
    rows = [
        (s, p, rng.choice("abcdefgh"))
        for s in range(8)
        for p in range(rng.randrange(3, 15))
    ]
    counts = py_skipgram_counts(rows, window=2)
    cdf = spark.createDataFrame(
        [(c, x, n) for (c, x), n in counts.items()],
        "center string, context string, n long",
    )
    for mc, alpha in ((1, 1.0), (2, 1.0), (1, 0.75)):
        got = {
            (r.center, r.context): r.ppmi_r
            for r in ppmi_weights(cdf, min_count=mc, alpha=alpha).collect()
        }
        want = py_ppmi(counts, min_count=mc, alpha=alpha)
        assert set(got) == set(want), (mc, alpha)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, (k, mc, alpha)
    # anti-associated pairs have NEGATIVE pmi and must be dropped:
    # pmi(a,b) = ln((1/20)/((10/20)*(10/20))) = ln 0.2 < 0
    anti = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 9), ("d", "b", 9), ("d", "c", 1)],
        "center string, context string, n long",
    )
    kept = {
        (r.center, r.context) for r in ppmi_weights(anti).collect()
    }
    assert kept == {("a", "c"), ("d", "b")}


def test_ppmi_empty_and_bad_params(spark):
    import pytest as _pytest

    from searchengine_spark.textops.skipgram import ppmi_weights

    counts = spark.createDataFrame(
        [("a", "b", 1)], "center string, context string, n long"
    )
    assert ppmi_weights(counts, min_count=5).count() == 0
    with _pytest.raises(ValueError, match="min_count"):
        ppmi_weights(counts, min_count=0)


# ---------------------------------------------------------------------------
# link prediction (graph/linkpred.py)
# ---------------------------------------------------------------------------


def _lp_rows(spark, edges, **kw):
    from searchengine_spark.graph.linkpred import link_prediction

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.u, r.v): (r.cn, r.aa_u, r.jacc_r)
        for r in link_prediction(df, **kw).collect()
    }


def test_linkpred_hand_graph(spark):
    """Path 1-2-3: pair (1,3) shares neighbor 2 (deg 2), is non-adjacent.
    AA = round(1e6/ln 2); Jaccard = 1/(1+1-1) = 1.0. Triangle edges are
    excluded (they're already links)."""
    import math

    got = _lp_rows(spark, [(1, 2), (2, 3)])
    assert got == {(1, 3): (1, round(1e6 / math.log(2)), 1.0)}
    # K3: every pair adjacent -> nothing to predict
    assert _lp_rows(spark, [(1, 2), (2, 3), (3, 1)]) == {}


def test_linkpred_matches_python_twin(spark):
    """Differential test on the 200-node fixture graph, min_common=1
    (widest surface) — every pair, all three scores."""
    from searchengine_spark.fixtures import graph_edges_df, graph_edges_pandas
    from searchengine_spark.graph.linkpred import py_link_prediction

    pdf = graph_edges_pandas(n_nodes=80)
    edges = list(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    want = py_link_prediction(edges, min_common=1)
    df = graph_edges_df(spark, n_nodes=80)
    from searchengine_spark.graph.linkpred import link_prediction

    got = {
        (r.u, r.v): (r.cn, r.aa_u, r.jacc_r)
        for r in link_prediction(df, min_common=1).collect()
    }
    assert set(got) == set(want)
    for k, (cn, aa, jc) in want.items():
        g = got[k]
        assert g[0] == cn and g[1] == aa and abs(g[2] - jc) < 1e-9, k


def test_linkpred_center_degree_cap(spark):
    """A hub above the cap stops GENERATING wedges but still counts in
    endpoint degrees (Jaccard denominators stay honest)."""
    import math

    # star hub 100 over rim 0..9, plus a path 0-1-2 off the rim
    edges = [(100, i) for i in range(10)] + [(0, 1), (1, 2)]
    capped = _lp_rows(spark, edges, max_center_degree=5)
    # hub (deg 10) can't center wedges; node 1 (deg 3: 100,0,2) can.
    # pair (0,2): common neighbors via centers <=5 deg -> only node 1.
    assert (0, 2) in capped
    cn, aa, jc = capped[(0, 2)]
    assert cn == 1 and aa == round(1e6 / math.log(3))
    # deg(0)=3 (100,1), wait: 0 links 100 and 1 -> deg 2; 2 links 100,1 -> 2
    # jacc = 1/(2+2-1)
    assert abs(jc - round(1 / 3, 6)) < 1e-9
    # without the cap the hub centers C(10,2)=45 rim pairs
    uncapped = _lp_rows(spark, edges)
    assert len(uncapped) > len(capped)
