"""Word-break tokenizers (A7/A8) and PageRank (R1-R3) parity tests.

Word-break cases mirror the reference's test style
(``WordBreakTokenizerTest.java:14-45``: expected segmentations + exception
on unbreakable input; CJK cases ``WordBreakCJKTokenizerTest.java:13-73``)
with our own injected dictionaries (the reference's 82k-word resource is
not copied). PageRank is verified against an independent numpy
implementation of the reference's exact iteration
(``IcsSearchEngine.java:96-134``)."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark.analysis.wordbreak import (
    load_freq_dict,
    make_wordbreak_udf,
    wordbreak_cjk_tokenize,
    wordbreak_tokenize,
)
from searchengine_spark.fixtures import graph_edges_pandas, graph_edges_df
from searchengine_spark.graph import compute_pagerank
from searchengine_spark.graph.pagerank import ALPHA, BETA, TOL, pagerank_scores

EN_DICT = {
    "it": 100, "is": 200, "a": 500, "nice": 30, "day": 80, "today": 60,
    "to": 400, "ni": 1, "ce": 1, "iceday": 1, "i": 50, "sun": 20,
    "shine": 10, "sunshine": 25,
}


def test_wordbreak_basic():
    # "anicedaytoday": stop words a/is/it/to dropped post-segmentation
    assert wordbreak_tokenize("anicedaytoday", EN_DICT) == ["nice", "day", "today"]


def test_wordbreak_prefers_max_probability():
    # "sunshine" as one word beats sun+shine: p(sunshine) > p(sun)*p(shine)
    assert wordbreak_tokenize("sunshine", EN_DICT) == ["sunshine"]


def test_wordbreak_case_folds():
    assert wordbreak_tokenize("ANiceDay", EN_DICT) == ["nice", "day"]


def test_wordbreak_unbreakable_raises():
    with pytest.raises(ValueError, match="no possible way"):
        wordbreak_tokenize("xyzzyqq", EN_DICT)


def test_load_freq_dict_bom_and_format():
    d = load_freq_dict(["﻿the 1000", "nice 30", "", "day 80"])
    assert d == {"the": 1000, "nice": 30, "day": 80}


CJK_DICT = {"你好": 50, "世界": 40, "你": 5, "好": 5, "世": 1, "界": 1}


def test_wordbreak_cjk_basic():
    assert wordbreak_cjk_tokenize("你好世界", CJK_DICT) == ["你好", "世界"]


def test_wordbreak_cjk_unknown_chars_fall_back_to_singles():
    out = wordbreak_cjk_tokenize("你好猫", CJK_DICT)
    assert out == ["你好", "猫"]


def test_wordbreak_udf(spark):
    df = spark.createDataFrame(
        [("anicedaytoday",), ("xyzzyqq",), (None,)], "text string"
    )
    udf = make_wordbreak_udf(EN_DICT)
    rows = df.select(udf("text").alias("toks")).collect()
    assert rows[0]["toks"] == ["nice", "day", "today"]
    assert rows[1]["toks"] is None  # unbreakable -> null
    assert rows[2]["toks"] == []


# ---------------------------------------------------------------------------
# PageRank vs numpy oracle
# ---------------------------------------------------------------------------


def numpy_pagerank(edges_pdf, n_nodes, num_iterations=100):
    """Independent restatement of IcsSearchEngine.computePageRank:96-134."""
    outdeg = np.zeros(n_nodes)
    for s in edges_pdf["src"]:
        outdeg[s] += 1
    x = np.ones(n_nodes)
    src = edges_pdf["src"].to_numpy()
    dst = edges_pdf["dst"].to_numpy()
    w = 1.0 / outdeg[src]
    for _ in range(num_iterations):
        nxt = np.full(n_nodes, BETA)
        np.add.at(nxt, dst, ALPHA * x[src] * w)
        if np.abs(nxt - x).sum() < TOL:
            x = nxt
            break
        x = nxt
    return x


def test_pagerank_matches_numpy_oracle(spark):
    n = 120
    pdf = graph_edges_pandas(n_nodes=n)
    nodes_in_graph = sorted(set(pdf["src"]) | set(pdf["dst"]))
    expect = numpy_pagerank(pdf, n, num_iterations=40)
    ranks = compute_pagerank(
        graph_edges_df(spark, n_nodes=n), num_iterations=40
    ).collect()
    got = {r["node"]: r["rank"] for r in ranks}
    assert set(got) == set(nodes_in_graph)
    for node in nodes_in_graph:
        assert got[node] == pytest.approx(expect[node], rel=1e-9)


def test_pagerank_early_stop_matches_reference_cadence(spark):
    """The reference checks L1 convergence EVERY iteration
    (IcsSearchEngine.java:118-134). Fixture: a graph whose numpy twin
    converges strictly before the iteration cap and at an iteration that
    the old every-5 cadence would have overshot — scores must still match
    to 1e-9, proving the Spark loop stops at the same iteration."""
    import pandas as pd

    # star + chain: converges fast (few iterations, diameter-bound mixing)
    edges = [(0, i) for i in range(1, 8)] + [(i, i + 1) for i in range(1, 7)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    n = 8
    # find numpy's stopping iteration
    stop_at = None
    x = np.ones(n)
    outdeg = np.zeros(n)
    for s in pdf["src"]:
        outdeg[s] += 1
    src, dst = pdf["src"].to_numpy(), pdf["dst"].to_numpy()
    w = 1.0 / outdeg[src]
    for it in range(100):
        nxt = np.full(n, BETA)
        np.add.at(nxt, dst, ALPHA * x[src] * w)
        done = np.abs(nxt - x).sum() < TOL
        x = nxt
        if done:
            stop_at = it + 1
            break
    assert stop_at is not None and stop_at < 100
    assert stop_at % 5 != 0, "fixture converges on the old cadence boundary"
    expect = numpy_pagerank(pdf, n, num_iterations=100)
    got = {
        r["node"]: r["rank"]
        for r in compute_pagerank(
            spark.createDataFrame(pdf), num_iterations=100
        ).collect()
    }
    for node in got:
        assert got[node] == pytest.approx(expect[node], rel=1e-9)


def test_pagerank_scores_sorted(spark):
    ranks = compute_pagerank(graph_edges_df(spark, n_nodes=60), num_iterations=15)
    rows = pagerank_scores(ranks).collect()
    vals = [r["rank"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_combined_rank(spark, tiny_corpus):
    from pyspark.sql import functions as F

    from searchengine_spark.graph import combined_rank
    from searchengine_spark.index import build_index

    idx = build_index(spark, tiny_corpus.select("doc_id", "text"), cache=False)
    # fake ranks keyed by doc_id: rank 1.0 for one known doc, 0 otherwise
    base = idx.search_tfidf("elizabeth darcy", 5).collect()
    assert base
    boosted_doc = base[-1]["doc_id"]
    ranks = spark.createDataFrame([(boosted_doc, 100.0)], "node string, rank double")
    out = combined_rank(idx, ranks, "elizabeth darcy", 5, pagerank_weight=1.0)
    assert out.collect()[0]["doc_id"] == boosted_doc


def test_combined_rank_non_identity_doc_node_mapping(spark, tiny_corpus):
    """Parity-deviation contract (see combined_rank docstring): the
    reference parses the graph node id from a doc's first text line; here
    the caller supplies ANY doc_id->node mapping by pre-joining. Exercise
    a genuinely non-identity mapping (integer node ids <-> string doc_ids)
    and check the boost lands on the mapped doc."""
    from pyspark.sql import functions as F

    from searchengine_spark.graph import combined_rank
    from searchengine_spark.index import build_index

    idx = build_index(spark, tiny_corpus.select("doc_id", "text"), cache=False)
    base = idx.search_tfidf("elizabeth darcy", 5).collect()
    assert len(base) >= 2
    boosted_doc = base[-1]["doc_id"]
    # graph space: integer node ids; mapping table doc_id <-> node
    mapping = spark.createDataFrame(
        [(r["doc_id"], 1000 + i) for i, r in enumerate(base)],
        "doc_id string, node int",
    )
    boosted_node = 1000 + len(base) - 1
    int_ranks = spark.createDataFrame(
        [(boosted_node, 100.0)], "node int, rank double"
    )
    # caller-side translation of graph ranks into doc_id space
    ranks = (
        int_ranks.join(mapping, "node")
        .select(F.col("doc_id").alias("node"), "rank")
    )
    out = combined_rank(idx, ranks, "elizabeth darcy", 5, pagerank_weight=1.0)
    assert out.collect()[0]["doc_id"] == boosted_doc


def test_personalized_pagerank_matches_numpy_and_localizes(spark):
    """PPR vs a dense numpy power iteration of x <- alpha*W'x + p; and the
    qualitative seed-locality property: mass concentrates near the seeds
    (seed ranks dominate a uniformly-random non-seed's)."""
    import numpy as np

    from searchengine_spark.fixtures import graph_edges_pandas
    from searchengine_spark.graph import personalized_pagerank
    from searchengine_spark.graph.pagerank import ALPHA

    pdf = graph_edges_pandas(n_nodes=120)
    edges = spark.createDataFrame(pdf)
    seeds = [3, 11]
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            edges, seeds, num_iterations=30, tol=0.0
        ).collect()
    }

    nodes = sorted(set(pdf["src"]) | set(pdf["dst"]))
    ix = {n: i for i, n in enumerate(nodes)}
    W = np.zeros((len(nodes), len(nodes)))
    outdeg = pdf.groupby("src").size().to_dict()
    for s, d in zip(pdf["src"], pdf["dst"]):
        W[ix[d], ix[s]] += 1.0 / outdeg[s]
    p = np.zeros(len(nodes))
    for s in seeds:
        p[ix[s]] = (1.0 - ALPHA) / len(seeds)
    x = p.copy()
    for _ in range(30):
        x = ALPHA * (W @ x) + p
    for n in nodes:
        assert got[n] == pytest.approx(x[ix[n]], rel=0, abs=1e-9), n
    # locality: every seed outranks the median non-seed by a wide margin
    non_seed = sorted(v for k, v in got.items() if k not in seeds)
    med = non_seed[len(non_seed) // 2]
    for s in seeds:
        assert got[s] > 10 * max(med, 1e-12)


def test_personalized_pagerank_isolated_seed_keeps_mass(spark):
    """A seed absent from the edge list still appears in the result with
    its full teleport share (no silently-vanishing personalization mass),
    and total teleport injected per iteration is exactly (1 - alpha)."""
    from searchengine_spark.graph import personalized_pagerank
    from searchengine_spark.graph.pagerank import ALPHA

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            edges, [1, 999], num_iterations=5, tol=0.0
        ).collect()
    }
    share = (1.0 - ALPHA) / 2
    assert got[999] == pytest.approx(share)  # isolated: teleport only
    assert 1 in got and got[1] >= share


def test_pagerank_driver_and_distributed_paths_agree(spark):
    """The numpy driver fast path and the distributed loop must agree to
    float tolerance for BOTH global and personalized PageRank (including
    early-stop cadence with tol enabled)."""
    from searchengine_spark.fixtures import graph_edges_df
    from searchengine_spark.graph import compute_pagerank, personalized_pagerank

    edges = graph_edges_df(spark, n_nodes=80)
    for tol in (0.0, 1e-5):
        drv = {r["node"]: r["rank"] for r in
               compute_pagerank(edges, 25, tol=tol).collect()}
        dist = {r["node"]: r["rank"] for r in
                compute_pagerank(edges, 25, tol=tol, driver_max_graph=0).collect()}
        assert drv.keys() == dist.keys()
        for n in drv:
            assert drv[n] == pytest.approx(dist[n], rel=0, abs=1e-9), (tol, n)
    drv = {r["node"]: r["rank"] for r in
           personalized_pagerank(edges, [1, 5], 25, tol=0.0).collect()}
    dist = {r["node"]: r["rank"] for r in
            personalized_pagerank(edges, [1, 5], 25, tol=0.0,
                                  driver_max_graph=0).collect()}
    for n in drv:
        assert drv[n] == pytest.approx(dist[n], rel=0, abs=1e-9), n
