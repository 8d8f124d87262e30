"""PageRank + combined ranking (reference Project 4).

Parity source ``search/IcsSearchEngine.java``:

- edge list parsed from a TSV of (src, dst) pairs (``:77-92``; S9),
- column weights 1/outdeg, dangling nodes contribute 0 (``:96-106``),
- **x initialized to 1.0 — NOT 1/N** (``:110``), damping α=0.85 with a
  constant β=0.15 added to every node each iteration (``:111-117``),
- iterate ``x ← αAx + β·1`` up to ``num_iterations``, early-stopping when
  the L1 diff drops below 1e-5 (``:118-134``),
- score dump sorted descending (``getPageRankScores:157-168``; R2),
- combined rank = tfidf + weight · pagerank, sort desc, truncate
  (``searchQuery:188-218``; R3).

Spark shape: ranks live in a DataFrame keyed by node; one iteration is an
(edges ⋈ ranks) shuffle + groupBy(dst) sum. ``localCheckpoint`` every few
iterations truncates the lineage chain (an iterative plan otherwise grows
unboundedly). The node universe is taken from the edges (plus an optional
nodes frame for isolated vertices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALPHA = 0.85  # IcsSearchEngine.java:111
BETA = 0.15
TOL = 1e-5  # :131-133


def read_edge_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S9: parse an id-graph TSV into an edges frame (src, dst)."""
    return (
        spark.read.option("sep", "\t")
        .csv(path)
        .toDF("src", "dst")
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )


def _numpy_iterate(
    edge_rows, node_ids, init, add, num_iterations, alpha, tol
):
    """Driver-side twin of the distributed loop: same recurrence, same
    per-iteration L1 early-stop cadence, numpy float64 accumulation.
    Used below the driver_max_nodes/edges thresholds (the adaptive
    fast-path pattern shared with connected_components and bpe_train)."""
    import numpy as np

    ix = {n: i for i, n in enumerate(node_ids)}
    outdeg: dict = {}
    for s, _ in edge_rows:
        outdeg[s] = outdeg.get(s, 0) + 1
    si = np.array([ix[s] for s, _ in edge_rows], dtype=np.int64)
    di = np.array([ix[d] for _, d in edge_rows], dtype=np.int64)
    w = np.array([1.0 / outdeg[s] for s, _ in edge_rows])
    x = init.copy()
    for _ in range(num_iterations):
        inflow = np.zeros(len(node_ids))
        np.add.at(inflow, di, x[si] * w)
        new = alpha * inflow + add
        if tol > 0 and np.abs(new - x).sum() < tol:
            x = new
            break
        x = new
    return x


_DRIVER_MAX_GRAPH = 200_000  # nodes+edges bound for the driver fast path


def _collect_small_graph(edges: DataFrame, universe: DataFrame, cap: int):
    """(sorted node_ids, edge_rows) when the graph fits under ``cap``
    nodes+edges, else None — the shared gate of the adaptive driver fast
    path (PageRank/PPR here, HITS in hits.py). The limit(cap+1) collects
    bound driver memory: an over-cap graph ships at most cap+1 rows."""
    if cap <= 0:
        return None
    head = universe.select("node").limit(cap + 1).collect()
    if len(head) > cap:
        return None
    edge_head = edges.select("src", "dst").limit(cap + 1).collect()
    if len(head) + len(edge_head) > cap:
        return None
    return (
        sorted(r["node"] for r in head),
        [(r["src"], r["dst"]) for r in edge_head],
    )


def _iterate_ranks(
    edges: DataFrame,
    nodes: DataFrame,
    init_col,
    additive_col,
    num_iterations: int,
    alpha: float,
    tol: float,
    init_add_py=None,
    driver_max_graph: int = _DRIVER_MAX_GRAPH,
) -> DataFrame:
    """Shared power-iteration core: x <- alpha * W'x + additive, x0 = init.

    ``nodes`` is the FULL node universe (caller-resolved); ``init_col`` /
    ``additive_col`` are Column expressions over ``node``. Everything
    load-bearing lives here once: outdeg weighting, per-iteration
    localCheckpoint (lineage truncation — OOM-critical, CLAUDE.md), the
    per-iteration L1 early stop (skipped entirely when tol <= 0), and the
    persist/unpersist lifecycle.

    Adaptive execution: when the caller supplies ``init_add_py`` — a
    python fn node_id -> (init, additive) mirroring the Columns — and the
    graph fits under ``driver_max_graph`` nodes+edges, the loop runs
    driver-side in numpy (40 distributed rounds on a small graph are pure
    fixed job overhead). ``driver_max_graph=0`` forces the distributed
    loop; path equivalence is pinned by the numpy-oracle tests.
    """
    if init_add_py is not None:
        small = _collect_small_graph(edges, nodes, driver_max_graph)
        if small is not None:
            import numpy as np

            node_ids, edge_rows = small
            init = np.array([init_add_py(n)[0] for n in node_ids])
            add = np.array([init_add_py(n)[1] for n in node_ids])
            x = _numpy_iterate(
                edge_rows, node_ids, init, add, num_iterations, alpha, tol,
            )
            return edges.sparkSession.createDataFrame(
                [(n, float(v)) for n, v in zip(node_ids, x)],
                nodes.select("node").schema.add("rank", "double"),
            )
    nodes = nodes.select("node").persist()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # weight of each edge = 1/outdeg(src); dangling nodes have no edges, so
    # they simply contribute nothing (reference zero-columns, :96-106)
    weighted = (
        edges.join(outdeg, edges["src"] == outdeg["node"])
        .select("src", "dst", (1.0 / F.col("outdeg")).alias("w"))
        .persist()
    )
    weighted.count()

    ranks = nodes.withColumn("rank", init_col)
    for _ in range(num_iterations):
        contrib = (
            weighted.join(ranks, weighted["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    alpha * F.coalesce(F.col("inflow"), F.lit(0.0))
                    + additive_col
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol > 0:
            diff = (
                new_ranks.withColumnRenamed("rank", "r2")
                .join(ranks, "node")
                .agg(F.sum(F.abs(F.col("r2") - F.col("rank"))).alias("d"))
                .collect()[0]["d"]
            )
            if diff is not None and diff < tol:
                ranks = new_ranks
                break
        ranks = new_ranks
    nodes.unpersist()
    weighted.unpersist()
    return ranks


def _node_universe(edges: DataFrame, nodes: DataFrame | None) -> DataFrame:
    edge_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if nodes is None:
        return edge_nodes
    # the caller's frame AUGMENTS the edge-derived universe (isolated
    # vertices); replacing it would silently drop every connected node's
    # inflow
    return nodes.select("node").unionByName(edge_nodes).distinct()


def compute_pagerank(
    edges: DataFrame,
    num_iterations: int = 100,
    nodes: DataFrame | None = None,
    alpha: float = ALPHA,
    beta: float = BETA,
    tol: float = TOL,
    driver_max_graph: int = _DRIVER_MAX_GRAPH,
) -> DataFrame:
    """Returns (node, rank). Deterministic given the same edges.

    The L1 convergence test runs EVERY iteration, matching the reference's
    per-iteration check (``IcsSearchEngine.java:118-134``) — a graph that
    converges at iteration k stops at exactly k, never overshooting. With
    ``tol <= 0`` (fixed-iteration mode, e.g. the driver's 40-iteration
    oracle twins) the diff check is skipped entirely. Iteration machinery
    lives in the shared ``_iterate_ranks`` core.
    """
    return _iterate_ranks(
        edges,
        _node_universe(edges, nodes),
        F.lit(1.0),  # x0 = 1.0, NOT 1/N (:110)
        F.lit(beta),
        num_iterations,
        alpha,
        tol,
        init_add_py=lambda n: (1.0, beta),
        driver_max_graph=driver_max_graph,
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    num_iterations: int = 40,
    nodes: DataFrame | None = None,
    alpha: float = ALPHA,
    tol: float = TOL,
    driver_max_graph: int = _DRIVER_MAX_GRAPH,
) -> DataFrame:
    """Personalized (seed-teleport) PageRank: x <- alpha*W'x + p with the
    teleport vector p uniform over ``seeds`` and zero elsewhere, x0 = p.
    Ranks measure proximity to the seed set — the graph-curation variant
    (seed-quality propagation a la Common Crawl / harmonic centrality
    filtering) of the reference's global PageRank (R1), sharing its
    iteration core (``_iterate_ranks``).

    ``seeds`` is a small driver-side list (the personalization set); seed
    ids are UNIONED into the node universe, so a seed absent from the
    edge list still carries its teleport share (isolated-seed mass is
    never silently dropped). Deterministic for a fixed graph + seed set,
    replayed exactly by the DuckDB oracle's unrolled iteration CTEs.
    """
    seed_set = sorted(set(seeds))
    if not seed_set:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    tele_mass = (1.0 - alpha) / len(seed_set)
    tele = F.when(F.col("node").isin(seed_set), F.lit(tele_mass)).otherwise(
        F.lit(0.0)
    )
    seed_df = edges.sparkSession.createDataFrame(
        [(s,) for s in seed_set], edges.select(F.col("src").alias("node")).schema
    )
    universe = _node_universe(edges, nodes).unionByName(seed_df).distinct()
    seed_lookup = set(seed_set)

    def _py(n):
        m = tele_mass if n in seed_lookup else 0.0
        return (m, m)

    return _iterate_ranks(
        edges, universe, tele, tele, num_iterations, alpha, tol,
        init_add_py=_py, driver_max_graph=driver_max_graph,
    )


def pagerank_scores(ranks: DataFrame) -> DataFrame:
    """R2: all (node, rank) sorted descending, node asc tie-break."""
    return ranks.orderBy(F.desc("rank"), F.asc("node"))


def combined_rank(
    index,
    ranks: DataFrame,
    query: str,
    top_k: int,
    pagerank_weight: float,
    doc_node_col: str = "node",
) -> DataFrame:
    """R3: tfidf over ALL matching docs (reference passes topK=null,
    ``IcsSearchEngine.java:195``), plus weight x pagerank, desc, truncate.
    ``ranks.node`` must join the index's doc_id space (caller maps doc ids
    to graph nodes before passing). ``top_k=None`` returns the full ranked
    frame (callers applying their own boundary cut).

    PARITY DEVIATION (deliberate): the reference derives each document's
    graph-node id by parsing the FIRST LINE of the document's text
    (``IcsSearchEngine.java:195-198`` — ``Integer.parseInt`` on line 1).
    That couples ranking to a corpus-layout convention; here the caller
    supplies the doc_id->node mapping explicitly by renaming/joining
    ``ranks`` (any mapping, not just identity — see
    ``tests/test_wordbreak_pagerank.py`` non-identity mapping test). To reproduce the
    reference exactly, pre-extract line 1 of each doc into ``node`` and
    pass that frame as ``ranks``."""
    tfidf = index.search_tfidf(query, None)
    joined = tfidf.join(
        ranks.select(F.col(doc_node_col).alias("doc_id"), "rank"),
        "doc_id",
        "left",
    )
    out = (
        joined.select(
            "doc_id",
            (
                F.col("score")
                + pagerank_weight * F.coalesce(F.col("rank"), F.lit(0.0))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return out.limit(top_k) if top_k is not None else out
