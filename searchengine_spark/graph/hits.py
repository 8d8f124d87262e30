"""HITS — hubs & authorities (Kleinberg, JACM 1999).

The classic link-analysis companion to PageRank (R1): the reference's
ranking surface stops at PageRank + combined rank
(``IcsSearchEngine.java:96-168``); HITS adds the query-independent
hub/authority decomposition over the SAME edge frame.

Recurrence, ``num_iterations`` rounds from h₀ = 1 on every node::

    a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u)   then L2-normalize a_k
    h_k(u) = Σ_{(u,v)∈E} a_k(v)       then L2-normalize h_k

Per-round L2 normalization keeps values bounded (the raw recurrence
grows geometrically with the principal eigenvalue and would overflow
float64 long before convergence); fixed iteration counts keep the DuckDB
oracle twin (unrolled CTEs) iteration-for-iteration identical.

Spark shape: one iteration = two (edges ⋈ scores) shuffle-aggregates;
each half-step localCheckpoints (lineage truncation — the iterative-loop
OOM rule in CLAUDE.md) and collects ONE scalar (the L2 norm) — the same
O(1)-per-round driver collect as PageRank's convergence diff. The
adaptive driver fast path mirrors ``pagerank._iterate_ranks``: graphs
under ``driver_max_graph`` nodes+edges run the identical recurrence in
numpy (40 distributed rounds on a 200-node fixture are pure fixed job
overhead); ``driver_max_graph=0`` forces the distributed loop, and a
path-equivalence test pins the two to 1e-9.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _DRIVER_MAX_GRAPH, _collect_small_graph, _node_universe

HITS_ITERS = 20


def _numpy_hits(edge_rows, node_ids, num_iterations):
    """Driver-side twin: same recurrence, same normalization cadence."""
    import numpy as np

    ix = {n: i for i, n in enumerate(node_ids)}
    si = np.array([ix[s] for s, _ in edge_rows], dtype=np.int64)
    di = np.array([ix[d] for _, d in edge_rows], dtype=np.int64)
    n = len(node_ids)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(num_iterations):
        a = np.zeros(n)
        np.add.at(a, di, h[si])
        na = math.sqrt(float((a * a).sum()))
        if na > 0:
            a = a / na
        h = np.zeros(n)
        np.add.at(h, si, a[di])
        nh = math.sqrt(float((h * h).sum()))
        if nh > 0:
            h = h / nh
    return a, h


def compute_hits(
    edges: DataFrame,
    num_iterations: int = HITS_ITERS,
    nodes: DataFrame | None = None,
    driver_max_graph: int = _DRIVER_MAX_GRAPH,
) -> DataFrame:
    """Returns (node, authority, hub), deterministic given the edges.

    ``nodes`` augments the edge-derived universe (isolated vertices score
    0 in both roles). Edge multiplicity counts — a duplicated edge
    contributes twice, exactly as in the summation definition; callers
    wanting simple-graph semantics distinct() their edges first.
    """
    universe = _node_universe(edges, nodes)
    small = _collect_small_graph(edges, universe, driver_max_graph)
    if small is not None:
        node_ids, edge_rows = small
        a, h = _numpy_hits(edge_rows, node_ids, num_iterations)
        return edges.sparkSession.createDataFrame(
            [(n, float(av), float(hv)) for n, av, hv in zip(node_ids, a, h)],
            universe.select("node")
            .schema.add("authority", "double")
            .add("hub", "double"),
        )

    nodes_df = universe.select("node").persist()
    edg = edges.select("src", "dst").persist()
    edg.count()

    def half_step(scores: DataFrame, join_key: str, out_key: str) -> DataFrame:
        """out(x) = Σ over edges e with e[join_key] = scored node of
        score; grouped by e[out_key]; L2-normalized. One shuffle + one
        O(1) scalar collect."""
        raw = (
            edg.join(scores, edg[join_key] == scores["node"])
            .select(F.col(out_key).alias("n2"), "v")
            .groupBy(F.col("n2").alias("node"))
            .agg(F.sum("v").alias("v"))
        )
        full = (
            nodes_df.join(raw, "node", "left")
            .select("node", F.coalesce("v", F.lit(0.0)).alias("v"))
            .localCheckpoint(eager=True)
        )
        norm = full.agg(F.sum(F.col("v") * F.col("v")).alias("s")).collect()[
            0
        ]["s"]
        norm = math.sqrt(float(norm or 0.0))
        if norm == 0.0:
            return full
        return full.select("node", (F.col("v") / F.lit(norm)).alias("v"))

    h = nodes_df.withColumn("v", F.lit(1.0))
    a = nodes_df.withColumn("v", F.lit(0.0))
    for _ in range(num_iterations):
        a = half_step(h, "src", "dst")  # authority: sum of in-hubs
        h = half_step(a, "dst", "src")  # hub: sum of out-authorities
    out = (
        a.withColumnRenamed("v", "authority")
        .join(h.withColumnRenamed("v", "hub"), "node")
        .select("node", "authority", "hub")
    )
    nodes_df.unpersist()
    edg.unpersist()
    return out
