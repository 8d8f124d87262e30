"""k-core subgraph extraction (iterative peeling).

Graph-side corpus curation: the k-core is the maximal subgraph in which
every node keeps degree >= k — the standard "densely linked" filter for
link-graph quality propagation (drop leaf chains and sparsely connected
spam tendrils before PageRank-style scoring). Companion to
graph/pagerank.py / triangles.py over the same edge-list source.

Algorithm: repeatedly delete nodes of degree < k until none remain. Each
round is one degree aggregate + one semi-join edge filter — fully
distributed, no windows, no driver state beyond the loop counter and a
convergence count. The loop is a DataFrame iteration, so each round
localCheckpoints the surviving edge set (CLAUDE.md invariant: iterative
frames referenced twice per round double the logical plan otherwise) —
peeling terminates in at most |V| rounds, in practice O(diameter)-ish.

Determinism: the k-core is UNIQUE (deletion order never changes the fixed
point — peeling is a confluent/monotone process), so any engine computing
the same definition gets the same node set; the oracle replays peeling
as unrolled rounds and a test asserts the unroll depth sufficed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _canonical_edges


def kcore_nodes(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Nodes of the k-core of the undirected simple graph of ``edges``
    (columns src, dst; self-loops dropped, duplicates collapsed).

    Returns ``(node: long, deg: long)`` — the node's degree WITHIN the
    core. Empty when the k-core is empty. Raises if ``max_rounds`` is hit
    before the fixed point (peeling needs at most one round per deleted
    node; 100 covers any real corpus round count by orders of magnitude).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = _canonical_edges(edges).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        low = deg.where(F.col("deg") < k)
        n_low = low.count()
        if n_low == 0:
            return deg.select(
                F.col("node").cast("long").alias("node"),
                F.col("deg").cast("long").alias("deg"),
            )
        keep = deg.where(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(
                keep.withColumnRenamed("node", "a"), "a", "left_semi"
            ).join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
        ).localCheckpoint(eager=True)
        cur = nxt
    raise RuntimeError(
        f"k-core peeling did not converge within {max_rounds} rounds"
    )


def py_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Pure-python twin (differential-test reference): node -> in-core
    degree."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items()}
