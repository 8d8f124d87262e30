"""Multi-source BFS hop distance (seed-distance corpus curation).

Web-corpus curation's "distance from trusted seeds" signal (the link-graph
analogue of Common Crawl seed lists / harmonic-centrality gating): every
page's minimum hop count from a whitelisted seed set, pages beyond a
radius dropped as link spam. Companion to graph/pagerank.py / kcore.py /
triangles.py over the same edge-list source (the reference's id-graph.tsv
role, ``IcsSearchEngine.java`` graph load — see graph/pagerank.py parity
notes).

Algorithm: level-synchronous frontier BFS on the undirected simple graph.
Round r joins the current frontier against the edge list, anti-joins the
already-visited set, and unions the fresh nodes in at distance r+1 — one
equi-join + one anti-join per round, fully distributed, no windows, no
driver-side adjacency. The frontier (not the visited set) drives the join,
so each round's shuffle is proportional to the frontier's edge
neighborhood, not the graph.

Iterative-frame invariant (CLAUDE.md): both ``visited`` and ``frontier``
are referenced in later rounds, so each is localCheckpoint'ed per round —
without lineage truncation the logical plan doubles per hop and planning
OOMs long before data does.

Determinism: hop distance is a unique fixed point (min over paths), so any
engine computing the same definition agrees exactly; the DuckDB oracle
unrolls the same frontier recurrence as materialized CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _canonical_edges


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 20,
) -> DataFrame:
    """Minimum hop count from any node in ``sources`` over the undirected
    simple graph of ``edges`` (columns src, dst; self-loops dropped,
    duplicates collapsed).

    Returns ``(node: long, dist: long)`` for every node within
    ``max_hops`` of a seed (unreached nodes are absent — at corpus scale
    the unreached set is the complement and would dwarf the result).
    Seeds appear with dist 0 even when isolated. Stops early once a round
    adds no new nodes.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    und = _canonical_edges(edges)
    # symmetric adjacency view: one row per directed traversal direction
    adj = und.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
    adj = adj.persist()
    try:
        frontier = spark.createDataFrame(
            [(int(s),) for s in sorted(set(sources))], "node long"
        ).localCheckpoint(eager=True)
        visited = frontier.select(
            "node", F.lit(0).cast("long").alias("dist")
        ).localCheckpoint(eager=True)
        for hop in range(1, max_hops + 1):
            nxt = (
                adj.join(
                    frontier.withColumnRenamed("node", "u"), "u"
                )
                .select(F.col("v").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            frontier = nxt
            visited = visited.unionAll(
                nxt.select("node", F.lit(hop).cast("long").alias("dist"))
            ).localCheckpoint(eager=True)
        return visited.select(
            F.col("node").cast("long").alias("node"), "dist"
        )
    finally:
        adj.unpersist()


def py_bfs(
    edges: list[tuple[int, int]], sources: list[int], max_hops: int = 20
) -> dict[int, int]:
    """Pure-python twin (differential-test reference): node -> min hops."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dist = {int(s): 0 for s in sources}
    frontier = set(dist)
    for hop in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = hop
        if not nxt:
            break
        frontier = nxt
    return dist
