"""Label-propagation community detection (synchronous, deterministic).

Graph-side corpus curation's clustering step: group link-graph nodes into
communities by iteratively adopting the most frequent label among
neighbors (Raghavan et al. 2007, LPA). Communities feed per-cluster
sampling quotas, link-farm detection (one community = one spam farm), and
representative selection — the graph analogue of the text-side dedup
clusters. Companion to pagerank.py / kcore.py / bfs.py over the same
edge-list source.

Determinism (the property everything else here is built around): classic
LPA is order-dependent; this implementation pins every choice —

- labels start as the node id;
- updates are SYNCHRONOUS (round r+1 sees only round r's labels);
- each node adopts the label with the highest neighbor count, ties broken
  by SMALLEST label (a total order, engine-independent);
- a FIXED iteration count (no data-dependent stop), so the unrolled
  DuckDB oracle replays the exact same rounds.

Synchronous LPA can oscillate on bipartite structures instead of
converging — with a fixed round count both engines land on the same
side of any oscillation, which is exactly what the driver contract needs
(and why there is no early-stop flag).

Plan shape per round: one edges-x-labels hash equi-join (symmetric
adjacency), one (node, label) count aggregate, one argmax-by-struct-max
per node — all combinable aggregates, no windows, no driver state.
Iterative-frame invariant (CLAUDE.md): the labels frame is referenced
twice per round, so each round localCheckpoints it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _canonical_edges


def label_propagation(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """Community labels after ``n_iter`` synchronous LPA rounds over the
    undirected simple graph of ``edges`` (columns src, dst; self-loops
    dropped, duplicates collapsed).

    Returns ``(node: long, label: long)`` for every node with at least one
    edge. The label is the smallest node id of the community's eventual
    attractor under (count desc, label asc) adoption.
    """
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    und = _canonical_edges(edges)
    adj = und.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
    adj = adj.persist()
    try:
        labels = (
            adj.select(F.col("u").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint(eager=True)
        )
        for _ in range(n_iter):
            votes = (
                adj.join(
                    labels.withColumnRenamed("node", "v"), "v"
                )
                .groupBy(F.col("u").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # argmax by (cnt desc, label asc): lexicographic struct max on
            # (cnt, -label) — labels are node ids >= 0, so negation flips
            # the order without losing ties (the driver-contract
            # deterministic-cut idiom, no window needed)
            labels = (
                votes.groupBy("node")
                .agg(
                    F.max(
                        F.struct(
                            F.col("cnt"),
                            (-F.col("label")).alias("neg"),
                        )
                    ).alias("m")
                )
                .select("node", (-F.col("m.neg")).alias("label"))
                .localCheckpoint(eager=True)
            )
        return labels.select(
            F.col("node").cast("long").alias("node"),
            F.col("label").cast("long").alias("label"),
        )
    finally:
        adj.unpersist()


def py_label_propagation(
    edges: list[tuple[int, int]], n_iter: int = 5
) -> dict[int, int]:
    """Pure-python twin (differential-test reference): node -> label."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, ns in adj.items():
            counts: dict[int, int] = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            # max count, then smallest label
            new[n] = min(
                (lbl for lbl, c in counts.items()
                 if c == max(counts.values()))
            )
        labels = new
    return labels
