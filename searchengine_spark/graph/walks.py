"""Deterministic random walks (node2vec/DeepWalk corpus generation).

Graph-embedding training data: fixed-length walks from every node, later
fed to a skip-gram/BPE-style pipeline the same way text windows are. The
walk corpus is the graph analogue of the text side's training exports
(triplets, packed sequences) — at 10^12 edges the walk table IS the
training set.

Determinism (the property that makes the walks oracle-checkable AND
reproducible across cluster runs): the "random" next-step choice is a
seeded hash, not an RNG —

    idx(step) = md5_48(walk_id | current_node | step | seed) mod degree

over the node's rank-ordered neighbor list (ranks assigned by neighbor id
order, a total order). The 48-bit md5-prefix integer is the repo's
cross-engine-identical hash (same construction as textops.sketches /
dsir); DuckDB replays every step bit-for-bit. Re-running the job — any
partitioning, any cluster size — emits the identical corpus.

Plan shape: the adjacency list gets per-node neighbor ranks once (ONE
window over the symmetric edge list, partitioned by node — bounded by
max degree per partition group) plus the DESTINATION node's degree, so
each walk row always carries the degree of the node it sits on. Every
walk step is then exactly ONE equi-join on (node, chosen_rank): the pick
is computed walk-side from the carried degree, so the join emits one row
per walk — never the degree-expanded neighbor set. No windows in the
loop, no collects; walk rows stay (n_nodes × walks_per_node) wide
throughout. Iterative-frame invariant (CLAUDE.md): the walk frame is
extended per step, so each step localCheckpoints it.

In the symmetric adjacency of a simple undirected graph every present
node has degree >= 1, so walks never dead-end; isolated nodes have no
edges, never enter the adjacency, and start no walks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .triangles import _canonical_edges


def _md5_48(col) -> F.Column:
    """48-bit integer from the md5 hex prefix — cross-engine-identical
    (DuckDB twin: ``('0x' || substr(md5(x), 1, 12))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _walk_key(walk_col, node_col, step: int, seed: int) -> F.Column:
    return F.concat_ws(
        "|",
        walk_col.cast("string"),
        node_col.cast("string"),
        F.lit(str(step)),
        F.lit(str(seed)),
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-length walks over the undirected simple graph of
    ``edges`` (columns src, dst). Returns one row per visited position:
    ``(walk_id: long, start: long, pos: int, node: long)`` with pos 0 at
    the start node; ``walk_id = start * walks_per_node + replica``.
    """
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    und = _canonical_edges(edges)
    sym = und.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
    # rank-ordered neighbor list + per-node degree: ONE window by node
    w = Window.partitionBy("u").orderBy("v")
    ranked = sym.select(
        "u",
        "v",
        (F.row_number().over(w) - 1).alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy("u")).alias("deg"),
    )
    # attach the DESTINATION degree so each hop's output row already
    # carries what the next pick needs — keeps the loop to one join/step
    degrees = ranked.select(
        F.col("u").alias("v"), F.col("deg").alias("v_deg")
    ).distinct()
    adj = ranked.join(degrees, "v").persist()
    try:
        starts = adj.select(
            F.col("u").alias("start"), F.col("deg")
        ).distinct()
        cur = starts.select(
            "start",
            "deg",
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1))
            ).alias("replica"),
        ).select(
            (F.col("start") * walks_per_node + F.col("replica")).alias(
                "walk_id"
            ),
            "start",
            F.col("start").alias("node"),
            "deg",
        ).localCheckpoint(eager=True)
        out = cur.select(
            "walk_id", "start", F.lit(0).cast("int").alias("pos"), "node"
        )
        for step in range(1, walk_length):
            pick = F.pmod(
                _md5_48(_walk_key(F.col("walk_id"), F.col("node"), step, seed)),
                F.col("deg"),
            )
            hop = (
                cur.withColumn("rank", pick)
                .join(
                    adj.withColumnRenamed("u", "node"),
                    ["node", "rank"],
                )
                .select(
                    "walk_id",
                    "start",
                    F.col("v").alias("node"),
                    F.col("v_deg").alias("deg"),
                )
                .localCheckpoint(eager=True)
            )
            out = out.unionAll(
                hop.select(
                    "walk_id",
                    "start",
                    F.lit(step).cast("int").alias("pos"),
                    "node",
                )
            )
            cur = hop
        return out.select(
            F.col("walk_id").cast("long").alias("walk_id"),
            F.col("start").cast("long").alias("start"),
            "pos",
            F.col("node").cast("long").alias("node"),
        )
    finally:
        adj.unpersist()


def py_random_walks(
    edges: list[tuple[int, int]],
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 42,
) -> dict[tuple[int, int], int]:
    """Pure-python twin: {(walk_id, pos): node}."""
    import hashlib

    adj: dict[int, list[int]] = {}
    und = set()
    for s, d in edges:
        if s == d:
            continue
        und.add((min(s, d), max(s, d)))
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for n in adj:
        adj[n].sort()
    out = {}
    for start in adj:
        for rep in range(walks_per_node):
            wid = start * walks_per_node + rep
            node = start
            out[(wid, 0)] = node
            for step in range(1, walk_length):
                ns = adj[node]
                key = f"{wid}|{node}|{step}|{seed}".encode()
                idx = int(hashlib.md5(key).hexdigest()[:12], 16) % len(ns)
                node = ns[idx]
                out[(wid, step)] = node
    return out
