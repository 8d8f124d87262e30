"""Neighborhood-based link prediction (common neighbors / Jaccard /
Adamic-Adar).

The classic "which edges are missing" companion to the PageRank/HITS/
triangle stages over the same edge-list source (the reference's graph
stage stops at PageRank — ``IcsSearchEngine.java``'s rank pipeline; this
extends it with the standard Liben-Nowell & Kleinberg (2003) predictors,
the graph-curation step that proposes crawl frontier / citation-repair
candidates at corpus scale).

Scale shape: the only superlinear step is the wedge self-join on the
center node — a center of degree d emits C(d, 2) candidate pairs, so hot
hubs are the skew killer exactly as in triangle counting. Unlike
triangles, Adamic-Adar genuinely needs EVERY common neighbor of a pair,
so degree orientation can't bound the join; the standard scale lever is
``max_center_degree``: centers above the cap are dropped from wedge
GENERATION (their AA weight 1/ln(deg) is the smallest possible and they
connect everything to everything — at web scale a celebrity node
contributes ~0 signal and ~n^2 pairs). The cap is a documented recall
trade, default off; everything else is equi-joins and one combinable
aggregate per pair — no windows, no collects beyond one max-degree
scalar, no per-row Python.

Determinism: AA weights are looked up from an integer micro-nat table
(``adamic_adar_weights`` — ``round(1e6 / ln(deg))`` computed ONCE in
Python and broadcast), so per-pair scores are exact integer sums:
order-free under any partitioning and bit-identical to the DuckDB twin
that inlines the same table (the DSIR integer-micro-nat idiom; Java and
C libm may legitimately differ by 1 ulp on ``log``, so the float is never
computed engine-side)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _canonical_edges

AA_SCALE = 1_000_000  # micro-nats: round(AA_SCALE / ln(deg)) per neighbor


def adamic_adar_weights(max_degree: int, scale: int = AA_SCALE) -> list[tuple[int, int]]:
    """(deg, weight) rows for deg in [2, max_degree]: the integer
    micro-nat AA contribution of a shared neighbor of that degree.
    Degree-1 nodes cannot be wedge centers (a wedge needs two
    neighbors), so ln(deg) >= ln 2 > 0 always."""
    return [(d, round(scale / math.log(d))) for d in range(2, max_degree + 1)]


def link_prediction(
    edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Score every NON-adjacent node pair with >= min_common shared
    neighbors: (u, v, cn, aa_u, jacc_r) with u < v.

    cn = common-neighbor count; aa_u = Adamic-Adar in integer micro-nats
    (sum over shared neighbors w of round(1e6/ln(deg(w))) — exact,
    order-free); jacc_r = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| rounded to 6dp.
    Pairs already connected by an edge are anti-joined out (this predicts
    NEW links). Directed input is canonicalized to the undirected simple
    graph first (self-loops dropped, duplicates/reversals collapsed).
    """
    can = _canonical_edges(edges)
    adj = can.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        can.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    # One O(1) scalar collect to size the weight table (or use the cap).
    if max_center_degree is not None:
        max_deg = max_center_degree
    else:
        max_deg = deg.agg(F.max("deg")).collect()[0][0] or 2
    spark = edges.sparkSession
    weights = spark.createDataFrame(
        adamic_adar_weights(int(max_deg)), schema="deg int, w_aa long"
    )

    centers = adj.join(deg, "node")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)
    centers = centers.join(
        F.broadcast(weights), centers["deg"] == weights["deg"]
    ).select("node", "nbr", "w_aa")

    left = centers.select(
        F.col("node").alias("w"), F.col("nbr").alias("u"), "w_aa"
    )
    right = centers.select(F.col("node").alias("w"), F.col("nbr").alias("v"))
    pairs = (
        left.join(right, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("w_aa").alias("aa_u"),
        )
        .where(F.col("cn") >= min_common)
    )
    # predict NEW links only: drop pairs that are already edges
    pairs = pairs.join(
        can,
        (pairs["u"] == can["a"]) & (pairs["v"] == can["b"]),
        "left_anti",
    )
    deg_u = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    deg_v = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    return (
        pairs.join(deg_u, "u")
        .join(deg_v, "v")
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("cn").cast("long").alias("cn"),
            F.col("aa_u").cast("long").alias("aa_u"),
            F.round(
                F.col("cn")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
                6,
            ).alias("jacc_r"),
        )
    )


def py_link_prediction(
    edges: list[tuple[int, int]],
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> dict[tuple[int, int], tuple[int, int, float]]:
    """Pure-Python twin (differential-test oracle): (u, v) ->
    (cn, aa_u, jacc)."""
    can = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs: dict[int, set[int]] = {}
    for a, b in can:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    wtab = dict(adamic_adar_weights(max(len(v) for v in nbrs.values()) if nbrs else 2))
    out: dict[tuple[int, int], tuple[int, int, float]] = {}
    for w, ns in nbrs.items():
        if max_center_degree is not None and len(ns) > max_center_degree:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                cn, aa = out.get((u, v), (0, 0, 0.0))[:2]
                out[(u, v)] = (cn + 1, aa + wtab[len(ns)], 0.0)
    final = {}
    for (u, v), (cn, aa, _) in out.items():
        if cn < min_common or (u, v) in can:
            continue
        jacc = cn / (len(nbrs[u]) + len(nbrs[v]) - cn)
        final[(u, v)] = (cn, aa, round(jacc, 6))
    return final
