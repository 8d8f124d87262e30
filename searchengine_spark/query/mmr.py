"""Maximal Marginal Relevance (MMR) diversity rerank.

Carbonell & Goldstein (SIGIR 1998): given a depth-bounded candidate list
with relevance scores and an embedding per candidate, greedily pick k
results, each step maximizing

    mmr(d) = lam * rel(d) - (1 - lam) * max over selected s of sim(d, s)

— the relevance/redundancy trade-off every result page over near-
duplicate-heavy corpora (transcripts!) wants; the RRF hybrid operator
(query/hybrid.py) fuses rankings, this diversifies one.

Determinism contract (the engine's rounded-cut idiom): relevance and all
pairwise cosines are rounded to ``decimals`` IN SPARK before selection,
ties break on ascending id, and the greedy composite is computed from
those rounded doubles with a fixed expression shape — so the DuckDB twin
replays selection exactly (identical IEEE inputs -> identical products
and comparisons), without rounding the composite itself.

Plan shape: corpus-scale work stays distributed — the candidate cut
comes from any retrieval operator, vectors are fetched by ONE broadcast
semi-join against the (bucketable) embedding table, pairwise cosines are
a depth-bounded inequality join (depth^2 rows REGARDLESS of corpus size;
same sanctioned shape as similarity.embedding_near_dup_pairs exact mode,
here bounded by the user's depth cap, not by the corpus). The greedy
recurrence itself is inherently sequential with a data dependence on
every previous pick, so it runs driver-side over the O(depth^2) collected
pairs — at depth 50 that is 2,450 rows, not a distributed workload; a
per-step Spark job would pay k scheduler round-trips to save nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textops.similarity import _guarded_cos


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int,
    lam: float = 0.7,
    id_col: str = "doc_id",
    rel_col: str = "score",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Greedy MMR over ``candidates`` (id, relevance) using vectors from
    ``emb``. Returns (id_col, mmr_rank, rel_r): the k picks in selection
    order (rank 1 = pure best relevance — the standard seeding).
    Candidates without a vector in ``emb`` are dropped (inner-join
    semantics); ``lam=1`` degenerates to the plain relevance order.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    spark = candidates.sparkSession
    # keep the id's native type end-to-end: tie-breaks order on it, and a
    # string cast would silently turn numeric-id ordering lexicographic
    idt = candidates.select(F.col(id_col)).schema[0].dataType.simpleString()
    schema = f"{id_col} {idt}, mmr_rank int, rel_r double"
    if k == 0:
        return spark.createDataFrame([], schema)
    cand = candidates.select(
        F.col(id_col).alias("_id"),
        F.round(F.col(rel_col), decimals).alias("rel_r"),
    )
    cv = emb.select(
        F.col(vec_id_col).cast(idt).alias("_id"), F.col(vec_col).alias("_v")
    ).join(F.broadcast(cand), "_id")
    pool = {r["_id"]: float(r["rel_r"]) for r in cv.select("_id", "rel_r").collect()}
    if not pool:
        return spark.createDataFrame([], schema)

    a = cv.select(F.col("_id").alias("ia"), F.col("_v").alias("va"))
    b = cv.select(F.col("_id").alias("ib"), F.col("_v").alias("vb"))
    # _guarded_cos: NULL (not an ANSI DIVIDE_BY_ZERO crash) on zero-norm
    # vectors; treat "undefined similarity" as 0 redundancy in the MMR
    # trade-off so a padding embedding neither crashes nor blocks a pick
    sim = _guarded_cos(F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", F.round(sim, decimals).alias("sim_r"))
        .collect()
    )
    sims: dict[tuple[str, str], float] = {}
    for r in pairs:
        s = 0.0 if r["sim_r"] is None else float(r["sim_r"])
        sims[(r["ia"], r["ib"])] = s
        sims[(r["ib"], r["ia"])] = s

    one_m = 1.0 - lam  # fixed once; the oracle inlines repr() of both
    selected: list[str] = []
    remaining = dict(pool)
    while remaining and len(selected) < k:
        if not selected:
            # seed: max relevance, ascending-id tie-break
            best = min(remaining, key=lambda d: (-remaining[d], d))
        else:
            best = min(
                remaining,
                key=lambda d: (
                    -(
                        lam * remaining[d]
                        - one_m * max(sims[(d, s)] for s in selected)
                    ),
                    d,
                ),
            )
        selected.append(best)
        del remaining[best]
    rows = [(d, i + 1, pool[d]) for i, d in enumerate(selected)]
    return spark.createDataFrame(rows, schema)
