"""Block-max WAND top-k BM25 over the compressed block artifact.

Classic WAND is a sequential cursor algorithm; this is the exact,
vectorized/distributed restatement (SURVEY.md §4.2.2):

1. **Candidate blocks**: parquet scan of block rows for the query terms
   (``term IN (...)`` pushed to the scan; only metadata + compressed bytes
   of the query terms' blocks are ever read).
2. **Per-block upper bound**: ub = qtf·idf·(k1+1)·max_tf /
   (max_tf + k1·(1−b+b·min_dl/avgdl)) — monotone bounds from stored
   (max_tf, min_dl), evaluated with the current global avgdl.
3. **Seed θ**: decode only the ⌈k/block_size⌉+1 highest-ub blocks per term,
   score them exactly; the k-th best (partial) score is a valid lower bound
   θ of the true k-th score.
4. **Prune**: a block of term t is dropped iff ub(block) + Σ_{t'≠t}
   max-ub(t') < θ. Any doc in a dropped block has true score < θ ≤ true
   k-th score, so: (a) every true top-k doc has ALL its blocks kept (its
   blocks can't satisfy the drop test — the doc itself is a witness), hence
   is scored exactly; (b) docs scored partially (some blocks dropped) have
   estimate ≤ true score < θ, so they cannot displace a fully-scored top-k
   doc. The result is therefore exact, including boundary ties.
5. **Score + top-k**: decode kept blocks, per-posting BM25 partials,
   deterministic per-doc fold in sorted-term order (bit-identical to the
   logical path and the pure-Python oracle), one shuffle on doc_ord, then a
   distributed TakeOrdered with (score desc, doc_id asc) tie-break.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranked import _query_weights, bm25_idf


def _empty(index) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id string, score double")


def _score_blocks(aidx, blocks: DataFrame, qdf: DataFrame) -> DataFrame:
    """Decode block rows and BM25-score them -> (doc_id, score), with
    tombstoned docs filtered (they must not seed θ either — a deleted
    high-scorer would prune blocks that surviving docs need)."""
    from ..index.artifact import DECODED_SCHEMA, _make_decoder

    # NB: "pos" deliberately excluded — scoring never reads positions, and
    # pruning the column here keeps position bytes out of the parquet scan.
    block_cols = ["term", "first_ord", "docs", "tfs", "dls"]
    decoded = blocks.select(*block_cols).mapInPandas(
        _make_decoder(False), schema=DECODED_SCHEMA
    )
    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0
    tf = F.col("tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    partial = F.col("qtf") * F.col("idf") * tf * (k1 + 1.0) / norm
    scored = (
        decoded.join(F.broadcast(qdf), "term")
        .select("doc_ord", F.struct("term", partial.alias("partial")).alias("p"))
        .groupBy("doc_ord")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("score")
        )
    )
    return aidx.filter_deleted(
        scored.join(aidx.docs_tbl.select("doc_ord", "doc_id"), "doc_ord").select(
            "doc_id", "score"
        )
    )


def search_bm25_blockmax(aidx, query, k: int) -> DataFrame:
    weights = _query_weights(aidx, query, bm25_idf)
    if not weights or k == 0:
        return _empty(aidx)
    spark = aidx.spark
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    terms = [t for t, _, _ in weights]

    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0
    mtf = F.col("max_tf").cast("double")
    ub_norm = mtf + k1 * (1.0 - b + b * F.col("min_dl") / F.lit(avgdl))
    ub = F.col("qtf") * F.col("idf") * mtf * (k1 + 1.0) / ub_norm

    # persist: the candidate block set feeds three jobs (per-term ub budget,
    # seed scoring, final pruned scoring) — without it each job re-lists and
    # re-reads the block files
    cand = (
        aidx.blocks_for_terms(terms)
        .join(F.broadcast(qdf), "term")
        .withColumn("ub", ub)
        .persist()
    )

    # per-term global max ub (|q| rows) — the "other terms" budget
    stats = cand.groupBy("term").agg(
        F.max("ub").alias("m"), F.count(F.lit(1)).alias("nb")
    ).collect()
    g = {r["term"]: r["m"] for r in stats}
    if not g:
        return _empty(aidx)
    total_ub = sum(g.values())
    n_cand_blocks = sum(r["nb"] for r in stats)

    # small queries: decoding everything is cheaper than a seed+prune pass
    if n_cand_blocks <= 256:
        out = (
            _score_blocks(aidx, cand, qdf)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .localCheckpoint(eager=True)
        )
        cand.unpersist()
        return out

    # seed θ from the highest-impact blocks of each term
    n_seed = math.ceil(k / aidx.block_size) + 1
    w = Window.partitionBy("term").orderBy(
        F.desc("ub"), F.asc("first_ord"), F.asc("block_seq")
    )
    seed = cand.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= n_seed
    )
    top = (
        _score_blocks(aidx, seed, qdf)
        .orderBy(F.desc("score"))
        .limit(k)
        .collect()
    )
    theta = min(r["score"] for r in top) if len(top) >= k else float("-inf")

    if theta == float("-inf"):
        kept = cand
    else:
        others = spark.createDataFrame(
            [(t, total_ub - g[t]) for t in g], "term string, others double"
        )
        kept = cand.join(F.broadcast(others), "term").where(
            F.col("ub") + F.col("others") >= theta
        )

    out = (
        _score_blocks(aidx, kept, qdf)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .localCheckpoint(eager=True)  # materialize before dropping the cache
    )
    cand.unpersist()
    return out
