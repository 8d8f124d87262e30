"""Block-max WAND top-k BM25 over the compressed block artifact.

Classic WAND is a sequential cursor algorithm; this is the exact,
vectorized/distributed restatement (SURVEY.md §4.2.2):

1. **Candidate blocks**: parquet scan of block rows for the query terms
   (``term IN (...)`` pushed to the scan; only metadata + compressed bytes
   of the query terms' blocks are ever read).
2. **Per-block upper bound**: ub = qtf·idf·max over the block's stored
   (tf, dl) Pareto front of tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) — the
   EXACT per-block max score part for the current (k1, b) and global
   avgdl (the maximizer of a tf-increasing, dl-decreasing function lies
   on the front); falls back to the looser monotone (max_tf, min_dl)
   composite for artifacts packed before the front columns existed.
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
5. **Score + top-k + hydrate**: decode kept blocks, per-posting BM25
   partials, deterministic per-doc fold in sorted-term order (bit-identical
   to the logical path and the pure-Python oracle), one shuffle on
   ``doc_ord``, distributed TakeOrdered of the *ordinal-keyed* scores.
   The corpus-sized ``doc_ord → doc_id`` mapping is consulted only AFTER
   the top-k cut, for the ≤ k+ties surviving ordinals, via a point lookup
   (``seg`` partition pruning + ``doc_ord IN (...)`` row-group pruning on
   the docs parquet — see ``ArtifactIndex.docs_for_ordinals``). At 10^12
   docs this touches a handful of row groups instead of shuffling the whole
   doc table per query.

Tie-break contract: the final ranking orders by (score desc, doc_id asc) —
identical to the logical path. The ordinal-space top-k cut keeps *every*
doc whose score ties the k-th score (boundary set ``score >= θ_k``), so the
doc_id tie-break is applied to the complete tie cluster even though
ordinals order by (segment, doc_id) rather than globally by doc_id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranked import _query_weights, bm25_idf

# Safety valve for the boundary-tie collect: if more than this many docs tie
# the k-th score, fall back to a distributed cut (pathological corpora only —
# e.g. every doc identical).
_MAX_TIE_COLLECT = 65536


def _empty(index) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id string, score double")


def _score_blocks(aidx, blocks: DataFrame, qdf: DataFrame) -> DataFrame:
    """Decode block rows and BM25-score them -> (doc_ord, score), with
    tombstoned docs filtered (they must not seed θ either — a deleted
    high-scorer would prune blocks that surviving docs need). No doc-table
    join happens here: doc_id recovery is deferred to after the top-k cut."""
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
    return aidx.filter_deleted_ords(scored)


def _finalize_topk(aidx, scored: DataFrame, k: int) -> DataFrame:
    """(doc_ord, score) -> exact top-k (doc_id, score) under the
    (score desc, doc_id asc) contract, touching the doc table only for the
    boundary set (all docs with score >= k-th score, typically ~k rows)."""
    spark = aidx.spark
    scored = scored.persist()
    try:
        top = scored.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k).collect()
        if not top:
            return _empty(aidx)
        if len(top) < k:
            boundary = top  # corpus has fewer than k scored docs
        else:
            theta_k = top[-1]["score"]
            # every potential member of the final top-k under ANY tie-break
            cand = scored.where(F.col("score") >= theta_k)
            boundary = cand.limit(_MAX_TIE_COLLECT + 1).collect()
            if len(boundary) > _MAX_TIE_COLLECT:
                # pathological tie plateau: cut distributedly (doc-table join
                # before the limit — slow but exact)
                out = (
                    scored.join(
                        aidx.docs_tbl.select("doc_ord", "doc_id"), "doc_ord"
                    )
                    .select("doc_id", "score")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(k)
                    .localCheckpoint(eager=True)
                )
                return out
        id_by_ord = {
            r["doc_ord"]: r["doc_id"]
            for r in aidx.docs_for_ordinals(
                [r["doc_ord"] for r in boundary]
            ).collect()
        }
        rows = sorted(
            ((id_by_ord[r["doc_ord"]], r["score"]) for r in boundary),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        return spark.createDataFrame(rows, "doc_id string, score double")
    finally:
        scored.unpersist()


def search_bm25_blockmax(aidx, query, k: int) -> DataFrame:
    weights = _query_weights(aidx, query, bm25_idf)
    if not weights or k == 0:
        return _empty(aidx)
    spark = aidx.spark
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    terms = [t for t, _, _ in weights]

    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1 + 1.0) / (
            t + k1 * (1.0 - b + b * dl.cast("double") / F.lit(avgdl))
        )

    # block bound from the stored (tf, dl) Pareto front: the EXACT max
    # score part over the block for the current (k1, b, avgdl) — tighter
    # than part(max_tf, min_dl), which remains the fallback for artifacts
    # packed before the front columns existed (null there)
    front_tfs = F.coalesce(F.col("ub_tfs"), F.array(F.col("max_tf")))
    front_dls = F.coalesce(F.col("ub_dls"), F.array(F.col("min_dl")))
    ub = (
        F.col("qtf")
        * F.col("idf")
        * F.array_max(F.zip_with(front_tfs, front_dls, part))
    )

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
        out = _finalize_topk(aidx, _score_blocks(aidx, cand, qdf), k)
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

    out = _finalize_topk(aidx, _score_blocks(aidx, kept, qdf), k)
    cand.unpersist()
    return out
