"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

Modern search stacks pair lexical BM25 with embedding-cosine retrieval
and fuse the two rankings; RRF (Cormack, Clarke & Buettcher, SIGIR 2009)
is the standard score-free fusion::

    rrf(d) = sum over lists L of 1 / (c + rank_L(d))     (c = 60)

with docs absent from a list contributing nothing. Score-free matters:
BM25 and cosine live on incomparable scales, and RRF only consumes ranks.

The reference engine has no embedding path (its closest analogue is the
TF-IDF + PageRank combined rank, ``IcsSearchEngine.java:183-200``, our
R3); hybrid fusion is part of the training-data / retrieval surface the
brief adds on top.

Scale shape: each input list MUST already be cut to its retrieval depth
(top-``depth`` from its own engine — BM25's TakeOrdered, ANN's
TakeOrdered), so the unpartitioned ranking window below is global over
O(depth) rows, not the corpus — the same "tiny frame after the top-k
cut" regime as snippet generation. Ranks are assigned on ROUNDED scores
with an id tie-break so fusion is engine- and partitioning-independent;
per-doc fused sums fold contributions in sorted list-name order (the
same bit-identity discipline as ranked.py's sorted-term fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60  # Cormack et al.'s constant, shared with the oracle SQL


def rrf_fuse(
    lists: dict[str, DataFrame],
    k: int | None = None,
    c: int = RRF_C,
    id_col: str = "doc_id",
    score_col: str = "score",
    round_to: int = 4,
) -> DataFrame:
    """Fuse {list_name: (id, score) frame} -> (id, rrf) top-k.

    Inputs must be depth-bounded (see module docstring). Rank = 1-based
    row_number over (round(score, round_to) DESC, id ASC).
    """
    contribs = []
    for name in sorted(lists):
        df = lists[name]
        w = Window.orderBy(
            F.desc(F.round(F.col(score_col), round_to)), F.asc(F.col(id_col))
        )
        contribs.append(
            df.select(
                F.col(id_col),
                F.struct(
                    F.lit(name).alias("src"),
                    (F.lit(1.0) / (F.row_number().over(w) + F.lit(c))).alias(
                        "contrib"
                    ),
                ).alias("p"),
            )
        )
    unioned = contribs[0]
    for extra in contribs[1:]:
        unioned = unioned.unionByName(extra)
    fused = (
        unioned.groupBy(id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("rrf")
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
    )
    return fused.limit(k) if k is not None else fused


def hybrid_search(
    index,
    embeddings: DataFrame,
    text_query: str,
    query_vec: list[float],
    k: int = 10,
    depth: int = 50,
    c: int = RRF_C,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    id_cast: str | None = None,
) -> DataFrame:
    """BM25(text_query) ⊕ cosine(query_vec) under RRF. ``embeddings`` ids
    must live in the index's doc_id space (cast to its doc_id type so the
    fusion groupBy and tie-breaks compare like with like).

    Both depth cuts happen at the ROUNDED score with an id tie-break —
    full-precision boundary ties order differently per engine (the same
    discipline as the rank-k cuts in entry_queries), so the fused result
    is reproducible by any engine that agrees on scores to ``round_to``
    places. Each cut is an orderBy().limit() = distributed TakeOrdered.

    ``id_cast``: type to cast BOTH lists' ids to BEFORE any cut or rank
    window. The index's doc_id is a string, so rounded-score ties break
    in STRING order by default ("1511" < "574"); a numeric-id corpus
    whose oracle/twin orders numerically must pass ``id_cast="long"`` or
    boundary ties diverge (the hybrid_rrf_top10 driver entry does).
    """
    from ..textops.similarity import cosine_col

    bm = index.search_bm25(text_query, None)
    if id_cast is not None:
        bm = bm.select(F.col("doc_id").cast(id_cast).alias("doc_id"), "score")
    bm = bm.orderBy(
        F.desc(F.round("score", round_to)), F.asc("doc_id")
    ).limit(depth)
    doc_id_type = id_cast or dict(bm.dtypes)["doc_id"]
    ann = (
        embeddings.select(
            F.col(id_col).cast(doc_id_type).alias("doc_id"),
            cosine_col(F.col(vec_col), query_vec).alias("score"),
        )
        # zero-norm embeddings have NULL cosine (undefined): they must not
        # occupy candidate slots and collect RRF mass on small corpora
        .where(F.col("score").isNotNull())
        .orderBy(F.desc(F.round("score", round_to)), F.asc("doc_id"))
        .limit(depth)
    )
    return rrf_fuse({"bm25": bm, "ann": ann}, k=k, c=c, round_to=round_to)
