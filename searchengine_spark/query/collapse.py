"""Field collapsing (ES ``collapse`` + ``inner_hits``): top-k search
results deduplicated by a metadata field.

The ES surface: run the query, keep only the best-scoring hit per value of
a collapse field (domain, source, conversation, author, ...), return the
top-k GROUPS ranked by their representative's score, each with its total
match count and its best ``inner_hits`` members. The standard "no more
than one result per site" SERP behavior, and in curation pipelines the
"best exemplar per near-dup cluster / per domain" selection step.

Plan shape: the scored match set (one BM25 doc_id aggregate, see
query/ranked.py) joins the doc -> group mapping on doc_id (hash equi-join;
the mapping is the corpus metadata frame, so the join keys are co-sized
with the MATCH SET, not the corpus), then ONE window partitioned by group
ranks members. Everything after the per-group cut is O(groups · inner_k).
The window's partition key is the collapse field over matching docs only —
the same cardinality ES fans its collapse over — so no corpus-sized sort
exists anywhere.

Determinism (driver-contract idiom): member order is (rounded score desc,
doc_id asc) and group order is (rounded best score desc, group asc), both
total orders, so the oracle's window replay cuts identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_results(
    scores: DataFrame,
    groups: DataFrame,
    group_col: str,
    k: int | None = 10,
    inner_hits: int = 3,
    decimals: int = 4,
) -> DataFrame:
    """Collapse a scored match set by a metadata field.

    ``scores``: (doc_id, score) — any ranker's full match frame.
    ``groups``: (doc_id, <group_col>) doc metadata mapping.

    Returns one row per group holding at least one match:
    ``(group, group_size, doc_id, score_r, inner_hits)`` where doc_id /
    score_r are the group representative (best member), group_size counts
    ALL matching members, and inner_hits is the comma-joined doc_id list of
    the top ``inner_hits`` members in (score_r desc, doc_id asc) order.
    Ordered by (score_r desc, group asc), cut to ``k`` groups.
    """
    rounded = scores.select(
        "doc_id", F.round("score", decimals).alias("score_r")
    ).join(groups.select("doc_id", F.col(group_col).alias("group")), "doc_id")
    w = Window.partitionBy("group").orderBy(
        F.desc("score_r"), F.asc("doc_id")
    )
    ranked = rounded.select(
        "group", "doc_id", "score_r", F.row_number().over(w).alias("rn")
    )
    out = ranked.groupBy("group").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("score_r"))).alias("score_r"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= inner_hits,
                            F.struct(
                                F.col("rn").alias("rn"),
                                F.col("doc_id").alias("doc_id"),
                            ),
                        )
                    )
                ),
                lambda s: s["doc_id"].cast("string"),
            ),
        ).alias("inner_hits"),
    )
    out = out.orderBy(F.desc("score_r"), F.asc("group"))
    return out.limit(k) if k is not None else out


def search_bm25_collapse(
    index,
    query: str,
    meta: DataFrame,
    group_col: str,
    k: int | None = 10,
    inner_hits: int = 3,
) -> DataFrame:
    """BM25 + field collapse: ES ``{"query": {...}, "collapse": {"field":
    group_col, "inner_hits": {...}}}``. ``meta`` is the corpus metadata
    frame carrying doc_id and the collapse field."""
    scores = index.search_bm25(query, None)
    return collapse_results(scores, meta, group_col, k, inner_hits)
