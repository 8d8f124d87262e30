"""Rank evaluation: P@k, MRR, NDCG@k for a batch of queries against a
graded-judgments frame (the Elasticsearch ``_rank_eval`` API surface;
metric definitions per Järvelin & Kekäläinen 2002 for DCG and the TREC
conventions for P@k / reciprocal rank).

Given ``queries`` (query_id -> text) and ``judgments`` (query_id, doc_id,
grade >= 0), score every query in ONE shared postings scan
(``ranked.search_bm25_batch``), cut the deterministic top-k per query
(rounded score desc, doc_id asc — the engine's total result order), and
reduce each query's ranking to:

  - ``p_at_k``  = |{retrieved in top-k with grade > 0}| / k
  - ``rr``      = 1 / rank of the first relevant retrieved doc (0 if none)
  - ``ndcg``    = DCG@k / IDCG@k with gain (2^grade - 1)/log2(rank+1)
                  (0 when the query has no judged-relevant docs at all)

Unjudged retrieved docs count as grade 0 (standard pooling convention).

Plan shape: the batched-BM25 plan (one postings scan, one doc_id x query
shuffle), a per-query window for ranks, then everything after the top-k
cut is O(|Q| * k): the judgments join broadcasts and the per-query metric
folds run over collect_list'ed k-row arrays IN SORTED RANK ORDER — the
engine's bit-identity idiom (float addition is order-sensitive; the
DuckDB oracle folds in the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    index,
    queries: dict[str, str],
    judgments: DataFrame,
    k: int = 10,
    decimals: int = 4,
) -> DataFrame:
    """Evaluate BM25 rankings for ``queries`` against ``judgments``
    (columns ``query_id, doc_id, grade``). Returns one row per query_id:
    ``(query_id, n_judged, p_at_k, rr, ndcg)`` with metrics rounded to 6
    decimals, ordered by query_id. Queries that retrieve nothing still
    appear (metrics 0.0)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = index.spark
    j = judgments.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("grade").cast("int").alias("grade"),
    )

    scored = index.search_bm25_batch(queries, None).select(
        "query_id",
        "doc_id",
        F.round("score", decimals).alias("score_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_r"), F.asc("doc_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(F.broadcast(j), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "rank",
            F.coalesce("grade", F.lit(0)).alias("grade"),
        )
    )
    # per-query folds over <= k rows, in ascending-rank order (array_sort
    # on (rank, grade) structs sorts by rank — ranks are unique)
    hits = F.array_sort(F.collect_list(F.struct("rank", "grade")))
    dcg = F.aggregate(
        hits,
        F.lit(0.0),
        lambda acc, h: acc
        + (F.pow(F.lit(2.0), h["grade"].cast("double")) - 1.0)
        / F.log2(h["rank"].cast("double") + 1.0),
    )
    rel_ranks = F.filter(hits, lambda h: h["grade"] > 0)
    # 0-based F.get is NULL out of bounds (ANSI-safe; element_at throws
    # even under a when() guard — both branches may evaluate)
    rr = F.coalesce(
        1.0 / F.get(rel_ranks, 0)["rank"].cast("double"), F.lit(0.0)
    )
    per_q = topk.groupBy("query_id").agg(
        dcg.alias("dcg"),
        rr.alias("rr"),
        (F.size(rel_ranks).cast("double") / F.lit(float(k))).alias("p_at_k"),
    )

    # ideal DCG from the judgments alone: top-k grades descending, ideal
    # rank = position in that order (ties between equal grades don't
    # matter — only the grade enters the gain)
    ideal_grades = F.slice(
        F.reverse(F.array_sort(F.collect_list(F.col("grade").cast("double")))),
        1,
        k,
    )
    idcg = F.aggregate(
        ideal_grades,
        F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("i")),
        lambda acc, g: F.struct(
            (
                acc["s"]
                + (F.pow(F.lit(2.0), g) - 1.0)
                / F.log2(acc["i"].cast("double") + 2.0)
            ).alias("s"),
            (acc["i"] + 1).alias("i"),
        ),
        lambda acc: acc["s"],
    )
    ideals = (
        j.where(F.col("grade") > 0)
        .groupBy("query_id")
        .agg(idcg.alias("idcg"), F.count(F.lit(1)).alias("n_judged"))
    )

    qids = spark.createDataFrame(
        [(q,) for q in sorted(queries)], "query_id string"
    )
    return (
        qids.join(per_q, "query_id", "left")
        .join(F.broadcast(ideals), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_judged", F.lit(0)).cast("long").alias("n_judged"),
            F.round(F.coalesce("p_at_k", F.lit(0.0)), 6).alias("p_at_k"),
            F.round(F.coalesce("rr", F.lit(0.0)), 6).alias("rr"),
            F.round(
                F.when(
                    F.col("idcg").isNotNull() & (F.col("idcg") > 0.0),
                    F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )
