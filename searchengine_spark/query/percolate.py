"""Percolation — reverse search (the ES percolator): match incoming
documents against a table of STORED queries instead of matching queries
against stored documents. The routing/alerting primitive of a streaming
ingestion pipeline: "which saved searches fire for this new batch of
transcripts?"

Semantics: a stored query is a keyword conjunction — it fires for a
document iff ALL of its analyzed terms appear in the document (the same
all-terms rule as ``search_and`` / the boolean ``must`` clause). A query
that analyzes to no terms (stop words only) is vacuous; percolate
REJECTS the queries frame if any such row exists (silently matching
nothing — or everything, the ES reading — are both surprising; the
caller decides by filtering first).

Scale shape: both sides reduce to (id, term) pairs via zero-shuffle
projections (the queries side through the same vectorized analyze UDF
the index build uses, so percolation honors the analyzer chain exactly).
ONE term-keyed equi-join — the queries side is usually tiny and
broadcast — feeds ONE combinable (doc, query) count aggregate compared
against the query's term count. Candidate pairs are bounded by term
selectivity, never |docs|×|queries|; a query containing a corpus-hot
term pays that term's document frequency, which is the inherent cost of
the match semantics (ES pre-filters with the same candidate-then-verify
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def analyze_queries(
    queries_df: DataFrame,
    query_id_col: str = "query_id",
    query_col: str = "query",
    analyzer: str = "composable",
) -> DataFrame:
    """Analyze + validate the stored-query table once: returns
    ``(query_id, qts)`` with the vacuous-query check already run. Callers
    that percolate REPEATEDLY against the same queries (the streaming
    alerting loop) should persist the result and pass it to
    :func:`percolate` as ``prepared_queries`` — one analyze pass and one
    validation job total, instead of one per micro-batch (and no cache
    entry accumulating per call, which a per-call persist leaked)."""
    from ..analysis.analyzer import make_analyze_udf

    analyze = make_analyze_udf(analyzer)
    qterms = queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.array_distinct(analyze(F.col(query_col))).alias("qts"),
    )
    vacuous = qterms.where(F.size("qts") == 0).limit(1).collect()
    if vacuous:
        raise ValueError(
            f"stored query {vacuous[0]['query_id']!r} analyzes to no terms "
            "(stop words only); filter vacuous queries before percolating"
        )
    return qterms


def percolate(
    queries_df: DataFrame,
    docs_df: DataFrame,
    query_id_col: str = "query_id",
    query_col: str = "query",
    doc_id_col: str = "doc_id",
    tokens_col: str = "tokens",
    analyzer: str = "composable",
    broadcast_queries: bool = True,
    prepared_queries: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, query_id) for every stored query whose analyzed terms ALL
    appear in the document's token array — ordered by (doc_id, query_id).

    ``docs_df`` carries pre-analyzed tokens (the ingestion pipeline has
    them anyway); ``queries_df`` carries raw query strings, analyzed here
    with the same chain. Set ``broadcast_queries=False`` when the stored
    query table is too large to broadcast (the join degrades gracefully
    to a shuffle hash join on term). ``prepared_queries`` (from
    :func:`analyze_queries`) skips the per-call analyze + vacuous check —
    the repeated-percolation fast path; ``queries_df`` is ignored then.

    The one-shot path analyzes the (tiny) queries frame twice — once for
    the vacuous check, once lazily in the join — rather than persisting:
    a persist here would register one never-released cache entry per
    percolate() call in long-running processes.
    """
    if prepared_queries is not None:
        qterms = prepared_queries
    else:
        qterms = analyze_queries(queries_df, query_id_col, query_col, analyzer)
    qt = qterms.select(
        "query_id",
        F.size("qts").alias("n_terms"),
        F.explode("qts").alias("term"),
    )
    if broadcast_queries:
        qt = F.broadcast(qt)
    dt = docs_df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.col(tokens_col))).alias("term"),
    )
    return (
        dt.join(qt, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count(F.lit(1)).alias("_hits"),
            F.max("n_terms").alias("_need"),  # constant per query
        )
        .where(F.col("_hits") == F.col("_need"))
        .select("doc_id", "query_id")
        .orderBy("doc_id", "query_id")
    )
