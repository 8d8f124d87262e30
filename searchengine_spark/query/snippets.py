"""Result snippets: a token window around the first query-term hit in
each top-k document (the results-page UX every search engine layers on
ranked retrieval; the reference prints whole documents —
``IcsSearchEngine.java`` result loop — so this is the Spark-native
upgrade of that surface).

Scale shape: snippets are generated AFTER the top-k cut, so the
re-analysis UDF and the window slice touch exactly k hydrated rows —
never the corpus. Ranking itself is the existing BM25 path (broadcast
query frame, one doc_id shuffle, deterministic sorted-term fold); this
module adds only O(k) work on top. The rank boundary is cut at the
ROUNDED score with a doc_id tie-break (the same determinism rule as the
``ft_tfidf_top20`` entry) so top-k membership is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.engine import make_term_positions_udf


def _stream(tp_col):
    """array<struct<term, positions>> -> position-sorted token stream
    (array<struct<pos, term>>; struct field order makes array_sort order
    by pos)."""
    flat = F.flatten(
        F.transform(
            tp_col,
            lambda s: F.transform(
                s["positions"],
                lambda p: F.struct(p.alias("pos"), s["term"].alias("term")),
            ),
        )
    )
    return F.array_sort(flat)


def search_snippets(
    index, query: str, k: int = 10, window: int = 5
) -> DataFrame:
    """(doc_id, score_r, first_pos, snippet) for the BM25 top-k.

    ``first_pos`` is the smallest token-stream position of any analyzed
    query term; ``snippet`` joins the analyzed tokens in
    ``[first_pos - window, first_pos + window]`` with single spaces (the
    post-filter token stream, not raw text — deterministic across
    engines and exactly what the positional postings index).
    """
    terms = index.analyze_query(query)
    if not terms or k == 0:
        return index.spark.createDataFrame(
            [], "doc_id string, score_r double, first_pos int, snippet string"
        )
    res = index.search_bm25(query, None)
    top = (
        res.select("doc_id", F.round("score", 4).alias("score_r"))
        .orderBy(F.desc("score_r"), F.asc("doc_id"))
        .limit(k)
    )
    # NOTE: the boundary tie-break above orders doc_id as a STRING; callers
    # with numeric ids who need an engine-independent numeric cut (the
    # ft_snippets driver entry) should cut themselves and call snippets_for
    return snippets_for(index, top, query, window)


def snippets_for(
    index, top: DataFrame, query: str, window: int = 5
) -> DataFrame:
    """Attach first_pos + snippet columns to a precomputed result frame
    (``doc_id`` plus any carry-through columns). O(|top|) work."""
    terms = index.analyze_query(query)
    hyd = index.hydrate(top)
    tp = make_term_positions_udf(index.analyzer)
    carry = [c for c in top.columns if c != "doc_id"]
    # projection boundary: run the analyze UDF ONCE per row; both the
    # stream and first_pos derive from the materialized __tp column
    analyzed = hyd.select(
        "doc_id", *carry, tp(F.col(index.text_col)).alias("__tp")
    )
    term_arr = F.array(*[F.lit(t) for t in terms])
    first_pos = F.array_min(
        F.flatten(
            F.transform(
                F.filter(
                    F.col("__tp"),
                    lambda s: F.array_contains(term_arr, s["term"]),
                ),
                lambda s: s["positions"],
            )
        )
    )
    with_pos = analyzed.select(
        "doc_id", *carry, _stream(F.col("__tp")).alias("__stream"),
        first_pos.cast("int").alias("first_pos"),
    )
    start = F.greatest(F.col("first_pos") - window, F.lit(0))
    length = F.col("first_pos") + window - start + 1
    return with_pos.select(
        "doc_id",
        *carry,
        "first_pos",
        F.array_join(
            F.transform(
                F.slice("__stream", start + 1, length), lambda s: s["term"]
            ),
            " ",
        ).alias("snippet"),
    )
