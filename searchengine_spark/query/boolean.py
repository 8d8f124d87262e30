"""Boolean keyword / AND / OR search.

Reference semantics (``InvertedIndexManager.java:476-546``, bitmap core
``InvertedIndex.java:1208-1259``): keywords are deduped, joined with spaces
and re-analyzed; AND intersects posting lists, OR unions them. The bitmap
AND/OR becomes count-matching over the postings DataFrame — one shuffle on
doc_id, no driver-side set logic. Analyzed-away queries (all stop words)
return empty, like an absent term does in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _empty_ids(index) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id string")


def search_keyword(index, keyword: str) -> DataFrame:
    """Single keyword -> distinct doc_ids (reference searchQuery)."""
    return search_and(index, [keyword])


def search_and(index, keywords) -> DataFrame:
    terms = sorted(set(index.analyze_query(keywords)))
    if not terms:
        return _empty_ids(index)
    n = len(terms)
    # boolean ops never read positions (the artifact skips the pos bytes)
    matched = index.postings_for_terms(terms, positional=False)
    if n == 1:
        return matched.select("doc_id").distinct()
    # count DISTINCT terms, not rows: the same doc_id may legally exist in
    # two segments (append_segment enforces no cross-segment uniqueness),
    # and row-counting its duplicate postings would fake an AND match
    return (
        matched.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_terms"))
        .where(F.col("n_terms") == n)
        .select("doc_id")
    )


def search_or(index, keywords) -> DataFrame:
    terms = sorted(set(index.analyze_query(keywords)))
    if not terms:
        return _empty_ids(index)
    return (
        index.postings_for_terms(terms, positional=False)
        .select("doc_id")
        .distinct()
    )
