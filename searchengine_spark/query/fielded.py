"""Fielded query surface: Lucene-style ``field:value`` filters + free text.

``parse_fielded`` splits a query string into metadata filters and the
remaining free-text BM25 query; ``search_fielded`` compiles the filters
against a document-metadata frame and runs metadata-filtered BM25
(query/ranked.py::search_bm25 ``allowed=`` — the semi-join lands on the
postings BEFORE the scoring shuffle, so filtered-out docs' postings never
shuffle; IDF/avgdl stay corpus-global).

Semantics (the common search-box subset, kept deliberately small):

- ``field:value`` — equality filter; the value is a single token
  (no quoting/ranges — this is a filter grammar, not an expression one).
- repeated same-field filters OR together (``role:user role:tool`` =
  either role), distinct fields AND together — Lucene's default
  treatment of repeated fielded terms.
- everything else is the free-text relevance query, analyzed by the
  index's own analyzer inside search_bm25.
- filter-only queries are rejected: BM25 needs at least one scoring term
  (a pure filter is a metadata scan, not a ranked search — use the
  metadata frame directly).

Field names are validated against the metadata frame's columns, so a typo
(``rol:assistant``) raises instead of silently matching nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_fielded(query: str) -> tuple[str, dict[str, list[str]]]:
    """Split ``query`` into (free_text, {field: [values...]}).

    A token is a filter iff it matches ``name:value`` with a non-empty
    name and value; anything else (including bare ``a:`` / ``:b`` and
    terms containing no colon) stays free text. Order of values is kept
    (first occurrence first) for deterministic plans.
    """
    free: list[str] = []
    filters: dict[str, list[str]] = {}
    for tok in query.split():
        name, sep, value = tok.partition(":")
        if sep and name and value:
            filters.setdefault(name, [])
            if value not in filters[name]:
                filters[name].append(value)
        else:
            free.append(tok)
    return " ".join(free), filters


def search_fielded(
    index,
    meta: DataFrame,
    query: str,
    k: int | None = None,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Parse ``query`` and run filtered BM25: ``field:value`` tokens become
    equality predicates on ``meta`` (a (doc_id, ...metadata) frame), the
    rest is the relevance query. Returns the stock (doc_id, score) frame.

    The predicate frame is built WHERE-first, so at scale the equality
    filters push into the metadata scan (parquet predicate pushdown) and
    only surviving doc_ids reach the postings semi-join.
    """
    free_text, filters = parse_fielded(query)
    if not free_text:
        raise ValueError(
            "fielded query has no free-text terms — a pure filter is a "
            "metadata scan, not a ranked search"
        )
    if not filters:
        return index.search_bm25(free_text, k)
    missing = sorted(set(filters) - set(meta.columns))
    if missing:
        raise ValueError(
            f"unknown filter field(s) {missing}; metadata columns are "
            f"{sorted(c for c in meta.columns if c != doc_id_col)}"
        )
    allowed = meta
    for field, values in filters.items():
        allowed = allowed.where(F.col(field).isin(values))
    return index.search_bm25_filtered(
        free_text, allowed.select(F.col(doc_id_col).alias("doc_id")), k
    )
