"""Pseudo-relevance feedback (PRF) query expansion — Rocchio-style.

Classic blind feedback (Rocchio 1971; Lucene has no built-in, but every
production stack layers it on): run the query, assume the top ``fb_docs``
results are relevant, mine their most distinctive terms, and re-run the
query expanded with those terms. Recovers vocabulary-mismatch recall
("car" retrieving "automobile" docs) with zero training data.

Deterministic, engine-independent recipe (every cut on rounded scores
with explicit tie-breaks, so a SQL twin replays it exactly):

1. Initial BM25; take the top ``fb_docs`` by (4dp-rounded score DESC,
   doc_id ASC).
2. Expansion candidates: re-analyze the feedback docs' text (driver-side,
   O(fb_docs·|doc|) — the mlt_terms pattern: corpus point-reads + the
   build's analyzer chain + a bounded term-stats lookup; NO corpus scan,
   and identical tf to the postings since it is the same chain). Score
   each term not already in the query by
   ``Σ tf over feedback docs × tfidf_idf(N, df)`` rounded to 6dp; take
   the top ``fb_terms`` (tie-break term ASC).
3. Final ranking: BM25 with the original (term, qtf, idf) weights plus
   each expansion term at qtf 1 — via ``search_bm25_weighted``, never by
   re-analyzing the expansion tokens (Porter stemming is not idempotent).

The distributed work is exactly two stock BM25 plans; everything between
them is O(fb_docs) driver-side, like more_like_this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranked import (
    _query_weights,
    bm25_idf,
    search_bm25_weighted,
    tfidf_idf,
)


def prf_expansion_terms(
    index, fb_doc_ids: list, exclude: set, n_terms: int
) -> list[str]:
    """Top expansion terms mined from the feedback docs (see module
    docstring, step 2)."""
    if index.corpus is None:
        raise ValueError("index built without corpus reference")
    corpus = index.corpus
    if index.doc_id_col != "doc_id":
        corpus = corpus.withColumnRenamed(index.doc_id_col, "doc_id")
    rows = (
        corpus.where(F.col("doc_id").isin(list(fb_doc_ids)))
        .select(F.col(index.text_col))
        .collect()
    )
    tf: dict[str, int] = {}
    for r in rows:
        for t in index.analyze_query(r[0]):
            tf[t] = tf.get(t, 0) + 1
    cand = sorted(t for t in tf if t not in exclude)
    if not cand:
        return []
    stats = index.query_term_stats(cand)
    scored = [
        (round(tf[t] * tfidf_idf(index.n_docs, stats[t][0]), 6), t)
        for t in cand
        if stats[t][0] > 0
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:n_terms]]


def search_bm25_prf(
    index,
    query,
    k: int | None = 10,
    fb_docs: int = 5,
    fb_terms: int = 5,
    id_cast: str | None = None,
) -> DataFrame:
    """(doc_id, score) BM25 with Rocchio-style blind feedback.

    ``id_cast``: type to cast doc_id to before the feedback cut's
    tie-break (the index doc_id is a string — pass "long" for numeric
    corpora whose oracle twin orders numerically, as with hybrid RRF).
    Falls back to plain BM25 when the query analyzes away or yields no
    feedback docs / expansion terms.
    """
    weights = _query_weights(index, query, bm25_idf)
    if not weights:
        return search_bm25_weighted(index, weights, k)
    initial = search_bm25_weighted(index, weights, None)
    if id_cast is not None:
        initial = initial.select(
            F.col("doc_id").cast(id_cast).alias("doc_id"), "score"
        )
    fb = (
        initial.orderBy(F.desc(F.round("score", 4)), F.asc("doc_id"))
        .limit(fb_docs)
        .collect()
    )
    fb_ids = [r["doc_id"] for r in fb]
    orig_terms = {t for t, _, _ in weights}
    expansion = prf_expansion_terms(index, fb_ids, orig_terms, fb_terms)
    stats = index.query_term_stats(expansion) if expansion else {}
    expanded = weights + [
        (t, 1, bm25_idf(index.n_docs, stats[t][0])) for t in sorted(expansion)
    ]
    # keep the sorted-term weight order (the bit-identity fold invariant)
    expanded.sort(key=lambda w: w[0])
    return search_bm25_weighted(index, expanded, k)
