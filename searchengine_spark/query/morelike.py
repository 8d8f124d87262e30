"""More-like-this retrieval and faceted result counts — the two
results-page companions to ranked search (Lucene's MoreLikeThis and
facet counting, re-expressed over this engine's primitives).

``more_like_this``: select the source document's most distinctive terms
(tf × tfidf idf, the engine's Q5/Q6 log10 quirk formula) and run them as
a BM25 query, excluding the source doc. Term selection is driver-side
O(|doc|): one corpus point-read for the text, the same analyzer chain as
the build, and a bounded ``query_term_stats`` lookup — no corpus scan to
recover a doc's term vector. Ranking is the stock BM25 plan.

``facet_counts``: bucket the documents matching a query by a metadata
column — one semi-join from the match set to the corpus and one count
aggregate, the hydrate-join pattern at aggregate grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranked import tfidf_idf


def mlt_terms(index, doc_id: str, n_terms: int = 10) -> list[str]:
    """The source doc's top ``n_terms`` by tf × tfidf-idf (selection score
    rounded to 6dp; tiebreak term ASC — deterministic and replayable in
    SQL). Raises if the doc_id is unknown."""
    if index.corpus is None:
        raise ValueError("index built without corpus reference")
    corpus = index.corpus
    if index.doc_id_col != "doc_id":
        corpus = corpus.withColumnRenamed(index.doc_id_col, "doc_id")
    rows = (
        corpus.where(F.col("doc_id") == doc_id)
        .select(F.col(index.text_col))
        .collect()
    )
    if not rows:
        raise ValueError(f"doc_id {doc_id!r} not in corpus")
    terms = index.analyze_query(rows[0][0])
    tf: dict[str, int] = {}
    for t in terms:
        tf[t] = tf.get(t, 0) + 1
    stats = index.query_term_stats(sorted(tf))
    scored = [
        (round(c * tfidf_idf(index.n_docs, stats[t][0]), 6), t)
        for t, c in tf.items()
        if stats.get(t, (0, 0))[0] > 0
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:n_terms]]


def doc_vectors(index, n_terms: int = 10, decimals: int = 6) -> DataFrame:
    """Sparse TF-IDF vectors for EVERY corpus document: each doc's top
    ``n_terms`` terms by tf × log10(N/df+1) — the same selection score as
    :func:`mlt_terms` (rounded, term-asc tie-broken, so the cut is
    deterministic and SQL-replayable), computed corpus-wide in ONE job
    instead of one driver round-trip per doc. Returns
    ``(doc_id, term, weight_r, rank)`` — the sparse-vector export a
    clustering / topic-model / embedding-distillation pipeline consumes.

    Plan: the index's postings ARE the tf table (no corpus rescan, no
    re-analyze); one term-keyed equi-join against the term-stats frame
    for df, one per-doc window cut. The window shuffle is keyed on doc_id
    — evenly spread by construction, and the partitioning the downstream
    per-doc export wants anyway."""
    from pyspark.sql import Window

    if n_terms <= 0:
        raise ValueError(f"n_terms must be positive, got {n_terms}")
    idf = F.log10(
        F.lit(float(index.n_docs)) / F.col("df").cast("double") + F.lit(1.0)
    )
    scored = index.filter_deleted(index.all_postings(positional=False)).join(
        index.term_stats.select("term", "df"), "term"
    ).select(
        "doc_id",
        "term",
        F.round(F.col("tf").cast("double") * idf, decimals).alias("weight_r"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight_r"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_terms)
        .orderBy("doc_id", "rank")
    )


def more_like_this(
    index, doc_id: str, n_terms: int = 10, k: int | None = 10
) -> DataFrame:
    """(doc_id, score) BM25 results for the source doc's top terms, source
    doc excluded. ``k`` counts the returned neighbours (the exclusion
    happens before the cut, so asking for k always yields k when enough
    docs match)."""
    terms = mlt_terms(index, doc_id, n_terms)
    if not terms:
        return index.search_bm25([], k)
    res = index.search_bm25(terms, None).where(F.col("doc_id") != doc_id)
    if k is None:
        return res
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def facet_counts(
    index, query: str, facet_col: str, mode: str = "keyword"
) -> DataFrame:
    """(facet value, n_docs) over the documents matching ``query``.

    ``mode``: ``keyword`` (single-term match) or ``or`` (any term). The
    corpus must be attached (facet metadata lives there); the match set
    semi-joins the corpus, then one count aggregate per facet value.
    """
    if index.corpus is None:
        raise ValueError("index built without corpus reference")
    if mode not in ("keyword", "or"):
        raise ValueError(f"mode must be 'keyword' or 'or', got {mode!r}")
    matched = (
        index.search_keyword(query)
        if mode == "keyword"
        else index.search_or(query)
    )
    corpus = index.corpus
    if index.doc_id_col != "doc_id":
        corpus = corpus.withColumnRenamed(index.doc_id_col, "doc_id")
    return (
        corpus.join(matched.select("doc_id"), "doc_id", "left_semi")
        .groupBy(facet_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def facet_stats(
    results: DataFrame,
    meta: DataFrame,
    facet_col: str,
    value_col: str,
    percentiles: tuple = (0.5, 0.9),
) -> DataFrame:
    """Per-facet numeric statistics over a search's match set (the ES
    ``stats``/``percentiles`` sub-aggregation under a ``terms`` facet):
    one row per facet value with count, min, max, mean, and EXACT
    interpolated percentiles of ``value_col``. ``results`` is any doc_id
    frame (a search result); ``meta`` carries (doc_id, facet, value).

    Plan: one doc_id semi-join (match set into the metadata scan), one
    group-by-facet aggregate. Exact ``percentile`` buffers each group's
    values (the deterministic form the DuckDB ``quantile_cont`` twin can
    replay); for huge facet groups at corpus scale swap in
    ``approx_percentile`` — same plan shape, sketch-merged instead of
    buffered."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.round(F.avg(value_col), 6).alias("avg_v_r"),
    ]
    for p in percentiles:
        # round, not int-truncate: int(0.29 * 100) == 28 mislabels the column
        aggs.append(
            F.round(F.expr(f"percentile({value_col}, {float(p)}D)"), 6).alias(
                f"p{int(round(p * 100))}"
            )
        )
    return (
        meta.join(results.select("doc_id").distinct(), "doc_id", "left_semi")
        .groupBy(facet_col)
        .agg(*aggs)
    )


def facet_date_histogram(
    index,
    query: str,
    meta: DataFrame,
    ts_col: str = "ts",
    interval_s: int = 3600,
    mode: str = "or",
) -> DataFrame:
    """ES ``date_histogram`` over search results: hit counts per
    fixed-width time bucket. ``meta`` is a (doc_id, ts) frame (e.g. the
    transcripts table keyed by doc_key); the match set comes from the
    term-filtered postings scan and semi-joins the metadata, then ONE
    combinable count per bucket. Buckets are epoch-truncating
    (``floor(epoch / interval) * interval``, the timeseries.py
    retention-cohort arithmetic — deterministic and timezone-free);
    empty buckets are omitted (a gap-filling sequence join would be
    driver-trivial for bounded ranges but is the caller's choice).

    Returns ``(bucket_es, n_hits)`` ordered by bucket_es — bucket start
    in epoch seconds.
    """
    if interval_s <= 0:
        raise ValueError(f"interval_s must be positive, got {interval_s}")
    if mode not in ("keyword", "or"):
        raise ValueError(f"mode must be 'keyword' or 'or', got {mode!r}")
    matched = (
        index.search_keyword(query)
        if mode == "keyword"
        else index.search_or(query)
    )
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(interval_s))
        * F.lit(interval_s)
    ).cast("long")
    return (
        meta.join(matched.select("doc_id"), "doc_id", "left_semi")
        .select(bucket.alias("bucket_es"))
        .groupBy("bucket_es")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .orderBy("bucket_es")
    )
