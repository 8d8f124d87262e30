"""Unordered proximity ("NEAR") search and the proximity rescorer.

A document matches ``search_near(index, query, window)`` iff there is one
occurrence position for EVERY analyzed query term such that the chosen
positions all fit in a token window of span ``window``::

    max(p_t) - min(p_t) <= window

This is the order-free companion of the exact phrase operator (Q4) — the
reference engine (``InvertedIndex.searchPhrase``) only ships the exact
form; NEAR is the standard retrieval extension (Lucene SpanNearQuery with
``inOrder=false``). ``window = 0`` degenerates to "all terms share one
position" (only possible for a single-term query); a single-term query
matches any doc containing the term, like keyword search.

Plan shape: the shared positional front (``phrase.position_maps``) keeps
only docs containing ALL terms — with the same positions-free phase-1
candidate scan at high df, so non-candidate position arrays never shuffle
— then one JVM expression decides the window test per doc:

    exists start p in (all positions of all query terms):
        every term has a position in [p, p + window]

which is exact because the minimum of any satisfying assignment is itself
a position of some query term. All higher-order-function lambdas probe
only per-term position arrays (tiny: positions of ONE term in ONE doc);
nothing leaves the JVM, no extra shuffle beyond the posmap groupBy.

``search_bm25_rescore_near`` is the Elasticsearch/Lucene RESCORER pattern
on top: a cheap BM25 pass picks the top-``n_rescore`` window, then the
expensive positional feature (all terms within ``window``) re-ranks ONLY
those docs — at corpus scale the positional decode touches N docs, never
the full match set (``position_maps(allowed=topN)`` pushes the window
restriction below the posmap shuffle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .phrase import position_maps


def _near_window_ok(uniq: list[str], window: int):
    """The JVM window-test Column over a ``posmap`` column (shared by
    search_near and the rescorer so both decide proximity identically)."""

    def window_ok(p):
        # captured per-probe work is one map lookup + a scan of that term's
        # (tiny) position array — no captured sort/aggregate re-evaluation
        # (the HOF pitfall in CLAUDE.md). NB: the inner lambda must take
        # exactly ONE Python parameter (PySpark infers HOF arity from the
        # signature), so ``t`` binds via this factory, not a default arg.
        def probe(t):
            return F.exists(
                F.col("posmap").getItem(t),
                lambda q: (q >= p) & (q <= p + window),
            )

        return reduce(lambda a, b: a & b, [probe(t) for t in uniq])

    allpos = F.flatten(F.map_values(F.col("posmap")))
    return F.exists(allpos, window_ok)


def search_near(index, query, window: int) -> DataFrame:
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    terms = index.analyze_query(query)
    if not terms:
        return index.spark.createDataFrame([], "doc_id string")
    uniq = sorted(set(terms))
    per_doc = position_maps(index, uniq)
    if len(uniq) == 1:
        return per_doc.select("doc_id")
    return per_doc.where(_near_window_ok(uniq, window)).select("doc_id")


def search_bm25_rescore_near(
    index,
    query,
    window: int,
    boost: float = 0.5,
    n_rescore: int = 100,
    k: int | None = None,
    decimals: int = 4,
) -> DataFrame:
    """Proximity rescoring (the ES ``rescore`` window / Lucene QueryRescorer
    shape): rank by BM25, take the top-``n_rescore`` docs by the engine's
    deterministic order (ROUNDED score desc, doc_id asc — the same cut the
    oracle can replay), then boost the docs whose terms all co-occur
    within ``window`` positions::

        score' = round(score_r * (1 + boost * near(doc)), decimals + 2)

    (two EXTRA digits on the combined score: a ``decimals``-digit score
    times a half/quarter boost is exact at ``decimals + 2`` digits, so
    the final round never sits on a rounding midpoint — re-rounding to
    ``decimals`` would put every odd-last-digit score exactly ON a
    midpoint, where engines legitimately disagree by one ulp)

    Returns ``(doc_id, score_r, near)`` for the rescore window, re-ranked;
    ``k`` truncates. Single-term queries are trivially near (the feature
    carries no signal), matching Lucene's span-of-one semantics.

    Plan: the stock BM25 plan + one top-N cut; the positional decode is
    restricted to the N-doc window BEFORE the posmap shuffle
    (``position_maps(allowed=...)``), so the expensive feature cost is
    O(n_rescore) regardless of how many docs match the query."""
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if n_rescore <= 0:
        raise ValueError(f"n_rescore must be positive, got {n_rescore}")
    terms = index.analyze_query(query)
    if not terms:
        return index.spark.createDataFrame(
            [], "doc_id string, score_r double, near boolean"
        )
    top = (
        index.search_bm25(query, None)
        .select("doc_id", F.round("score", decimals).alias("score_r"))
        .orderBy(F.desc("score_r"), F.asc("doc_id"))
        .limit(n_rescore)
        .persist()
    )
    uniq = sorted(set(terms))
    if len(uniq) == 1:
        near = top.select("doc_id")
    else:
        per_doc = position_maps(index, uniq, allowed=top)
        near = per_doc.where(_near_window_ok(uniq, window)).select("doc_id")
    out = (
        top.join(near.withColumn("near", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.col("score_r")
                * (
                    1.0
                    + F.lit(float(boost))
                    * F.when(F.col("near"), 1.0).otherwise(0.0)
                ),
                decimals + 2,
            ).alias("score_r"),
            F.coalesce("near", F.lit(False)).alias("near"),
        )
        .orderBy(F.desc("score_r"), F.asc("doc_id"))
    )
    return out.limit(k) if k is not None else out
