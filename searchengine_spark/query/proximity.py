"""Unordered proximity ("NEAR") search.

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
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .phrase import position_maps


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
    return (
        per_doc.where(F.exists(allpos, window_ok))
        .select("doc_id")
    )
