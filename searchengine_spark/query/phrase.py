"""Positional phrase search.

Reference semantics (``InvertedIndexManager.searchPhraseQuery:233-259`` +
``InvertedIndex.searchPhrase:1261-1345``): the phrase is re-analyzed (stop
words drop out, so "happy AND today" matches "i am happy today"); a document
matches iff some position p of word_0 has word_j at p+j for every j.

Spark shape: filter postings to the phrase's terms, collect a per-document
``term -> positions`` map (ONE shuffle), then fold an ``array_intersect``
chain over shifted position arrays — all built-in expressions, no Python in
the hot path. Duplicate terms inside the phrase are handled naturally since
the map is keyed by term and shifts differ per slot.

Scale shape (artifact path, multi-term phrases): a PHASE-1 candidate pass
scans the term blocks WITHOUT the position bytes (``postings_for_terms``
with ``positional=False`` — the ``pos`` parquet column never leaves disk)
and keeps only doc_ids containing every phrase term; phase 2 then decodes
positions but left-semi-joins to the candidates BEFORE the posmap shuffle.
For the common asymmetric phrase ("merge" in 10^9 docs + a rare second
term), the position arrays of the 10^9 non-candidates are never shuffled
— the dominant cost at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# below this total df the phrase terms' postings are small enough that the
# single-pass plan wins (the phase-1 scan would cost more than it saves)
_TWO_PHASE_MIN_DF = 65536


def position_maps(
    index, uniq: list[str], allowed: DataFrame | None = None
) -> DataFrame:
    """(doc_id, posmap: map<term, array<int>>) for docs containing EVERY
    term in ``uniq`` — the shared phase-1/phase-2 front of the positional
    operators (phrase, proximity). ``allowed`` (a doc_id frame, e.g. a
    top-N rescore window) semi-joins the postings BEFORE the posmap
    shuffle, so position arrays of out-of-window docs never move."""
    post = index.postings_for_terms(uniq)
    if allowed is not None:
        post = post.join(allowed.select("doc_id"), "doc_id", "left_semi")
    # two-phase only when the term postings are big enough that shuffling
    # non-candidate position arrays dominates the second scan (same
    # small-query escape hatch shape as WAND's <=256-block fast path);
    # df stats come from the broadcast-sized stats table, no extra job
    stats = index.query_term_stats(uniq)
    total_df = sum(df for df, _ in stats.values())
    if len(uniq) > 1 and total_df > _TWO_PHASE_MIN_DF:
        # artifact path: positions-free candidate scan (pos column pruned)
        nopos = index.postings_for_terms(uniq, positional=False)
        if allowed is not None:
            nopos = nopos.join(allowed.select("doc_id"), "doc_id", "left_semi")
        cand_docs = (
            nopos.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nt"))
            .where(F.col("nt") == len(uniq))
            .select("doc_id")
        )
        post = post.join(cand_docs, "doc_id", "left_semi")
    # array_distinct: a doc_id duplicated across segments (legal transient
    # state) contributes identical (term, positions) twins that would
    # otherwise hit Spark 4's DUPLICATE_MAP_KEY; after dedupe the entry
    # count equals the distinct-term count for exact duplicates (instances
    # with *different* positions for a term fail the size filter — the
    # ambiguous-data case is excluded deterministically, not crashed on)
    return (
        post.groupBy("doc_id")
        .agg(
            F.array_distinct(
                F.collect_list(F.struct("term", "positions"))
            ).alias("entries")
        )
        .where(F.size("entries") == len(uniq))
        .select("doc_id", F.map_from_entries("entries").alias("posmap"))
    )


def search_phrase_slop(index, phrase, slop: int) -> DataFrame:
    """Ordered sloppy phrase — Lucene ``SpanNearQuery(inOrder=true, slop)``
    semantics: a document matches iff there are positions
    ``p_0 < p_1 < ... < p_{k-1}``, slot j an occurrence of analyzed term j,
    whose total gap ``p_{k-1} - p_0 - (k-1)`` is at most ``slop``.
    ``slop=0`` degenerates to the exact phrase (consecutive positions);
    the reference ships only that form (Q4), this is its standard
    relaxation ("merge ... sort" within a couple of interveners).

    Plan: the shared positional front (``position_maps`` — two-phase
    positions-free candidate scan at high df), then ONE JVM expression per
    doc. For each start position of term 0, a runtime ``F.aggregate`` fold
    walks the remaining slots greedily (smallest occurrence strictly after
    the previous slot — greedy-minimal is exchange-argument optimal for
    the span test, and a broken chain nulls out, which three-valued logic
    drops). The fold is a runtime loop over k-1 literal terms, NOT nested
    macro-expansion, so cost per probe is O(k · tf) — the captured-
    expression HOF blowup in CLAUDE.md does not apply."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    terms = index.analyze_query(phrase)
    if not terms:
        return index.spark.createDataFrame([], "doc_id string")
    uniq = sorted(set(terms))
    per_doc = position_maps(index, uniq)
    if len(terms) == 1:
        return per_doc.select("doc_id")
    rest = F.array(*[F.lit(t) for t in terms[1:]])
    budget = slop + len(terms) - 1

    def span_end(p0):
        return F.aggregate(
            rest,
            p0,
            lambda acc, t: F.array_min(
                F.filter(
                    F.element_at(F.col("posmap"), t), lambda q: q > acc
                )
            ),
        )

    ok = F.exists(
        F.col("posmap").getItem(terms[0]),
        lambda p0: span_end(p0) - p0 <= budget,
    )
    return per_doc.where(ok).select("doc_id")


def search_phrase(index, phrase) -> DataFrame:
    terms = index.analyze_query(phrase)
    if not terms:
        return index.spark.createDataFrame([], "doc_id string")
    uniq = sorted(set(terms))
    per_doc = position_maps(index, uniq)
    if len(terms) == 1:
        return per_doc.select("doc_id")
    # cand = positions p of terms[0] s.t. terms[j] occurs at p+j for all j<=i
    cand = F.col("posmap").getItem(terms[0])
    for j in range(1, len(terms)):
        shifted = F.transform(F.col("posmap").getItem(terms[j]), lambda x: x - j)
        cand = F.array_intersect(cand, shifted)
    return (
        per_doc.withColumn("cand", cand)
        .where(F.size("cand") > 0)
        .select("doc_id")
    )
