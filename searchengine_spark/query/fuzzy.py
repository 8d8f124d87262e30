"""Fuzzy (edit-distance-1) keyword search via deletion-variant candidates.

The reference engine matches terms exactly; real search UIs tolerate a
typo. The scale-safe construction is SymSpell's: ``lev(a, b) <= 1``
implies the single-character-deletion neighborhoods of ``a`` and ``b``
intersect, so candidate vocabulary terms come from an EQUI-JOIN on
deletion variants — vocabulary-sized explode (|term|+1 variants per
term), broadcast query side — never a vocabulary scan with a per-term
edit-distance UDF, and never a cross product. Candidates are then
verified with the exact JVM ``levenshtein`` (the neighborhood intersection
over-approximates: e.g. "ab" vs "ba" share variants at distance 2).

The DuckDB oracle is deliberately the INDEPENDENT brute-force algorithm —
``levenshtein(term, q) <= 1`` over every token instance — so the
candidate construction is checked against plain edit-distance semantics,
not replayed.

Scale: matched vocabulary terms are collected driver-side before the
postings lookup — bounded by the deletion neighborhood of one query term
(tens of terms), the same bounded-collect rule as the WAND keep-set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants_col(term_col):
    """array<string>: the term plus every single-character deletion."""
    t = term_col
    return F.array_union(
        F.array(t),
        F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.concat(
                t.substr(F.lit(1), i - 1), t.substr(i + 1, F.length(t))
            ),
        ),
    )


def _py_deletion_variants(term: str) -> list[str]:
    return sorted({term} | {term[:i] + term[i + 1 :] for i in range(len(term))})


def fuzzy_terms(index, query_term: str, max_dist: int = 1) -> DataFrame:
    """(term, df, cf) vocabulary terms within ``max_dist`` edits of
    ``query_term``. Only ``max_dist=1`` is supported — the depth-1
    deletion neighborhood is only recall-complete there (SymSpell uses
    depth-k deletions for distance k)."""
    if max_dist != 1:
        raise ValueError(
            "fuzzy_terms supports max_dist=1 (depth-1 deletion variants "
            "are recall-complete only at edit distance 1)"
        )
    spark = index.term_stats.sparkSession
    qv = F.broadcast(
        spark.createDataFrame(
            [(v,) for v in _py_deletion_variants(query_term)], "variant string"
        )
    )
    cand = (
        index.term_stats.select(
            "term", "df", "cf",
            F.explode(deletion_variants_col(F.col("term"))).alias("variant"),
        )
        .join(qv, "variant")
        .select("term", "df", "cf")
        .distinct()
    )
    return cand.where(F.levenshtein(F.col("term"), F.lit(query_term)) <= max_dist)


def search_fuzzy(index, query_term: str, max_dist: int = 1) -> DataFrame:
    """(doc_id, n_fuzzy_terms): documents containing any vocabulary term
    within ``max_dist`` edits of ``query_term``, with the number of
    distinct such terms each contains."""
    matched = [r["term"] for r in fuzzy_terms(index, query_term, max_dist).collect()]
    if not matched:
        spark = index.term_stats.sparkSession
        return spark.createDataFrame([], "doc_id string, n_fuzzy_terms long")
    # postings_for_terms already applies the delete filter on both backends
    # (doc_id-keyed on the logical index, ordinal-keyed on the artifact — a
    # second doc_id-level filter here would wrongly drop upserted doc_ids)
    post = index.postings_for_terms(matched, positional=False)
    return post.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_fuzzy_terms")
    )


MAX_EXPANDED_TERMS = 1024  # Lucene's default maxClauseCount — same role


def prefix_terms(index, prefix: str, max_terms: int = MAX_EXPANDED_TERMS) -> DataFrame:
    """(term, df, cf) vocabulary terms starting with ``prefix``.

    The ``startswith`` predicate pushes into the term-stats scan (parquet
    StartsWith pushdown; on the artifact the stats table is term-sorted,
    so row groups outside the prefix range never read). Expansion is
    capped at ``max_terms`` — Lucene's maxClauseCount guard — because a
    one-letter prefix on a web-scale vocabulary is a user error, not a
    query plan.
    """
    if not prefix:
        raise ValueError("empty prefix")
    out = index.term_stats.where(F.col("term").startswith(prefix))
    n = out.limit(max_terms + 1).count()
    if n > max_terms:
        raise ValueError(
            f"prefix '{prefix}' expands to >{max_terms} terms "
            "(maxClauseCount guard) — use a longer prefix"
        )
    return out.select("term", "df", "cf")


def search_prefix(
    index, prefix: str, max_terms: int = MAX_EXPANDED_TERMS
) -> DataFrame:
    """(doc_id, n_prefix_terms): documents containing any term starting
    with ``prefix``, with the count of distinct such terms they contain."""
    matched = [r["term"] for r in prefix_terms(index, prefix, max_terms).collect()]
    if not matched:
        spark = index.term_stats.sparkSession
        return spark.createDataFrame([], "doc_id string, n_prefix_terms long")
    post = index.postings_for_terms(matched, positional=False)
    return post.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_prefix_terms")
    )


def regex_terms(
    index, pattern: str, max_terms: int = MAX_EXPANDED_TERMS
) -> DataFrame:
    """(term, df, cf) vocabulary terms matching ``pattern`` — Lucene
    RegexpQuery semantics: the pattern is anchored and must match the
    WHOLE term (``rlike`` with ``^(?:...)$`` wrapping).

    Unlike a prefix, a regex predicate cannot push into the parquet scan
    — but the scan is the TERM-STATS table (vocabulary-sized, orders of
    magnitude smaller than the corpus), so a full vocabulary pass is the
    correct cost class; the match then drives a term-IN postings lookup
    like every other expansion operator. Expansion is capped Lucene-style
    (maxClauseCount). Keep patterns in the Java-regex ∩ RE2 subset
    (alternation, classes, quantifiers — the textops/pii rule) so DuckDB
    oracles can replay them verbatim.
    """
    if not pattern:
        raise ValueError("empty pattern")
    out = index.term_stats.where(F.col("term").rlike(f"^(?:{pattern})$"))
    n = out.limit(max_terms + 1).count()
    if n > max_terms:
        raise ValueError(
            f"pattern '{pattern}' expands to >{max_terms} terms "
            "(maxClauseCount guard) — tighten the pattern"
        )
    return out.select("term", "df", "cf")


def search_regex(
    index, pattern: str, max_terms: int = MAX_EXPANDED_TERMS
) -> DataFrame:
    """(doc_id, n_regex_terms): documents containing any vocabulary term
    fully matching ``pattern``, with the count of distinct such terms."""
    matched = [r["term"] for r in regex_terms(index, pattern, max_terms).collect()]
    if not matched:
        spark = index.term_stats.sparkSession
        return spark.createDataFrame([], "doc_id string, n_regex_terms long")
    post = index.postings_for_terms(matched, positional=False)
    return post.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_regex_terms")
    )


def fuzzy_terms_multi(index, query_terms: list[str]) -> DataFrame:
    """(qterm, term, df, cf): edit-distance-1 vocabulary matches for MANY
    probe terms in ONE variant join — the vocabulary explodes once however
    many terms are probed (a per-term loop would re-explode it per term)."""
    spark = index.term_stats.sparkSession
    qv = F.broadcast(
        spark.createDataFrame(
            [(t, v) for t in sorted(set(query_terms))
             for v in _py_deletion_variants(t)],
            "qterm string, variant string",
        )
    )
    cand = (
        index.term_stats.select(
            "term", "df", "cf",
            F.explode(deletion_variants_col(F.col("term"))).alias("variant"),
        )
        .join(qv, "variant")
        .select("qterm", "term", "df", "cf")
        .distinct()
    )
    return cand.where(F.levenshtein(F.col("term"), F.col("qterm")) <= 1)


def correct_query_terms(index, query: str) -> list[tuple[str, str]]:
    """[(analyzed term, corrected term)] — "did you mean" per query term.

    Terms present in the vocabulary map to themselves; unknown terms map
    to the closest vocabulary term within edit distance 1 (tiebreak:
    highest document frequency, then lexicographic — the common
    spell-correction heuristic), or stay unchanged if nothing is within
    distance 1. ALL unknown terms share one batched variant join
    (fuzzy_terms_multi) plus one bounded stats lookup — the interactive
    path costs two Spark jobs regardless of query length.
    """
    terms = index.analyze_query(query)
    if not terms:
        return []
    stats = index.query_term_stats(sorted(set(terms)))
    unknown = sorted({t for t in terms if stats.get(t, (0, 0))[0] == 0})
    best: dict[str, str] = {}
    if unknown:
        by_q: dict[str, list] = {}
        for r in fuzzy_terms_multi(index, unknown).collect():
            by_q.setdefault(r["qterm"], []).append(r)
        for qt, cands in by_q.items():
            best[qt] = sorted(cands, key=lambda r: (-r["df"], r["term"]))[0]["term"]
    return [(t, best.get(t, t)) for t in terms]


def search_bm25_corrected(index, query: str, k: int | None = None) -> DataFrame:
    """BM25 over the spell-corrected query (correct_query_terms), the
    composed "did you mean" retrieval path. Ranking itself is the stock
    BM25 plan; correction adds only driver-side vocabulary lookups."""
    corrected = [c for _, c in correct_query_terms(index, query)]
    return index.search_bm25(corrected, k)


def suggest_terms(
    index, prefix: str, k: int = 10, max_terms: int = MAX_EXPANDED_TERMS
) -> DataFrame:
    """Query autocomplete: the top-``k`` vocabulary completions of
    ``prefix`` ranked by document frequency (df desc, term asc — a total
    order, terms are unique). Rides prefix_terms, so the StartsWith
    predicate reaches the term-stats scan (term-sorted artifact stats →
    row-group pruning) and the Lucene-style expansion cap still guards
    one-letter prefixes. Returns ``(term, df, cf)``."""
    return (
        prefix_terms(index, prefix, max_terms)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
