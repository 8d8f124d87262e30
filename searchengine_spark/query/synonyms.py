"""Synonym-aware BM25 (Lucene SynonymQuery semantics).

Each query term expands to a synonym group scored as ONE pseudo-term:

    tf_g(d)  = sum over members t of tf(t, d)      [blended frequency]
    df_g     = |{d : any member occurs in d}|      [union document freq]
    score    = BM25 over (tf_g, df_g) with corpus-global dl/avgdl

— NOT a boolean OR of independently-scored terms: scoring members
independently would let a document stuff every synonym variant and get
idf credit k times for one concept (Lucene's SynonymQuery/BM25
"blended frequency" rationale). qtf counts query occurrences per group.

The synonym map is over ANALYZED terms; ``compile_synonyms`` maps a
surface-form dictionary through the index's analyzer (Porter is not
idempotent, so surface forms must be analyzed exactly once — the same
rule query/feedback.py follows for expansion terms).

Plan shape: ONE ``postings_for_terms`` scan over the union vocabulary
(term filter below the artifact decode barrier), broadcast term->group
map, per-(doc, group) blended-tf aggregate; df_g is the union posting-
list size, which no precomputed per-term stats table can answer, so it
costs one extra pass over the SAME term-filtered scan (a groupBy(group)
count of the grouped frame) — O(|union terms| postings), never a corpus
scan. Per-doc partials fold in sorted-group order (the engine's
bit-identity idiom).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranked import bm25_idf


def compile_synonyms(index, mapping: dict[str, list[str]]) -> dict[str, list[str]]:
    """Map a surface-form synonym dictionary through the index analyzer:
    {analyzed key term: sorted unique analyzed member terms (key included)}.
    Surface forms that analyze to nothing (stop words) drop; a multi-token
    surface synonym contributes each of its tokens."""
    out: dict[str, list[str]] = {}
    for surface, syns in mapping.items():
        keys = index.analyze_query(surface)
        if not keys:
            continue
        members = set(keys)
        for s in syns:
            members.update(index.analyze_query(s))
        for kt in keys:
            group = sorted(members | set(out.get(kt, ())))
            out[kt] = group
    return out


def search_bm25_synonyms(
    index,
    query: str,
    synonyms: dict[str, list[str]],
    k: int | None = None,
) -> DataFrame:
    """BM25 with per-term synonym groups. ``synonyms`` maps an ANALYZED
    query term to its group members (use ``compile_synonyms`` to build it
    from surface forms); terms without an entry score as singleton groups
    (plain BM25 semantics for them). Returns (doc_id, score)."""
    qtf = Counter(index.analyze_query(query))
    if not qtf or k == 0:
        return index.spark.createDataFrame([], "doc_id string, score double")
    # group id = the query term it expands; members de-duplicated; a term
    # shared by two groups would double-count, so reject that outright
    groups = {t: sorted(set(synonyms.get(t, [])) | {t}) for t in sorted(qtf)}
    seen: dict[str, str] = {}
    for gid, members in groups.items():
        for m in members:
            if m in seen and seen[m] != gid:
                raise ValueError(
                    f"term {m!r} belongs to groups {seen[m]!r} and {gid!r}; "
                    "overlapping synonym groups double-count postings"
                )
            seen[m] = gid
    union_terms = sorted(seen)
    gmap = index.spark.createDataFrame(
        sorted(seen.items()), "term string, gid string"
    )
    post = index.postings_for_terms(union_terms, positional=False)
    grouped = (
        post.join(F.broadcast(gmap), "term")
        .groupBy("doc_id", "gid")
        .agg(F.sum("tf").alias("tf"), F.max("dl").alias("dl"))
    )
    # union df per group: one small aggregate over the grouped frame
    # (recomputes the term-filtered scan — the price of union statistics)
    df_g = {
        r["gid"]: r["df"]
        for r in grouped.groupBy("gid").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    weights = [
        (gid, int(qtf[gid]), bm25_idf(index.n_docs, df_g[gid]))
        for gid in sorted(qtf)
        if df_g.get(gid, 0) > 0
    ]
    if not weights:
        return index.spark.createDataFrame([], "doc_id string, score double")
    qdf = index.spark.createDataFrame(weights, "gid string, qtf int, idf double")
    k1, b = float(index.k1), float(index.b)
    avgdl = float(index.avgdl) or 1.0
    tf = F.col("tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    partial = F.col("qtf") * F.col("idf") * tf * (k1 + 1.0) / norm
    scored = (
        grouped.join(F.broadcast(qdf), "gid")
        .select("doc_id", F.struct("gid", partial.alias("p")).alias("s"))
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("s")),
                F.lit(0.0),
                lambda acc, x: acc + x["p"],
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored
