"""Verbatim-span overlap analysis (suffix-dedup style).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") dedups on LONG verbatim substrings via a suffix array — a
data structure with no distributed analogue. The scalable equivalent
blocks on K-token shingles: two documents sharing a ≥(K+m−1)-token
verbatim span necessarily share ≥m distinct K-shingles, so
``shared_span_pairs(k, min_shared=m)`` is a recall-complete candidate
detector for long verbatim overlap (the converse — m scattered shared
shingles without one long span — is the usual candidate-then-verify
false-positive, cheap to verify on the pair set).

The ``max_shingle_df`` cap drops shingles occurring in more than that
many docs — boilerplate/stop-phrase guard AND the scale bound: each
surviving shingle contributes at most C(max_df, 2) pairs, so candidate
pairs are O(#distinct shingles · max_df²) — linear in corpus size for a
fixed cap, never the n² of an uncapped self-join. (The same
frequency-capping move as the SimHash chunk tables and MinHash bands.)

Shingle keys are the literal space-joined token strings so the DuckDB
oracle replays them verbatim; at 10^12-doc scale swap the key projection
to ``xxhash64(sh)`` (collision probability ~n²/2^64) to shrink the
shuffle — a one-line change that alters no plan shape.

All shingle extraction is a zero-shuffle array projection
(``dedup.word_ngrams`` — the repo's single definition of the windowing
arithmetic — via ``word_shingles``); the pair join and both aggregates
are hash equi-joins / map-side-combinable counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def span_shingles(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(id, sh): each doc's DISTINCT K-token shingles, one row per pair.
    Docs with fewer than k tokens contribute no rows. The windowing
    arithmetic is dedup.word_ngrams — the module's single definition —
    via word_shingles, so a slice-bound fix there applies here too."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(F.col(tokens_col), k)).alias("sh")
    )


def shared_span_pairs(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 5,
    max_shingle_df: int = 20,
    min_shared: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) for doc pairs sharing >= ``min_shared``
    distinct K-shingles, counting only shingles present in 2..max_df docs.
    doc_a < doc_b; deterministic."""
    # persisted because three consumers (the df-count aggregate and both
    # self-join sides) would otherwise each recompute the corpus scan +
    # explode; micro-frame relative to the corpus, evicted LRU — callers
    # may unpersist after materializing (the dedup.py convention)
    shing = span_shingles(df, tokens_col, id_col, k).persist()
    elig = (
        shing.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .where((F.col("dfc") >= 2) & (F.col("dfc") <= max_shingle_df))
        .select("sh")
    )
    es = shing.join(elig, "sh")
    a = es.select("sh", F.col(id_col).alias("doc_a"))
    b = es.select("sh", F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "sh")
        .where(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def duplication_score(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(id, n_shingles, dup_frac): per-doc fraction of its distinct
    K-shingles that occur in at least one OTHER doc — the per-document
    duplication signal used to rank removal candidates. Docs with fewer
    than k tokens get n_shingles = 0 and NULL dup_frac."""
    shing = span_shingles(df, tokens_col, id_col, k).persist()
    dfc = shing.groupBy("sh").agg(F.count(F.lit(1)).alias("dfc"))
    per_doc = (
        shing.join(dfc, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("dfc") >= 2).cast("long")).alias("n_dup"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            (F.col("n_dup").cast("double") / F.col("n_shingles")).alias(
                "dup_frac"
            ),
        )
    )
