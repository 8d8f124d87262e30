"""Line-level boilerplate removal (CCNet / RefinedWeb paragraph dedup).

Web-scraped training corpora repeat the same navigation bars, cookie
banners, copyright footers and newsletter prompts across thousands of
pages; CCNet (Wenzek et al. 2020) and RefinedWeb drop a LINE when its
normalized form recurs across enough documents, BEFORE quality scoring or
document-level dedup sees the text. The reference engine has no such
stage (it indexes pre-cleaned text, ``IcsSearchEngine.java:38-59`` reads
the already-"cleaned" corpus directory); this module is part of the
training-data-pipeline surface the brief adds on top of the reference's
operator set.

Semantics
---------
- A document is split on ``\\n``; each line's COUNTING key is its
  normalized form (trim + lowercase). The original line text is what
  survives into the output — normalization decides removal, it never
  rewrites text.
- A line is boilerplate when its normalized form occurs in at least
  ``min_docs`` DISTINCT documents (within-doc repeats count once).
- Lines whose normalized form is empty are NEVER boilerplate: blank
  lines keep their paragraph structure no matter how common they are.
- Surviving lines are re-joined with ``\\n`` in their original order; a
  document whose every line was removed keeps an empty string.

Scale shape (the 100 TB contract)
---------------------------------
1. One exploded ``(line_norm, doc)`` distinct + one combinable count
   aggregate builds the line-frequency table — cardinality is the number
   of DISTINCT nonblank lines, and the distinct is map-side combinable
   per partition before the exchange.
2. The boilerplate set (lines with count >= min_docs) is SMALL by
   construction — high-frequency lines are few — so the removal filter
   is a broadcast anti-join against it (``broadcast_boiler=False``
   falls back to a shuffled anti-join if a pathological corpus makes it
   large).
3. Reassembly is ONE doc-keyed aggregate using the engine's sorted-fold
   idiom (collect struct(idx, line), array_sort, join) — deterministic
   under any partitioning — plus a doc-keyed left join back to the
   per-doc line counts. No per-row Python anywhere; every expression is
   JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(line_col):
    """Counting key: trim + lowercase (decides removal only)."""
    return F.lower(F.trim(line_col))


def line_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(line_norm, n_docs)``: distinct-document frequency of every
    nonblank normalized line. One distinct + one combinable aggregate."""
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    )
    return (
        lines.select(_norm(F.col("__line")).alias("line_norm"), "__id")
        .where(F.col("line_norm") != "")
        .distinct()
        .groupBy("line_norm")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    broadcast_boiler: bool = True,
) -> DataFrame:
    """Remove lines whose normalized form occurs in >= ``min_docs``
    distinct documents.

    Returns ``id_col``, the cleaned ``text`` (surviving lines re-joined
    with ``\\n`` in original order; empty string when nothing survives),
    ``n_lines`` (pre-filter line count) and ``n_removed``.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    boiler = line_frequencies(df, id_col, text_col).where(
        F.col("n_docs") >= F.lit(min_docs)
    ).select("line_norm")
    if broadcast_boiler:
        boiler = F.broadcast(boiler)

    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__idx", "__line"),
    )
    kept = lines.join(
        boiler,
        _norm(lines["__line"]) == boiler["line_norm"],
        "left_anti",
    )
    # sorted-fold reassembly: __idx is unique per doc => total order, so
    # the rebuilt text is identical under any partitioning
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return base.join(
        rebuilt, base[id_col] == rebuilt["__id"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
    )


def boilerplate_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Like :func:`strip_boilerplate` but returns ``text_md5`` instead of
    the cleaned text — the cross-engine hash-comparable form used by the
    driver-contract registry (md5 is identical in Spark and DuckDB)."""
    out = strip_boilerplate(df, id_col, text_col, min_docs)
    return out.select(
        F.col(id_col),
        F.md5(F.col("text")).alias("text_md5"),
        "n_lines",
        "n_removed",
    )
