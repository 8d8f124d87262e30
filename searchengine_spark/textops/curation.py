"""Corpus-level curation stages: per-source gating and perplexity buckets.

Two standard web-corpus curation steps the per-document quality gates
(quality.py) don't cover because they aggregate ACROSS documents:

- **Source curation** (C4 / RefinedWeb domain filtering): score each
  source/domain by its aggregate behavior — document count, exact-dup
  rate within the source, mean analyzed length — and gate whole sources,
  not documents. One ``groupBy(source)`` aggregate (count-distinct of the
  text hash is two-phase combinable), then a broadcast semi-join of the
  surviving source list back onto the corpus: per-source cardinality is
  #domains, always tiny next to the corpus, so the gate costs one
  aggregate + one map-side filter at any scale.

- **Perplexity buckets** (CCNet head/middle/tail): split each language's
  documents into quality terciles by LM perplexity (textops/lm.py). NOT
  implemented as an ntile window — a per-language window is a
  single-reducer sort per language at corpus scale. Instead: one per-lang
  aggregate computes the two interpolated tercile cutpoints, broadcast,
  and bucket assignment is a stateless comparison — aggregate + map, no
  global sort. Cross-engine determinism of the comparison: perplexities
  are 6dp-rounded (lm_score's contract — a 1e-6 value lattice), and the
  interpolated cutpoint is rounded to 8dp on BOTH sides before comparing.
  Engines agree on the raw cut within a few ulp (~1e-13), far inside the
  0.5e-8 rounding cell, so the 8dp cuts are bit-identical; an 8dp cut vs
  1e-6-lattice data comparison can then never flip between engines (the
  raw-cut hazard is interpolation landing within ulp of a data value —
  ``p*(n-1)`` with p = 1/3 in binary gives frac 0.99999..., putting the
  cut one ulp under an order statistic in one engine and ON it in the
  other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# source gates (shared with the oracle SQL)
SRC_MIN_AVG_DL = 50.0
SRC_MAX_DUP_RATE = 0.2

# CCNet tercile fractions — Python-evaluated ONCE so Spark and the SQL
# twin inline bit-identical double literals
TERCILES = (1.0 / 3.0, 2.0 / 3.0)
BUCKET_NAMES = ("head", "middle", "tail")  # low perplexity = head


def source_stats(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    dl_col: str = "dl",
) -> DataFrame:
    """Per-source aggregates: (source, n_docs, n_unique_texts, dup_rate,
    avg_dl). ``dl_col`` is the caller's analyzed doc length column (kept
    an input so the analyzer choice stays with the caller)."""
    return df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).cast("long").alias(
            "n_unique_texts"
        ),
        (
            F.lit(1.0)
            - F.countDistinct(F.md5(F.col(text_col)))
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
        F.avg(dl_col).alias("avg_dl"),
    )


def curate_sources(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    dl_col: str = "dl",
    min_avg_dl: float = SRC_MIN_AVG_DL,
    max_dup_rate: float = SRC_MAX_DUP_RATE,
) -> tuple[DataFrame, DataFrame]:
    """Returns (stats_with_kept_flag, surviving_rows_of_df).

    A source survives when its mean analyzed length clears ``min_avg_dl``
    AND its exact-dup rate stays under ``max_dup_rate``. The surviving-row
    frame is a broadcast left-semi join against the kept source list."""
    stats = source_stats(df, source_col, text_col, dl_col).withColumn(
        "kept",
        (F.col("avg_dl") >= min_avg_dl)
        & (F.col("dup_rate") <= max_dup_rate),
    )
    kept = stats.where("kept").select(source_col)
    return stats, df.join(F.broadcast(kept), source_col, "left_semi")


def perplexity_buckets(
    scored: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "perplexity",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head/middle/tail assignment per language.

    ``scored`` must carry ``(id_col, lang_col, ppl_col)`` with non-NULL
    perplexity (drop n_bigrams=0 docs first — a doc the LM never scored
    has no quality signal). Returns the input columns plus ``bucket``.
    """
    scored = scored.where(F.col(ppl_col).isNotNull())
    cuts = scored.groupBy(lang_col).agg(
        F.round(
            F.percentile(F.col(ppl_col), F.lit(TERCILES[0])), 8
        ).alias("cut1"),
        F.round(
            F.percentile(F.col(ppl_col), F.lit(TERCILES[1])), 8
        ).alias("cut2"),
    )
    return scored.join(F.broadcast(cuts), lang_col).select(
        F.col(id_col),
        F.col(lang_col),
        F.col(ppl_col),
        F.when(F.col(ppl_col) <= F.col("cut1"), F.lit(BUCKET_NAMES[0]))
        .when(F.col(ppl_col) <= F.col("cut2"), F.lit(BUCKET_NAMES[1]))
        .otherwise(F.lit(BUCKET_NAMES[2]))
        .alias("bucket"),
    )
