"""N-gram overlap evaluation (ROUGE-N / BLEU-style clipped precision).

Training-pipeline eval: score candidate texts against reference texts by
clipped n-gram multiset overlap — the standard summary/translation
surface-overlap family (ROUGE-N recall, BLEU-n clipped precision, F1).
Used at corpus scale to score model outputs against gold references, or
distilled/rewritten corpora against their originals.

Definition per (candidate, reference) pair, over the frozen analyzer's
token stream (analysis/tokenizers.punctuation_tokenize — same tokens the
index uses, so eval and retrieval agree on what a "word" is):

    overlap = sum_g min(count_cand(g), count_ref(g))   (clipped match)
    precision = overlap / |cand n-grams|               (BLEU-style)
    recall    = overlap / |ref n-grams|                (ROUGE-N)
    f1        = 2PR / (P+R)

Plan shape: per-doc n-gram counts are ONE explode + groupBy over the
corpus (shared by both sides of every pair); pairs then hash-equi-join
each side's counts on (doc_id, gram) — the clipped intersection is a join
keyed by the pair's grams, never a cross product, and each pair is
independent (embarrassingly parallel at 10^12 pairs). No per-row Python
anywhere: n-grams are JVM ``transform``/``slice`` expressions.

ANSI guards (CLAUDE.md): short texts yield zero n-grams, so every ratio is
``F.when(denom > 0, ...)`` — a division by zero must not abort a 100 TB
eval job. Pairs where either side has zero n-grams report 0.0 metrics.

Determinism: overlap and totals are exact integers; P/R/F1 are the same
IEEE-double expressions on both engines from identical integers, rounded
at 6dp only in the driver entry (entry_queries.eval_ngram_overlap_q).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_col(tokens: Column, n: int) -> Column:
    """Space-joined n-gram *instances* of a token-array column (duplicates
    kept; empty array when the doc has fewer than n tokens). Delegates to
    ``dedup.word_ngrams`` — the codebase's single definition of the
    windowing arithmetic — so a slice-bound fix there reaches the eval
    metrics (and their oracle parity) too."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from .dedup import word_ngrams

    return word_ngrams(tokens, n)


def ngram_counts(
    docs: DataFrame, n: int, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Per-doc n-gram multiset: (doc_id, gram, cnt). One explode + one
    combinable aggregate; docs shorter than n tokens contribute no rows."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(ngram_col(F.col(tokens_col), n)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_overlap_eval(
    pairs: DataFrame,
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Clipped n-gram overlap metrics for (cand_id, ref_id) pairs.

    ``pairs``: (pair_id, cand_id, ref_id); ``docs``: (id_col, tokens_col)
    holding BOTH sides' analyzed token arrays.

    Returns (pair_id, cand_id, ref_id, overlap, cand_total, ref_total,
    precision, recall, f1) — integers exact, ratios unrounded doubles
    (0.0 when a side has no n-grams).
    """
    counts = ngram_counts(docs, n, id_col, tokens_col)
    totals = counts.groupBy("doc_id").agg(F.sum("cnt").alias("total"))

    cand = counts.select(
        F.col("doc_id").alias("cand_id"),
        "gram",
        F.col("cnt").alias("c_cnt"),
    )
    ref = counts.select(
        F.col("doc_id").alias("ref_id"), "gram", F.col("cnt").alias("r_cnt")
    )
    # clipped intersection: join the two sides' counts through the pair
    # table on (pair, gram); min() clips repeats the reference lacks
    ov = (
        pairs.join(cand, "cand_id")
        .join(ref, ["ref_id", "gram"])
        .groupBy("pair_id")
        .agg(F.sum(F.least("c_cnt", "r_cnt")).alias("overlap"))
    )
    out = (
        pairs.join(ov, "pair_id", "left")
        .join(
            totals.select(
                F.col("doc_id").alias("cand_id"),
                F.col("total").alias("cand_total"),
            ),
            "cand_id",
            "left",
        )
        .join(
            totals.select(
                F.col("doc_id").alias("ref_id"),
                F.col("total").alias("ref_total"),
            ),
            "ref_id",
            "left",
        )
        .select(
            "pair_id",
            "cand_id",
            "ref_id",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.coalesce("cand_total", F.lit(0)).cast("long").alias("cand_total"),
            F.coalesce("ref_total", F.lit(0)).cast("long").alias("ref_total"),
        )
    )
    prec = F.when(
        F.col("cand_total") > 0, F.col("overlap") / F.col("cand_total")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("ref_total") > 0, F.col("overlap") / F.col("ref_total")
    ).otherwise(F.lit(0.0))
    out = out.withColumn("precision", prec).withColumn("recall", rec)
    return out.withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2.0 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def py_ngram_overlap(
    cand_tokens: list[str], ref_tokens: list[str], n: int
) -> tuple[int, int, int]:
    """Pure-python twin (differential-test reference):
    (overlap, cand_total, ref_total)."""
    from collections import Counter

    def grams(toks: list[str]) -> Counter:
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    c, r = grams(cand_tokens), grams(ref_tokens)
    overlap = sum(min(cnt, r[g]) for g, cnt in c.items())
    return overlap, sum(c.values()), sum(r.values())
