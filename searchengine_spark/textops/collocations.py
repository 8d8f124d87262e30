"""Collocation mining: top adjacent-bigram PMI over a token corpus.

Pointwise mutual information of an adjacent token pair::

    pmi(x, y) = ln( (c_xy / T2) / ( (c_x / T1) * (c_y / T1) ) )

with ``c_xy`` the count of adjacent instances (x, y), ``T2`` the total
bigram-instance count, ``c_x``/``c_y`` unigram instance counts and ``T1``
the total token count. A ``min_count`` floor on ``c_xy`` suppresses the
low-frequency PMI explosion (the classic Church & Hanks 1990 guard).

Corpus-analysis surface for a training-data pipeline: high-PMI pairs are
multiword expressions / boilerplate markers worth protecting from (or
targeting with) tokenizer merges and dedup shingles; the reference engine
exposes term stats only (Q8), no co-occurrence.

Scale shape: the bigram extraction is a zero-shuffle array projection
(same ``F.get``-window form as lm.py — ``element_at`` would throw under
ANSI mode); then ONE (x, y)-keyed count aggregate and ONE token-keyed
count aggregate, both fully map-side combinable and vocabulary-bounded;
unigram counts join back onto the bigram table by token key (hash
equi-joins on vocabulary-sized frames — never a nested-loop). Both count
frames are persisted, so the corpus pays exactly TWO explode+aggregate
passes; the scalar totals (T1 = Σ unigram counts, T2 = Σ pair counts)
then come free off the persisted frames via O(1) driver collects — the
same shape as build_index's avgdl and lm.py's vocab size, avoiding the
1-row crossJoin that would plan as BroadcastNestedLoop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import _bigram_instances


def pmi_collocations(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_n: int | None = 20,
) -> DataFrame:
    """(w1, w2, pair_count, pmi_r) — top-``top_n`` by 6dp-rounded PMI
    (ties broken on (w1, w2) so the cut is engine-independent)."""
    # both aggregates persisted (vocabulary- / vocab²-bounded, evicted
    # LRU — the dedup.py convention): the corpus pays exactly TWO
    # explode+aggregate passes; the scalar totals then come for free off
    # the persisted frames (t1 = Σ cw, t2 = Σ c12 — the same numbers a
    # third corpus scan over the token arrays would produce) and the two
    # PMI joins reuse uni instead of re-running its corpus pass each
    bg = _bigram_instances(df, tokens_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).persist()
    uni = (
        df.select(F.explode(F.col(tokens_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .persist()
    )
    t2 = float(c12.agg(F.sum("c12")).collect()[0][0] or 0.0)
    t1 = float(uni.agg(F.sum("cw")).collect()[0][0] or 0.0)
    pmi = F.log(
        (F.col("c12") / F.lit(t2))
        / ((F.col("c1x") / F.lit(t1)) * (F.col("c2x") / F.lit(t1)))
    )
    out = (
        c12.where(F.col("c12") >= min_count)
        .join(uni.withColumnRenamed("cw", "c1x"), F.col("w1") == F.col("w"))
        .drop("w")
        .join(uni.withColumnRenamed("cw", "c2x"), F.col("w2") == F.col("w"))
        .drop("w")
        .select(
            "w1",
            "w2",
            F.col("c12").alias("pair_count"),
            F.round(pmi, 6).alias("pmi_r"),
        )
        .orderBy(F.desc("pmi_r"), F.asc("w1"), F.asc("w2"))
    )
    return out.limit(top_n) if top_n is not None else out
