"""Deterministic stratified sampling for training-data mixes.

Given per-label quotas (e.g. "25k docs of en, 10k of zh, ..."), pick for
each label the quota-many documents with the SMALLEST ``md5(id)`` —
a deterministic, engine-independent pseudo-random order (md5 of the id's
decimal string is identical in Spark and DuckDB, so the DuckDB oracle
reproduces the exact sample). Labels absent from the quota map are
dropped; a quota larger than the label's population takes everything.

Scale shape (the reason this is not just one window):
a single ``row_number() OVER (PARTITION BY label ORDER BY hash)`` must
fully sort EVERY label's rows — at 10^12 documents with a handful of
labels that is a total sort of the corpus inside a handful of reducers,
with hot-label skew on top. Instead we take the classic salted two-phase
top-n:

  phase 1: window over (label, salt) — S× more, S× smaller partitions,
           each emitting at most ``quota`` survivors;
  phase 2: window over (label) on the ≤ S·quota survivors only.

Phase 2's input is bounded by S·quota per label regardless of corpus
size, so the full-corpus sort never happens; correctness is exact
because every member of the global per-label top-q is the top-q of its
own salt bucket. Quotas ride along via a broadcast join.

``shard`` (the first two hex chars of the same md5 — 256 values) gives a
stable train-shard assignment for free; downstream writers can
``partitionBy("shard")`` without another hash pass.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def sample_order_key(id_col) -> "F.Column":
    """The deterministic pseudo-random sort key: md5 of the id rendered as
    a decimal string (cross-engine reproducible; see module docstring)."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    quotas: Mapping[str, int],
    label_col: str = "lang",
    id_col: str = "doc_id",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Deterministic per-label quota sample.

    Returns ``label_col``, ``id_col``, ``shard`` (2-hex-char stable shard
    key). Exactly the quota-many smallest-``md5(id)`` rows per label
    (fewer if the label has fewer rows); labels not in ``quotas`` are
    dropped before any shuffle.
    """
    spark = df.sparkSession
    quota_df = F.broadcast(
        spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(quotas.items())],
            f"{label_col} string, __quota int",
        )
    )
    h = sample_order_key(id_col)
    base = (
        df.select(F.col(label_col), F.col(id_col), h.alias("__h"))
        # inner join: drops unlisted labels pre-shuffle, quota rides along
        .join(quota_df, label_col)
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(label_col, salt).orderBy("__h", id_col)
    survivors = base.withColumn("__rn", F.row_number().over(w1)).where(
        F.col("__rn") <= F.col("__quota")
    )
    w2 = Window.partitionBy(label_col).orderBy("__h", id_col)
    return (
        survivors.withColumn("__rn2", F.row_number().over(w2))
        .where(F.col("__rn2") <= F.col("__quota"))
        .select(
            F.col(label_col),
            F.col(id_col),
            F.substring("__h", 1, 2).alias("shard"),
        )
    )


def training_mix(
    df: DataFrame,
    quotas: Mapping[str, int],
    label_col: str = "lang",
    id_col: str = "doc_id",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Stratified sample plus per-label achieved counts.

    Same rows as :func:`stratified_sample` with an extra ``n_label``
    column (how many rows the label actually yielded — equals the quota
    unless the label ran short), which is what mix-budgeting dashboards
    want without a second pass.
    """
    picked = stratified_sample(df, quotas, label_col, id_col, salt_buckets)
    w = Window.partitionBy(label_col)
    return picked.withColumn("n_label", F.count("*").over(w).cast("long"))


def temperature_quotas(
    df: DataFrame,
    total: int,
    alpha: float = 0.5,
    label_col: str = "lang",
) -> dict:
    """Temperature-scaled mixture quotas (the multilingual-sampling rule of
    Conneau & Lample 2019 / the data-mixing knob DoReMi tunes around):
    label weights ``w_l ∝ n_l^alpha`` normalized to ``total`` rows.
    ``alpha = 1`` reproduces the corpus's natural proportions, ``alpha = 0``
    is uniform over labels; in between, low-resource labels are UP-sampled
    relative to their share. Integerization is deterministic largest-
    remainder (Hamilton) apportionment with lexicographic label
    tie-break, and each quota is capped at the label's actual count (the
    sampler can't mint rows); leftover capacity from capped labels is NOT
    redistributed — callers see the true achievable mix. One count
    aggregate + O(labels) driver math; feed the result to
    :func:`stratified_sample` / :func:`training_mix`."""
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        r[label_col]: r["n"]
        for r in df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return {}
    weights = {l: float(n) ** alpha for l, n in counts.items()}
    # sum in sorted-label order: z must not depend on dict insertion order
    # (float addition is order-sensitive; the SQL twin is a 5-term sum too)
    z = sum(weights[l] for l in sorted(weights, key=str))
    raw = {l: total * w / z for l, w in weights.items()}
    base = {l: int(raw[l]) for l in raw}
    short = total - sum(base.values())
    # largest remainder, ties to the lexicographically smaller label
    order = sorted(raw, key=lambda l: (-(raw[l] - base[l]), str(l)))
    for l in order[:short]:
        base[l] += 1
    return {l: min(base[l], counts[l]) for l in sorted(base, key=str)}
