"""KMV (k-minimum-values) distinct-count sketch.

The mergeable-cardinality role HyperLogLog plays in production pipelines
(reference engines expose it as approx-distinct aggregates), built here as
a KMV bottom-k sketch instead because KMV is DETERMINISTIC given the hash
function: keep the k smallest 48-bit md5-prefix hashes of the distinct
values; if fewer than k distinct values exist the sketch IS the exact
answer, otherwise estimate ``(k-1) / u_k`` where ``u_k`` is the k-th
smallest hash normalized to (0, 1] (Bar-Yossef et al. 2002). That makes
the whole estimate replayable bit-for-bit in DuckDB — an oracle-checkable
sketch, which HLL's engine-specific register layouts never are.

Scale shape: the inner ``distinct`` is a combinable map-side
pre-aggregate; the per-group bottom-k is one shuffle on the group key
with a ``row_number() <= k`` cut (k rows per group survive); the global
(ungrouped) form compiles to TakeOrderedAndProject — partial top-k per
partition, never a full sort. Sketches merge by unioning hash sets and
re-cutting to k, so per-partition / per-day sketches combine without
rescanning — the property that matters at 10^12 rows.

Determinism of the estimate double: the numerator ``(k-1) * 2^48`` is an
exact small-mantissa float (k <= 2^10 keeps it under 58 bits with 48
trailing zeros), inlined as ONE literal in both engines, so the estimate
is a single IEEE division with identical operands — no rounded-sum or
expression-reassociation risk at comparison time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 256  # sketch size; shared with the oracle SQL
_HASH_SPACE = 1 << 48  # md5 48-bit prefix space


def kmv_hash(col: F.Column) -> F.Column:
    """48-bit md5-prefix hash as a long — cross-engine identical (DuckDB:
    ``('0x' || substr(md5(x), 1, 12))::BIGINT``; same idiom as
    textops/dsir feature bucketing)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _estimate(n_seen: F.Column, hk: F.Column, k: int) -> F.Column:
    """KMV estimator: exact below k, (k-1)/u_k at k. ``hk`` is the k-th
    smallest hash (== max of the kept set). hk = 0 would mean u_k = 0 —
    impossible to divide; with 48-bit hashes P(h=0 among the k smallest
    of a real corpus) is 2^-48-scale, but ANSI mode turns any reachable
    /0 into a job abort, so guard it to the exact count."""
    num = F.lit(float((k - 1) * _HASH_SPACE))
    return (
        F.when((n_seen < k) | (hk <= 0), n_seen.cast("double"))
        .otherwise(num / hk.cast("double"))
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Distinct-count estimate of ``value_col``, optionally per group.

    Returns ``group_cols + (n_kept: bigint, est: double)`` — ``n_kept`` is
    the sketch fill (== exact distinct count whenever it is < k). NULL
    values are ignored (SQL count-distinct semantics).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_cols or [])
    d = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, kmv_hash(F.col(value_col)).alias("h"))
        .distinct()
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy("h")
        kept = d.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= k
        )
        agg = kept.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk")
        )
    else:
        # global form: TakeOrdered k, never a full sort
        kept = d.orderBy("h").limit(k)
        agg = kept.agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk")
        )
    return agg.select(
        *groups,
        F.col("n_kept").cast("long").alias("n_kept"),
        _estimate(F.col("n_kept"), F.col("hk"), k).alias("est"),
    )


def py_kmv_distinct(values, k: int = KMV_K) -> tuple[int, float]:
    """Pure-python twin (differential-test reference): (n_kept, est)."""
    import hashlib

    hs = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
            for v in values
            if v is not None
        }
    )[:k]
    if len(hs) < k or (hs and hs[-1] <= 0):
        return len(hs), float(len(hs))
    return k, float((k - 1) * _HASH_SPACE) / float(hs[-1])
