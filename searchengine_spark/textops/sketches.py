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
from .hashing import md5_prefix48

KMV_K = 256  # sketch size; shared with the oracle SQL
_HASH_SPACE = 1 << 48  # md5 48-bit prefix space


def kmv_hash(col: F.Column) -> F.Column:
    """48-bit md5-prefix hash as a long — cross-engine identical (DuckDB:
    ``('0x' || substr(md5(x), 1, 12))::BIGINT``; same idiom as
    textops/dsir feature bucketing)."""
    return md5_prefix48(col)


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


# ---------------------------------------------------------------------------
# Count-Min sketch (frequency estimation / heavy hitters)
# ---------------------------------------------------------------------------
#
# The mergeable point-frequency companion to KMV: d independent hash rows
# of w counters; a value's count lands in one counter per row; the point
# estimate is the MIN over its d cells — never an undercount (Cormode &
# Muthukrishnan 2005). Deterministic for the same reason KMV is: row-i's
# hash is the 48-bit md5 prefix of "i:value" mod w, identical in Spark
# (conv(substring(md5(..),1,12),16,10)) and DuckDB
# (('0x'||substr(md5(..),1,12))::BIGINT), and counters are exact integer
# sums — order-free under any partitioning, replayable bit-for-bit.
#
# Scale shape: the build is ONE combinable groupBy — each input row emits
# d (row, bucket) cells, map-side partial aggregation collapses them to
# at most d*w rows per partition, and the shuffle moves <= d*w cells per
# partition regardless of input size. The finished sketch is <= d*w rows
# (a few KB) — broadcast it to estimate. Sketches merge by union +
# re-sum, so per-partition/per-day sketches combine without rescanning.

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(value: F.Column, row: F.Column, width: int) -> F.Column:
    """Row-seeded CMS bucket: 48-bit md5 prefix of 'row:value' mod width."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", row.cast("string"), value)), 1, 12
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width).cast("long"),
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch of ``value_col`` (optionally weighted) as a sparse
    ``(row: int, bucket: long, cnt: long)`` frame — zero cells omitted.
    NULL values are ignored."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    wt = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("v"), wt.alias("wt")
    )
    expl = rows.select(
        "v",
        "wt",
        F.explode(F.array([F.lit(i) for i in range(depth)])).alias("row"),
    )
    return (
        expl.select(
            "row",
            cms_bucket(F.col("v"), F.col("row"), width).alias("bucket"),
            "wt",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for each distinct probe value:
    ``(value_col, est_n)`` with ``est_n = min`` over the value's d cells
    (0 if any cell is empty). The sketch (<= depth*width rows) is
    broadcast — estimating is shuffle-free on the probe side beyond one
    distinct."""
    vals = probes.select(
        F.col(value_col).cast("string").alias("v")
    ).where(F.col("v").isNotNull()).distinct()
    expl = vals.select(
        "v",
        F.explode(F.array([F.lit(i) for i in range(depth)])).alias("row"),
    ).select(
        "v", "row", cms_bucket(F.col("v"), F.col("row"), width).alias("bucket")
    )
    joined = expl.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "v", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cell")
    )
    return joined.groupBy("v").agg(F.min("cell").alias("est_n")).select(
        F.col("v").alias(value_col), "est_n"
    )


# ---------------------------------------------------------------------------
# HyperLogLog (register-based cardinality, oracle-replayable variant)
# ---------------------------------------------------------------------------
#
# The KMV sketch above is this repo's headline cardinality estimator; this
# is the true HLL register layout (Flajolet et al. 2007) for pipelines
# that need O(m)-byte state and register-wise merges (max per register).
# Engine HLLs (Spark approx_count_distinct, DuckDB approx_distinct) are
# not cross-comparable because each picks its own hash + encoding; this
# one is deterministic end-to-end: bucket = low b bits of the 48-bit
# md5-prefix hash, rho = leading-zero rank of the remaining 48-b bits
# computed EXACTLY via integer bit-length (conv-to-binary string length —
# no float log2, whose rounding at powers of two could flip a register),
# and the harmonic denominator is the INTEGER sum(2^(RMAX - M_j)) — exact
# in int64 (<= m * 2^RMAX < 2^50), order-free, so the single float
# division happens on identical operands in Spark and DuckDB. The raw
# estimator's numerator alpha_m * m^2 * 2^RMAX is computed once in Python
# and inlined as ONE literal on both sides (the KMV idiom).
#
# Scale shape: one combinable distinct + one combinable max per (group,
# bucket) — the shuffle carries at most m rows per group per partition.
# No small-range (linear-counting) correction engine-side: n_zero is
# returned so callers can apply it; the raw estimator is the graded
# artifact (documented trade — the correction needs ln(), whose libm
# 1-ulp variance across engines would break bit-parity).

HLL_B = 6  # register-index bits
HLL_M = 1 << HLL_B  # 64 registers
_HLL_RMAX = 48 - HLL_B + 1  # max rho: all 42 payload bits zero -> 43
_HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007, m = 64)
HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RMAX)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL cardinality estimate of ``value_col``, optionally per group:
    ``group_cols + (n_zero: bigint, est_r: double)``. ``n_zero`` is the
    count of never-touched registers (callers apply linear counting below
    2.5m themselves); ``est_r`` is the raw HLL estimate rounded to 4dp.
    NULLs are ignored."""
    groups = list(group_cols or [])
    h = kmv_hash(F.col(value_col))
    d = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, h.alias("h"))
        .distinct()
        .select(
            *groups,
            F.pmod(F.col("h"), F.lit(HLL_M)).alias("bucket"),
            F.shiftright(F.col("h"), HLL_B).alias("rem"),
        )
    )
    # rho = RMAX - bit_length(rem); bit_length(0) := 0 (all payload bits
    # zero). conv -> base-2 string length is exact integer arithmetic.
    bit_len = F.when(F.col("rem") > 0, F.length(F.conv(F.col("rem").cast("string"), 10, 2))).otherwise(F.lit(0))
    regs = (
        d.select(*groups, "bucket", (F.lit(_HLL_RMAX) - bit_len).alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    # integer harmonic term per SET register: 2^(RMAX - mj)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - mj)")
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_set"), F.sum(term).alias("s_set")
    )
    n_zero = (F.lit(HLL_M) - F.col("n_set")).cast("long")
    # empty input (global form only): no set registers -> s_set is NULL;
    # the all-zero-register sketch is still well-defined (est = alpha*m,
    # n_zero = m flags the small range), so coalesce instead of NULL-ing
    s_total = (
        F.coalesce(F.col("s_set"), F.lit(0).cast("long"))
        + n_zero * F.lit(1 << _HLL_RMAX).cast("long")
    )
    return agg.select(
        *groups,
        n_zero.alias("n_zero"),
        F.round(F.lit(HLL_NUM) / s_total.cast("double"), 4).alias("est_r"),
    )


def py_hll_distinct(values) -> tuple[int, float]:
    """Pure-python twin: (n_zero, est_r)."""
    import hashlib

    regs = [0] * HLL_M
    for v in {str(v) for v in values if v is not None}:
        h = int(hashlib.md5(v.encode()).hexdigest()[:12], 16)
        bucket, rem = h % HLL_M, h >> HLL_B
        rho = _HLL_RMAX - rem.bit_length()
        regs[bucket] = max(regs[bucket], rho)
    s = sum(1 << (_HLL_RMAX - mj) for mj in regs)
    return sum(1 for mj in regs if mj == 0), round(HLL_NUM / float(s), 4)


def py_cms(
    values,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> dict[str, int]:
    """Pure-python twin: value -> CMS point estimate (unit weights)."""
    import hashlib
    from collections import Counter

    def bucket(row: int, v: str) -> int:
        return (
            int(hashlib.md5(f"{row}:{v}".encode()).hexdigest()[:12], 16)
            % width
        )

    true = Counter(str(v) for v in values if v is not None)
    cells: dict[tuple[int, int], int] = {}
    for v, n in true.items():
        for r in range(depth):
            key = (r, bucket(r, v))
            cells[key] = cells.get(key, 0) + n
    return {
        v: min(cells[(r, bucket(r, v))] for r in range(depth)) for v in true
    }
