"""Time-series relational operators: as-of join and interval (range) join.

Spark has no native ASOF JOIN, and a naive ``a.ts >= b.ts`` theta-join
plans as BroadcastNestedLoop / cartesian — O(n*m) and a non-starter at
scale. Both operators here reduce to ONE equi-join / window shuffle:

- :func:`asof_join` — union-tag the two sides and take a running
  ``last(payload, ignorenulls=True)`` over (keys, ts). One shuffle on the
  join keys, zero row expansion, works for arbitrarily large right sides
  (the classic sort-merge as-of shape; DuckDB/kdb implement the same scan).
- :func:`interval_join` — explode each [lo, hi) interval into the aligned
  time buckets it overlaps (ceil(len/bucket)+1 rows, a constant), then an
  equi-join on the fact row's bucket + the exact range residual. The plan
  is a plain (broadcastable) hash join, never a range join.

Both are verified against DuckDB's *native* ASOF JOIN / IEJoin range join
in the driver contract (entry_queries: ``events_asof``,
``events_range_join``) — independent implementations, same results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` keys.

    Returns all left columns plus ``<right_ts><suffix>`` and
    ``<col><suffix>`` for each of ``right_cols`` (null when no right row
    qualifies, or when the match is older than ``tolerance_s`` seconds).

    Ties: right rows sort before left rows at equal timestamps, so a
    right row at exactly ``left_ts`` matches (inclusive bound). Callers
    needing determinism under duplicate (keys, right_ts) right rows must
    dedupe first — the running ``last`` picks the later union-order row,
    which Spark does not define across retries.

    Plan shape: one exchange on ``on`` + a single window sort — no join
    node at all, so there is nothing to degenerate into a nested loop.
    Key skew equals the data's own key skew (same as any per-key window).
    """
    on = list(on)
    right_cols = [c for c in (right_cols or []) if c != right_ts]

    # SQL-join semantics parity (DuckDB ASOF / pandas merge_asof): right
    # rows with a NULL timestamp can never be "the latest at-or-before"
    # match, and NULL keys never satisfy an equality predicate — drop both
    # from the right side. Left rows keep left-join semantics: null-key /
    # null-ts left rows survive with a null match.
    right = right.filter(F.col(right_ts).isNotNull())
    for key in on:
        right = right.filter(F.col(key).isNotNull())

    pay_t = right.select(
        F.struct(
            F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
        ).alias("__pay")
    ).schema["__pay"].dataType
    lrow_t = left.select(F.struct(*left.columns).alias("__lrow")).schema[
        "__lrow"
    ].dataType

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ord_ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
        ).alias("__pay"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
    )
    lf = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ord_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_t).alias("__pay"),
        F.struct(*left.columns).alias("__lrow"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ord_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(lf)
        .withColumn("__match", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    match_ts = F.col("__match.__ts")
    if tolerance_s is not None:
        in_tol = (
            F.col("__ord_ts").cast("timestamp").cast("double")
            - match_ts.cast("timestamp").cast("double")
        ) <= F.lit(float(tolerance_s))
        out = out.withColumn("__match", F.when(in_tol, F.col("__match")))
    sel = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    sel.append(F.col("__match.__ts").alias(right_ts + suffix))
    sel.extend(F.col(f"__match.{c}").alias(c + suffix) for c in right_cols)
    return out.select(*sel)


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_s: int = 600,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join fact rows into half-open [lo, hi) time intervals.

    Each interval is exploded into the aligned ``bucket_s``-second epoch
    buckets it overlaps (``(hi-lo)/bucket_s + 1`` rows — constant per
    interval), then equi-joined on the fact's bucket with the exact range
    condition as a residual filter. Catalyst plans a hash join (broadcast
    when ``broadcast_intervals``), never BroadcastNestedLoop.

    Overlapping intervals are allowed: a fact row joins every interval
    containing it. Returns facts' columns + intervals' columns.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    # NTZ-safe epoch seconds (TIMESTAMP_NTZ has no direct double cast)
    lo_e = F.col(lo_col).cast("timestamp").cast("double")
    hi_e = F.col(hi_col).cast("timestamp").cast("double")
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lo_e / bucket_s).cast("long"),
                F.floor(hi_e / bucket_s).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    fx = facts.withColumn(
        "__bucket",
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / bucket_s).cast(
            "long"
        ),
    )
    cond = (
        (fx["__bucket"] == iv["__bucket"])
        & (fx[ts_col] >= iv[lo_col])
        & (fx[ts_col] < iv[hi_col])
    )
    return fx.join(iv, cond).drop("__bucket")


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how many distinct ids performed step 1,
    then step 2 STRICTLY after it, then step 3 strictly after that, ...

    Returns (step: int 1-based, step_name, n_users). Semantics: an id
    reaches step k iff there exist events e1..ek with types steps[0..k-1]
    and strictly increasing timestamps, taking at each stage the EARLIEST
    qualifying event (greedy-earliest is optimal for this reachability:
    any valid chain implies the greedy one exists). Same-timestamp events
    never chain (strict >, engine-independent — no tie-order dependence).

    Scale shape: stage k filters events to that step's type BEFORE its
    user-keyed equi-join against the stage-(k-1) frontier (a per-id
    single-row frame), so each stage shuffles only that type's slice;
    K stages = K filtered shuffles, no windows over whole histories, no
    per-id event collection.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    frontier = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(id_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    for k, step in enumerate(steps):
        if k > 0:
            nxt = events.where(F.col(type_col) == step).select(
                F.col(id_col), F.col(ts_col).alias("__ts")
            )
            frontier = (
                nxt.join(frontier, id_col)
                .where(F.col("__ts") > F.col("__t"))
                .groupBy(id_col)
                .agg(F.min("__ts").alias("__t"))
            )
        counts.append(
            frontier.agg(
                F.lit(k + 1).alias("step"),
                F.lit(step).alias("step_name"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    max_periods: int = 8,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: group ids by the period of their FIRST event,
    then count how many are active again k periods later.

    Returns (cohort_period: long epoch-period of first activity,
    period_offset: long 0..max_periods, n_active: long). Two shuffles:
    one id-keyed aggregate for first-activity, one (cohort, offset)
    count over the distinct (id, period) activity pairs — both
    map-side-combinable; the activity frame is distinct'd per (id,
    period) so heavy users don't inflate counts. Periods are fixed-width
    windows of ``period_days`` from the unix epoch (deterministic,
    timezone-free, SQL-replayable — NOT calendar weeks).
    """
    sec = period_days * 86400
    period = (F.unix_timestamp(F.col(ts_col)) / sec).cast("long")
    acts = events.select(
        F.col(id_col).alias("__id"), period.alias("__p")
    ).distinct()
    first = acts.groupBy("__id").agg(F.min("__p").alias("__cohort"))
    return (
        acts.join(first, "__id")
        .withColumn("__off", F.col("__p") - F.col("__cohort"))
        .where(F.col("__off") <= max_periods)
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            F.col("__off").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
