"""DSIR-style hashed n-gram importance weighting for data selection.

Data Selection via Importance Resampling (Xie et al., 2023) picks raw
documents whose hashed-n-gram distribution resembles a target corpus:
fit bag-of-hashed-ngram multinomials p (target) and q (raw), weight each
raw document by ``log w(x) = sum_b c_b(x) * (ln p_b - ln q_b)``, and keep
the highest-weight documents (the paper resamples with Gumbel noise; we
take the deterministic top-k so every engine reproduces the same set —
the hash-seeded Gumbel variant is a one-line extension callers can add).
The reference engine has no data-selection stage; this is part of the
training-data-pipeline surface the brief adds alongside dedup/quality.

Feature space: grams = unigrams + space-joined adjacent bigrams of the
analyzed token stream; ``bucket(gram) = (48-bit md5 prefix) mod B``. The
md5-prefix integer is engine-identical (Spark ``conv(substr(md5,1,12),
16,10)`` == DuckDB ``('0x'||substr(md5,1,12))::BIGINT``), so the DuckDB
oracle replays feature hashing exactly. Tokens never contain spaces, so
unigram and bigram key spaces cannot collide by construction.

Determinism (the cross-engine-safe integer-score idiom): per-bucket
weights ``ln p_b - ln q_b`` are rounded ONCE to integer micro-nats
(``round(w*1e6)::BIGINT``, ~2B roundings total, data-independent of any
per-doc cut), and each document's score is the exact integer
``sum_b n_b * w_micro_b`` — associative, order-free, bit-identical across
partitionings and engines, no rounded-sum midpoint risk at selection
boundaries. Overflow headroom: |w_micro| < ~5e7, n_b <= doc length, so a
document needs ~1e11 gram instances to overflow int64.

Scale shape: one corpus pass per side. The raw pass aggregates to
(doc, bucket, n) — already combinable and bounded by min(B, dl) rows per
doc — and the q model is a second, bucket-keyed combinable re-aggregate
of THAT frame (B <= a few thousand rows out), not a second corpus scan.
The target pass shrinks straight to B rows. The weight table is B rows —
always broadcast — so scoring is one map-side join plus one combinable
doc-keyed integer aggregate; selection is TakeOrdered(k). No all-pairs,
no window over the corpus, no per-row Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .hashing import md5_prefix48

N_BUCKETS = 1024  # B; shared with the oracle SQL
DSIR_SMOOTH = 1.0  # add-lambda smoothing mass per bucket
_MICRO = 1_000_000  # micro-nat weight scale


def gram_instances(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) — one row per unigram/bigram INSTANCE.

    Bigrams are ``w_i + ' ' + w_{i+1}`` over the analyzed stream. F.get is
    NULL-safe out of bounds (element_at throws under ANSI mode) and the
    slice drops the final NULL-partner probe.
    """
    toks = F.col(tokens_col)
    bigrams = F.slice(
        F.transform(
            toks, lambda x, i: F.concat(x, F.lit(" "), F.get(toks, i + 1))
        ),
        1,
        F.greatest(F.size(toks) - 1, F.lit(0)),
    )
    return df.select(
        F.col(id_col), F.explode(F.concat(toks, bigrams)).alias("gram")
    )


def _bucket(col: F.Column, n_buckets: int) -> F.Column:
    """48-bit md5-prefix hash mod B (cross-engine identical; see module
    docstring). 12 hex chars fit a long with headroom."""
    return (md5_prefix48(col) % F.lit(n_buckets)).alias("bucket")


def hashed_gram_features(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket, n) — per-document hashed-gram bucket counts.

    One explode + one combinable (id, bucket) aggregate; docs with zero
    grams (empty token stream) produce no rows and are absent from every
    downstream frame (documented contract, matched by the oracle).
    """
    g = gram_instances(df, tokens_col, id_col)
    return g.groupBy(F.col(id_col), _bucket(F.col("gram"), n_buckets)).agg(
        F.count(F.lit(1)).alias("n")
    )


def _bucket_totals(feat: DataFrame) -> DataFrame:
    """(bucket, c) global gram-instance counts from a feature frame."""
    return feat.groupBy("bucket").agg(F.sum("n").alias("c"))


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """Per-raw-document importance weights against the target corpus.

    Returns ``(id_col, n_grams: bigint, logw_micro: bigint)`` — the exact
    integer micro-nat score ``sum_b n_b * round(1e6*(ln p_b - ln q_b))``;
    higher means more target-like. q is fit on ``raw_df`` itself (the DSIR
    formulation), so every scored bucket has q-mass; buckets the target
    never emits get the smoothing floor. The two corpus totals are O(1)
    driver scalars (same convention as ``bigram_lm``'s vocab size).
    """
    feat = hashed_gram_features(raw_df, tokens_col, id_col, n_buckets)
    qc = _bucket_totals(feat)
    pc = _bucket_totals(
        hashed_gram_features(target_df, tokens_col, id_col, n_buckets)
    )
    q_total = qc.agg(F.sum("c")).collect()[0][0] or 0
    p_total = pc.agg(F.sum("c")).collect()[0][0] or 0
    q_denom = float(q_total) + smooth * n_buckets
    p_denom = float(p_total) + smooth * n_buckets
    if q_denom <= 0 or p_denom <= 0:
        raise ValueError("dsir_weights: smoothing denominators must be > 0")
    # B-row weight table: every scored bucket exists in qc by construction;
    # left-join pulls target mass where present, smoothing floor otherwise.
    w = (
        qc.join(pc.withColumnRenamed("c", "cp"), "bucket", "left")
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("cp"), F.lit(0)) + F.lit(smooth))
                        / F.lit(p_denom)
                    )
                    - F.log((F.col("c") + F.lit(smooth)) / F.lit(q_denom))
                )
                * F.lit(_MICRO),
                0,
            )
            .cast("long")
            .alias("wm"),
        )
    )
    return (
        feat.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_grams"),
            F.sum(F.col("n") * F.col("wm")).cast("long").alias("logw_micro"),
        )
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """The k most target-like raw documents, deterministically.

    Order: ``logw_micro DESC, id ASC`` — integer scores make the cut
    exact (no rounded-float boundary); compiles to TakeOrderedAndProject,
    so the corpus never fully sorts.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    return (
        dsir_weights(
            raw_df, target_df, tokens_col, id_col, n_buckets, smooth
        )
        .orderBy(F.col("logw_micro").desc(), F.col(id_col))
        .limit(k)
    )


def py_dsir_weights(
    raw_docs: dict[str, list[str]],
    target_docs: dict[str, list[str]],
    n_buckets: int = N_BUCKETS,
    smooth: float = DSIR_SMOOTH,
) -> dict[str, tuple[int, int]]:
    """Pure-python twin (differential-test reference): id -> (n_grams,
    logw_micro). Same md5-prefix bucketing, same micro-nat rounding
    (round-half-away-from-zero, matching Spark/DuckDB double round)."""
    import hashlib

    def grams(toks: list[str]) -> list[str]:
        return list(toks) + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % n_buckets

    def counts(docs: dict[str, list[str]]) -> dict[int, int]:
        out: dict[int, int] = {}
        for toks in docs.values():
            for g in grams(toks):
                b = bucket(g)
                out[b] = out.get(b, 0) + 1
        return out

    qc, pc = counts(raw_docs), counts(target_docs)
    q_denom = sum(qc.values()) + smooth * n_buckets
    p_denom = sum(pc.values()) + smooth * n_buckets
    wm: dict[int, int] = {}
    for b, c in qc.items():
        x = (
            math.log((pc.get(b, 0) + smooth) / p_denom)
            - math.log((c + smooth) / q_denom)
        ) * _MICRO
        r = math.floor(abs(x) + 0.5)  # half away from zero
        wm[b] = r if x >= 0 else -r
    out: dict[str, tuple[int, int]] = {}
    for doc_id, toks in raw_docs.items():
        gs = grams(toks)
        if not gs:
            continue
        out[doc_id] = (
            len(gs),
            sum(wm[bucket(g)] for g in gs),
        )
    return out
