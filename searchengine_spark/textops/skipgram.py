"""Skip-gram (center, context) pair export for embedding training.

The word2vec/node2vec training-data step: every token in a sequence emits
a directed pair with each neighbor within ``window`` positions of it in
SEQUENCE ORDER (row rank within the sequence, the token-stream definition
— gapped position values collapse to adjacency, matching a stream that
was filtered upstream). Works over any (seq_id, pos, token) frame: packed
text sequences, transcript turn streams, or the graph walk corpus
(graph/walks.py) — walks + skip-grams IS node2vec's training input.

Plan shape (the scale argument): ONE window per sequence ordered by
position supplies the forward neighbors as ``lead`` columns — no
self-join, so the corpus is never duplicated join-side and the only
shuffle is the window's hash partition by seq_id (group size = sequence
length, bounded). Backward pairs are the reverses of forward pairs, so
they're emitted by flipping each forward pair — pure projection. The
optional count aggregation is map-side combinable. No per-row Python, no
windows wider than a sequence, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skipgram_pairs(
    df: DataFrame,
    seq_col: str = "seq_id",
    pos_col: str = "pos",
    token_col: str = "token",
    window: int = 2,
) -> DataFrame:
    """Directed (center, context) pairs within ``window`` stream positions.

    Every unordered neighbor pair yields BOTH directions (standard
    skip-gram: each token predicts each of its contexts). Output columns:
    ``center``, ``context`` (token_col's type), one row per pair instance.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = Window.partitionBy(seq_col).orderBy(pos_col)
    # window expressions can't sit inside explode(): materialize the lead
    # columns in one select (still ONE window pass), then explode
    leads = df.select(
        F.col(token_col).alias("a"),
        *[
            F.lead(token_col, d).over(w).alias(f"b{d}")
            for d in range(1, window + 1)
        ],
    )
    fwd = (
        leads.select(
            "a",
            F.explode(
                F.array(*[F.col(f"b{d}") for d in range(1, window + 1)])
            ).alias("b"),
        )
        .where(F.col("b").isNotNull())
    )
    return fwd.select(
        F.col("a").alias("center"), F.col("b").alias("context")
    ).unionAll(
        fwd.select(F.col("b").alias("center"), F.col("a").alias("context"))
    )


def skipgram_counts(
    df: DataFrame,
    seq_col: str = "seq_id",
    pos_col: str = "pos",
    token_col: str = "token",
    window: int = 2,
) -> DataFrame:
    """Aggregated pair multiplicities ``(center, context, n)`` — the
    co-occurrence-count form PPMI/GloVe-style trainers consume. One
    map-side-combinable aggregate over the pair stream."""
    return (
        skipgram_pairs(df, seq_col, pos_col, token_col, window)
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ppmi_weights(
    counts: DataFrame,
    min_count: int = 1,
    alpha: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """Positive PMI weights over a ``(center, context, n)`` co-occurrence
    frame (the GloVe/SVD-embedding prep step after ``skipgram_counts``):

        ppmi = max(0, ln( (n / N) / ((n_c / N) * (n_x^alpha / Z)) ))

    with ``alpha`` the context-distribution smoothing exponent (1.0 = no
    smoothing — keeps every intermediate an exact integer ratio, the
    cross-engine-safe kind; 0.75 = word2vec's). Rows with ``n <
    min_count`` and non-positive PMI are dropped. Output:
    ``(center, context, n, ppmi_r)`` with ppmi rounded at ``decimals``.

    Plan: two marginal aggregates (combinable), two equi-joins back on
    center / context, scalars N and Z via one O(1) collect. No windows,
    no per-row Python; marginal frames are vocabulary-sized, so at corpus
    scale the joins shuffle vocab rows, never the pair stream twice.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    kept = counts.where(F.col("n") >= min_count)
    cmarg = kept.groupBy("center").agg(F.sum("n").alias("n_c"))
    xweight = (
        F.col("n").cast("double") ** F.lit(alpha)
        if alpha != 1.0
        else F.col("n").cast("double")
    )
    xmarg = kept.groupBy("context").agg(F.sum(xweight).alias("n_x"))
    totals = kept.agg(
        F.sum("n").alias("N"), F.sum(xweight).alias("Z")
    ).collect()[0]
    if totals["N"] is None:
        return kept.select(
            "center",
            "context",
            "n",
            F.lit(0.0).alias("ppmi_r"),
        ).where(F.lit(False))
    big_n, big_z = float(totals["N"]), float(totals["Z"])
    pmi = F.log(
        (F.col("n") / F.lit(big_n))
        / ((F.col("n_c") / F.lit(big_n)) * (F.col("n_x") / F.lit(big_z)))
    )
    return (
        kept.join(cmarg, "center")
        .join(xmarg, "context")
        .select(
            "center",
            "context",
            "n",
            F.round(pmi, decimals).alias("ppmi_r"),
        )
        .where(F.col("ppmi_r") > 0)
    )


def py_skipgram_counts(
    rows: list[tuple[int, int, object]], window: int = 2
) -> dict[tuple[object, object], int]:
    """Pure-python twin over (seq_id, pos, token) rows:
    {(center, context): n}."""
    seqs: dict[int, list[tuple[int, object]]] = {}
    for s, p, t in rows:
        seqs.setdefault(s, []).append((p, t))
    out: dict[tuple[object, object], int] = {}
    for sq in seqs.values():
        toks = [t for _, t in sorted(sq)]
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                b = toks[j]
                out[(a, b)] = out.get((a, b), 0) + 1
                out[(b, a)] = out.get((b, a), 0) + 1
    return out


def py_ppmi(
    counts: dict[tuple[object, object], int],
    min_count: int = 1,
    alpha: float = 1.0,
    decimals: int = 6,
) -> dict[tuple[object, object], float]:
    """Pure-python twin of ppmi_weights: {(center, context): ppmi_r}."""
    import math

    kept = {k: n for k, n in counts.items() if n >= min_count}
    if not kept:
        return {}
    n_c: dict[object, int] = {}
    n_x: dict[object, float] = {}
    for (c, x), n in kept.items():
        n_c[c] = n_c.get(c, 0) + n
        n_x[x] = n_x.get(x, 0.0) + float(n) ** alpha
    big_n = float(sum(kept.values()))
    big_z = float(sum(n_x.values()))
    out = {}
    for (c, x), n in kept.items():
        v = round(
            math.log(
                (n / big_n) / ((n_c[c] / big_n) * (n_x[x] / big_z))
            ),
            decimals,
        )
        if v > 0:
            out[(c, x)] = v
    return out
