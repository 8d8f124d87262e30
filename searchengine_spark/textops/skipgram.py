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
