"""Sliding-window document chunking for embedding / RAG pipelines.

Splits each document's token stream into fixed-size windows with overlap
— the preprocessing step between a cleaned corpus and an embedding model
(complementing ``transcripts.pack_conversations``, which concatenates
SHORT units up to a budget; chunking cuts LONG units down to one).

Zero-shuffle: chunk starts are a ``sequence`` expression, windows are
``slice``s of the token array, and the whole operator is a projection +
explode pipelined off the scan — no aggregation, no exchange, perfectly
data-parallel at any corpus size.

Chunk rule (mirrored exactly by the DuckDB oracle): starts at
0, step, 2·step, ... for every start < n_tokens, step = max_tokens −
overlap; the final window may be short. Documents with no tokens yield
no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_starts(n_tokens: int, max_tokens: int, overlap: int) -> list[int]:
    """The chunk-start rule as a pure function: 0, step, 2*step, ... for
    every start < n_tokens (step = max_tokens - overlap). This IS the
    semantics of chunk_documents' F.sequence(0, size-1, step) expression
    (Spark's sequence is end-inclusive, so it enumerates exactly the
    starts < size); the equivalence is pinned by the unit test's exact
    window outputs and hypothesis properties run against this function."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    return list(range(0, n_tokens, step))


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk) — ``chunk`` is the window's tokens
    re-joined with single spaces."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = F.col(tokens_col)
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    window = F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(window).cast("long").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk"),
    )
