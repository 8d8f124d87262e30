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

from pyspark.sql import DataFrame, Window
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


# sentence heuristic: maximal runs of non-terminators plus their trailing
# [.!?]+ run — the standard cheap segmentation (deterministic, Java ∩ RE2)
SENTENCE_RE = "[^.!?]+[.!?]*"
# explicit Java-\s-equivalent class (Java and RE2 disagree on \s contents)
_WS_RUN = "[ \\t\\n\\x0b\\f\\r]+"
_WS_EDGE = "^[ \\t\\n\\x0b\\f\\r]+|[ \\t\\n\\x0b\\f\\r]+$"


def sentence_chunks(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-aware chunking for RAG / embedding pipelines: split each
    document into sentences (maximal ``[^.!?]+[.!?]*`` runs — the cheap
    deterministic heuristic; "Dr. Smith" splits, by design), then pack
    CONSECUTIVE sentences into chunks of ~``budget`` whitespace tokens
    without ever cutting inside a sentence. Returns one row per
    (document, chunk)::

        (doc_id, chunk_idx, n_sents, n_tokens, chunk)

    Chunk rule (the ``pack_conversations`` prefix-sum formulation, mirrored
    exactly by the DuckDB oracle): sentence i goes to chunk
    ``floor(tokens_before_i / budget)`` — deterministic, order-stable, and
    SQL-replayable without recursion; packs within one sentence of greedy.
    A sentence longer than ``budget`` lands in its own chunk(s) boundary —
    it is never split.

    Plan shape: sentence extraction and token counts are a projection +
    posexplode pipelined off the scan; then ONE shuffle on ``id_col``
    shared by the running-sum window and the chunk groupBy (AQE reuses the
    exchange). Documents are independent, so the operator scales with doc
    count; a single document's sentence list must fit an executor row,
    same bound as every per-doc array operator here.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0),
            lambda s: F.regexp_replace(s, _WS_EDGE, ""),
        ),
        lambda s: s != "",
    )
    per_sent = df.select(
        F.col(id_col),
        F.posexplode(sents).alias("sent_idx", "sentence"),
    ).select(
        id_col,
        "sent_idx",
        "sentence",
        F.size(F.filter(F.split("sentence", _WS_RUN), lambda x: x != ""))
        .cast("long")
        .alias("__nt"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = per_sent.select(
        id_col,
        "sent_idx",
        "sentence",
        "__nt",
        F.coalesce(F.sum("__nt").over(w), F.lit(0).cast("long")).alias("__tb"),
    ).select(
        id_col,
        "sent_idx",
        "sentence",
        "__nt",
        # exact integer DIV (packing.py invariant): a float divide of big
        # longs can misplace a boundary sentence by one ulp
        F.expr(f"__tb div {int(budget)}").alias("chunk_idx"),
    )
    return (
        assigned.groupBy(id_col, "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sents"),
            F.sum("__nt").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sent_idx", "sentence"))
                    ),
                    lambda e: e["sentence"],
                ),
                " ",
            ).alias("chunk"),
        )
    )
