"""Transcript-to-training-example assembly.

The input shape is the engine's native transcripts table
(conv_id, turn_idx, role, text, tool, ts — FIXTURES.md): multi-turn
conversations that a training pipeline must render into flat text
examples under a token budget. ``pack_conversations`` does the whole
assembly distributed:

- per-turn whitespace token counts (JVM expression, no UDF),
- a running per-conversation total (one window over (conv_id, turn_idx)),
- chunking at ``floor(tokens_before / budget)`` — deterministic,
  order-stable, and SQL-replayable (a greedy reset would need recursion;
  this prefix-sum formulation packs within ~1 turn of greedy and is a
  single expression),
- one groupBy((conv_id, chunk)) assembling "role: text" lines in turn
  order via sort_array over collected (turn_idx, line) structs.

Plan shape: ONE shuffle on conv_id (window + groupBy share the hash
partitioning — AQE reuses the exchange), per-group sorts only, no global
sort until the caller's final orderBy. Conversations are independent, so
the operator scales with the number of conversations regardless of
corpus size; a single conversation longer than executor memory is the
only skew hazard (bound turn counts upstream if that can happen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Java-\s whitespace (matches the analyzer's separator class)
_WS_RE = "[ \\t\\n\\x0b\\f\\r]+"


def pack_conversations(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Pack each conversation's turns into examples of ~``budget``
    whitespace tokens. Returns one row per (conversation, chunk):
    ``(conv_id, chunk_id, n_turns, n_tokens, has_tool, example)`` where
    ``example`` is the newline-joined "role: text" rendering in turn order.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ntok = F.size(
        F.filter(F.split(F.col(text_col), _WS_RE), lambda x: x != "")
    ).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    line = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    turns = df.select(
        F.col(conv_col),
        F.col(order_col),
        ntok.alias("_ntok"),
        line.alias("_line"),
        (F.col(tool_col) != "").alias("_tool"),
    ).withColumn(
        "chunk_id",
        F.floor((F.sum("_ntok").over(w) - F.col("_ntok")) / F.lit(budget)).cast(
            "long"
        ),
    )
    return (
        turns.groupBy(conv_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("_ntok").cast("long").alias("n_tokens"),
            F.max("_tool").alias("has_tool"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(order_col, "_line"))
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("example"),
        )
    )


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation profile over the native transcripts table: turn
    counts by role, tool-call counts, distinct tools, wall-clock duration
    and whitespace token volume — the corpus-curation summary a training
    pipeline slices before sampling (drop single-turn convs, cap tool-call
    storms, length-balance the mix).

    ONE combinable groupBy(conv_id) aggregate — every term is an
    associative count/sum/min/max, so map-side partial aggregation does
    the heavy lifting and the shuffle carries one row per conversation.
    Duration is max(ts)−min(ts) in epoch seconds (a difference, so the
    session-timezone offset in the timestamp→long cast cancels).
    """
    ntok = F.when(
        F.col(text_col) != "", F.size(F.split(F.col(text_col), " "))
    ).otherwise(F.lit(0))
    return df.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col(role_col) == "assistant").cast("long")).alias(
            "n_assistant"
        ),
        F.sum((F.col(tool_col) != "").cast("long")).alias("n_tool_calls"),
        F.count_distinct(
            F.when(F.col(tool_col) != "", F.col(tool_col))
        ).alias("n_distinct_tools"),
        (F.max(F.col(ts_col)).cast("long") - F.min(F.col(ts_col)).cast("long"))
        .alias("duration_s"),
        F.sum(ntok).cast("long").alias("n_tokens"),
    )
