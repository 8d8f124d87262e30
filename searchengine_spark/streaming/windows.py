"""Streaming windowed aggregations with watermarked late-data handling.

The reference has no streaming at all (SURVEY.md §2.6); these are the
Spark-native operators a transcript/event firehose needs:

- ``windowed_event_counts``: tumbling event-time windows with a watermark —
  late rows inside the watermark still merge into their window; rows later
  than the watermark are dropped, and closed windows emit exactly once in
  append mode.
- ``windowed_term_counts``: the streaming twin of the index build's stats
  pass — per-window term frequencies over analyzed text, watermarked on the
  turn timestamp. Feeding these into ``append_segment`` (incremental.py)
  gives a fully streaming index maintenance pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts (+ ``value_col`` sums when the stream has
    one; pass ``value_col=None`` for count-only schemas) per key with
    late-data tolerance of ``watermark``. Works on both streaming and
    batch frames (batch just ignores the watermark), so the same
    definition is testable both ways."""
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return src.groupBy(F.window(ts_col, window).alias("w"), key_col).agg(
        *aggs
    ).select(F.col("w.start").alias("w_start"), key_col, "n", *(
        [f"sum_{value_col}"] if value_col is not None else []
    ))


def windowed_term_counts(
    stream: DataFrame,
    analyzer: str = "composable",
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window term frequencies over analyzed transcript text — the
    streaming stats pass (term, window, tf)."""
    from ..index.engine import make_term_positions_udf

    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    udf = make_term_positions_udf(analyzer)
    exploded = (
        src.select(ts_col, udf(F.col(text_col)).alias("tp"))
        .select(ts_col, F.explode("tp").alias("e"))
        .select(ts_col, F.col("e.term").alias("term"),
                F.size("e.positions").alias("tf"))
    )
    return (
        exploded.groupBy(F.window(ts_col, window).alias("w"), "term")
        .agg(F.sum("tf").alias("cf"), F.count(F.lit(1)).alias("df"))
        .select(F.col("w.start").alias("w_start"), "term", "cf", "df")
    )
