"""Incremental index maintenance with Structured Streaming.

The reference ingests with batch ``addDocument`` + threshold-triggered
``flush`` (``InvertedIndexManager.java:303-342``) — no streaming exists
there (SURVEY.md §2.6). This module is the Spark-native upgrade: a
``readStream`` source of new transcript turns drives ``foreachBatch``;
every micro-batch appends one committed artifact segment (the LSM "flush"),
so queries against the latest snapshot always see a consistent prefix of
the stream.

Exactly-once: Structured Streaming replays a failed micro-batch with the
same ``batch_id``; ``append_segment`` records the id in segment lineage and
turns replays into no-ops, so the at-least-once ``foreachBatch`` contract
composes to exactly-once segment appends. Compaction (``artifact.compact``)
periodically folds accumulated micro-segments, exactly like the reference's
``mergeAllSegments`` threshold (``InvertedIndexManager.java:384-452``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.artifact import append_segment, maybe_merge


def start_incremental_index(
    spark: SparkSession,
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    *,
    trigger: dict | None = None,
    source_desc: str = "stream",
    merge_threshold: int | None = None,
    merge_keep_largest: int = 1,
):
    """Start a streaming query appending each micro-batch as a segment.

    ``stream`` must be a streaming DataFrame with the artifact's
    ``doc_id_col``/``text_col`` columns. The artifact at ``path`` must
    already exist (``build_artifact`` an initial — possibly empty — corpus
    first); its config governs analyzer/compression settings.

    ``merge_threshold`` enables the reference's flush-time auto-merge
    (``InvertedIndexManager.java:345-352``): once the committed segment
    count reaches the threshold, the micro-segments (all but the
    ``merge_keep_largest`` biggest) fold into one via ``subcompact`` —
    segment count stays bounded however long the stream runs, without ever
    rewriting the base segment.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_segment(
            spark,
            batch_df,
            path,
            source_desc=f"{source_desc} batch {batch_id}",
            stream_batch_id=batch_id,
        )
        if merge_threshold is not None:
            maybe_merge(
                spark, path, threshold=merge_threshold,
                keep_largest=merge_keep_largest,
            )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
