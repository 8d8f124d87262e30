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

Optional streaming dedup (``dedup_store``): each micro-batch first runs
:func:`~searchengine_spark.textops.dedup.incremental_dedup` against a
signature store persisted at that path — only NOVEL docs are appended to
the index, and their signatures advance the store. The store is parquet
partitioned by ``batch_id``; determinism under crash-replay comes from two
rules: (1) the read EXCLUDES the current batch's own partition, so a
half-finished previous attempt can't make its docs look "already seen"
(which would change the novel set and, worse, persist an emptied
partition); (2) each attempt overwrites exactly its own partition with a
deterministically recomputed signature frame. Replayed appends remain
no-ops via segment lineage as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.artifact import append_segment, latest_snapshot, maybe_merge
from ..textops.dedup import incremental_dedup, signature_store


def _dedup_tokens(text_col):
    """Tokenization the dedup signatures are computed over (the engine's
    punctuation-split form; stays JVM-side)."""
    return F.filter(
        F.split(F.lower(F.regexp_replace(text_col, "[,.;?!]", " ")), r"\s+"),
        lambda x: x != "",
    )


def _store_partition(path: str, batch_id: int) -> str:
    return f"{path}/batch_id={batch_id}"


def init_dedup_store(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Seed a streaming dedup store with the signatures of an initial
    corpus (written as partition ``batch_id=-1``; streaming batch ids are
    non-negative so the seed is never mistaken for a batch's own
    partition). Call once, right after ``build_artifact`` over the same
    corpus. For an empty bootstrap pass an empty frame — the partition
    still materializes so later reads resolve the schema."""
    sigs = signature_store(
        df.withColumn("__tokens", _dedup_tokens(F.col(text_col))),
        id_col=id_col,
        text_col=text_col,
        tokens_col="__tokens",
    ).select(id_col, "text_sha", "sig")
    sigs.write.mode("overwrite").parquet(_store_partition(path, -1))


def _read_store(spark: SparkSession, path: str, exclude_batch_id: int) -> DataFrame:
    # basePath keeps the batch_id partition column visible; the != filter
    # is a directory-level partition prune, not a data scan
    return (
        spark.read.option("basePath", path)
        .parquet(path)
        .where(F.col("batch_id") != exclude_batch_id)
        .drop("batch_id")
    )


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
    dedup_store: str | None = None,
    dedup_est_threshold: float = 0.5,
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

    ``dedup_store`` (a path previously seeded by :func:`init_dedup_store`)
    enables streaming dedup: exact and estimated-near duplicates of
    anything already seen — or of a smaller-id doc in the same batch — are
    dropped before the append, and the store advances with the novel docs'
    signatures. See the module docstring for the replay-determinism rules.
    """

    # the stream must carry the artifact's configured id/text columns —
    # the dedup path reads their NAMES from the artifact config rather
    # than assuming doc_id/text (init_dedup_store must be seeded with the
    # same columns)
    cfg = (latest_snapshot(path) or {"config": {}})["config"]
    id_col = cfg.get("doc_id_col", "doc_id")
    text_col = cfg.get("text_col", "text")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if dedup_store is not None:
            batch = batch_df.withColumn(
                "__tokens", _dedup_tokens(F.col(text_col))
            ).persist()
            statuses = incremental_dedup(
                batch,
                _read_store(spark, dedup_store, batch_id),
                id_col=id_col,
                text_col=text_col,
                tokens_col="__tokens",
                est_threshold=dedup_est_threshold,
            )
            novel = batch.join(
                statuses.where(F.col("status") == "novel").select(id_col),
                id_col,
                "left_semi",
            ).persist()
            if not novel.isEmpty():
                append_segment(
                    spark,
                    novel.drop("__tokens"),
                    path,
                    source_desc=f"{source_desc} batch {batch_id} (deduped)",
                    stream_batch_id=batch_id,
                )
            # always materialize the partition (possibly empty) so a
            # replayed batch and later reads see a consistent store
            signature_store(
                novel, id_col=id_col, text_col=text_col, tokens_col="__tokens"
            ).select(id_col, "text_sha", "sig").write.mode(
                "overwrite"
            ).parquet(_store_partition(dedup_store, batch_id))
            novel.unpersist()
            batch.unpersist()
        else:
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
