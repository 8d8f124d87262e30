"""Incremental (streaming) index maintenance: file-source micro-batches
append artifact segments; results equal a one-shot batch build over the
same docs; replayed batch ids are no-ops."""

from __future__ import annotations

import time

import pytest

from searchengine_spark.fixtures import doc_key_col, transcripts_df
from searchengine_spark.index import build_index
from searchengine_spark.index.artifact import (
    append_segment,
    build_artifact,
    latest_snapshot,
    load_artifact,
)
from searchengine_spark.streaming import start_incremental_index


@pytest.fixture()
def corpus(spark):
    return (
        transcripts_df(spark, "tiny")
        .withColumn("doc_id", doc_key_col())
        .select("doc_id", "text", "conv_id")
    )


def test_append_segment_grows_artifact(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    first = corpus.where("conv_id < 'conv-00000010'").select("doc_id", "text")
    rest = corpus.where("conv_id >= 'conv-00000010'").select("doc_id", "text")
    aidx = build_artifact(spark, first, path)
    n1 = aidx.n_docs
    aidx = append_segment(spark, rest, path, stream_batch_id=0)
    assert aidx.n_docs == corpus.count() and aidx.n_docs > n1
    # replay of the same batch id is a no-op
    again = append_segment(spark, rest, path, stream_batch_id=0)
    assert again.n_docs == aidx.n_docs
    assert again.snapshot["snapshot_id"] == aidx.snapshot["snapshot_id"]

    # equal to one-shot build
    lidx = build_index(spark, corpus.select("doc_id", "text"), cache=False)
    q = "spark shuffle error"
    l = [(r["doc_id"], round(r["score"], 10)) for r in lidx.search_bm25(q, 10).collect()]
    a = [(r["doc_id"], round(r["score"], 10)) for r in again.search_bm25(q, 10).collect()]
    assert l == a


def test_streaming_foreachbatch_appends(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    first = corpus.where("conv_id < 'conv-00000005'").select("doc_id", "text")
    build_artifact(spark, first, path)

    # stage two "arriving" parquet files
    batch2 = corpus.where(
        "conv_id >= 'conv-00000005' and conv_id < 'conv-00000012'"
    ).select("doc_id", "text")
    batch3 = corpus.where("conv_id >= 'conv-00000012'").select("doc_id", "text")
    batch2.write.mode("append").parquet(src_dir)
    batch3.write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "4")
        .parquet(src_dir)
    )
    query = start_incremental_index(
        spark, stream, path, ckpt, trigger={"availableNow": True}
    )
    query.awaitTermination(120)

    aidx = load_artifact(spark, path)
    assert aidx.n_docs == corpus.count()
    lidx = build_index(spark, corpus.select("doc_id", "text"), cache=False)
    q = "elizabeth pride prejudice"
    l = [(r["doc_id"], round(r["score"], 10)) for r in lidx.search_bm25(q, 10).collect()]
    a = [(r["doc_id"], round(r["score"], 10)) for r in aidx.search_bm25(q, 10).collect()]
    assert l == a
    # lineage recorded the stream batches
    snap = latest_snapshot(path)
    batch_ids = [
        s["lineage"].get("stream_batch_id")
        for s in snap["segments"]
        if s["lineage"].get("stream_batch_id") is not None
    ]
    assert batch_ids, "no stream batches in lineage"
