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


def test_auto_merge_bounds_segment_count(spark, corpus, tmp_path):
    """Reference flush-time auto-merge (threshold 8 there, 3 here): appends
    past the threshold trigger a micro-segment fold, so segment count stays
    bounded while results remain identical to the one-shot build."""
    from searchengine_spark.index.artifact import maybe_merge

    path = str(tmp_path / "automerge_idx")
    convs = sorted(r["conv_id"] for r in corpus.select("conv_id").distinct().collect())
    cuts = [convs[i] for i in range(0, len(convs), max(1, len(convs) // 5))]
    parts = []
    for i, lo in enumerate(cuts):
        hi = cuts[i + 1] if i + 1 < len(cuts) else None
        cond = (corpus["conv_id"] >= lo) & (
            (corpus["conv_id"] < hi) if hi else (corpus["conv_id"] >= lo)
        )
        parts.append(corpus.where(cond).select("doc_id", "text"))
    build_artifact(spark, parts[0], path)
    max_seen = 1
    for i, part in enumerate(parts[1:]):
        append_segment(spark, part, path, stream_batch_id=i)
        maybe_merge(spark, path, threshold=3, keep_largest=1)
        max_seen = max(max_seen, len(latest_snapshot(path)["segments"]))
    assert max_seen <= 3  # bounded: merge fires as soon as threshold hits
    aidx = load_artifact(spark, path)
    lidx = build_index(spark, corpus.select("doc_id", "text"), cache=False)
    assert aidx.n_docs == lidx.n_docs
    q = "spark shuffle error"
    l = [(r["doc_id"], round(r["score"], 10)) for r in lidx.search_bm25(q, 10).collect()]
    a = [(r["doc_id"], round(r["score"], 10)) for r in aidx.search_bm25(q, 10).collect()]
    assert l == a


def test_replay_after_merge_is_noop(spark, corpus, tmp_path):
    """Exactly-once across compaction: a micro-batch whose segment was
    merged away by subcompact must STILL be recognized as already-applied
    when Structured Streaming replays it after a crash (the merge carries
    the folded segments' stream_batch_ids forward in lineage). Without the
    carry-forward this silently double-appends."""
    from searchengine_spark.index.artifact import subcompact

    path = str(tmp_path / "replay_idx")
    a = corpus.where("conv_id < 'conv-00000008'").select("doc_id", "text")
    b = corpus.where(
        "conv_id >= 'conv-00000008' and conv_id < 'conv-00000015'"
    ).select("doc_id", "text")
    c = corpus.where("conv_id >= 'conv-00000015'").select("doc_id", "text")
    build_artifact(spark, a, path)
    append_segment(spark, b, path, stream_batch_id=1)
    append_segment(spark, c, path, stream_batch_id=2)
    merged = subcompact(spark, path, [1, 2])  # folds both micro-segments
    lin = [
        s["lineage"]
        for s in merged.snapshot["segments"]
        if "subcompaction" in s["lineage"]["source"]
    ][0]
    assert lin["merged_stream_batch_ids"] == [1, 2]
    n = merged.n_docs
    snap = merged.snapshot["snapshot_id"]
    # crash-replay of batches 1 and 2: both must be no-ops
    for bid, df in ((1, b), (2, c)):
        again = append_segment(spark, df, path, stream_batch_id=bid)
        assert again.n_docs == n
        assert again.snapshot["snapshot_id"] == snap
    # a second-generation merge keeps carrying the ids forward
    append_segment(spark, b.limit(3), path, stream_batch_id=3)
    seg_ids = [s["segment_id"] for s in latest_snapshot(path)["segments"]]
    merged2 = subcompact(spark, path, seg_ids)
    lin2 = [
        s["lineage"]
        for s in merged2.snapshot["segments"]
        if "subcompaction" in s["lineage"]["source"]
    ][-1]
    assert set(lin2["merged_stream_batch_ids"]) >= {1, 2, 3}


def test_subcompact_handles_duplicate_doc_ids(spark, corpus, tmp_path):
    """The same doc_id appended in two merged segments must keep exactly
    one posting set per (segment-instance): the old->new ordinal mapping is
    keyed on ordinals, so a doc_id equi-join can no longer cross-match and
    duplicate postings / inflate df."""
    from pyspark.sql import functions as F

    from searchengine_spark.index.artifact import subcompact

    path = str(tmp_path / "dup_idx")
    base = corpus.where("conv_id < 'conv-00000005'").select("doc_id", "text")
    dup = corpus.where(
        "conv_id >= 'conv-00000005' and conv_id < 'conv-00000008'"
    ).select("doc_id", "text")
    build_artifact(spark, base, path)
    append_segment(spark, dup, path, stream_batch_id=1)
    append_segment(spark, dup, path, stream_batch_id=2)  # same doc_ids again
    before = load_artifact(spark, path)
    n_postings_before = before.postings.count()
    df_before = {
        r["term"]: r["df"]
        for r in before.postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    merged = subcompact(spark, path, [1, 2])
    assert merged.n_docs == before.n_docs  # both instances kept, none cloned
    assert merged.postings.count() == n_postings_before
    df_after = {
        r["term"]: r["df"]
        for r in merged.postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    assert df_after == df_before


def test_windowed_counts_with_watermark_drops_late_rows(spark, tmp_path):
    """Run the watermarked windowed agg as a real stream in append mode:
    a row 3 hours older than the max seen event time (watermark 2h) arrives
    in a later micro-batch and must NOT produce output for its window."""
    import pandas as pd

    from searchengine_spark.streaming import windowed_event_counts

    src_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    base = pd.Timestamp("2026-01-01 00:00:00")
    # batch file 1: events in hours 0..5 (advances watermark to 05:00-2h)
    rows1 = [
        {"ts": base + pd.Timedelta(hours=h), "event_type": "click", "value": 1.0}
        for h in range(6)
    ]
    # batch file 2: one punctual row (hour 5) + one too-late row (hour 0)
    rows2 = [
        {"ts": base + pd.Timedelta(hours=5, minutes=30), "event_type": "click", "value": 1.0},
        {"ts": base + pd.Timedelta(minutes=10), "event_type": "late", "value": 99.0},
    ]
    pdf1, pdf2 = pd.DataFrame(rows1), pd.DataFrame(rows2)
    spark.createDataFrame(pdf1).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), 'stream did not finish in 600s'
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = (
        windowed_event_counts(
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(600), 'stream did not finish in 600s'
    out = spark.read.parquet(out_dir)
    # the too-late 'late' row was behind the watermark -> dropped entirely
    assert out.where("event_type = 'late'").count() == 0
    rows = out.where("event_type = 'click'").collect()
    # closed windows emitted exactly once each, with correct counts
    hours = [r["w_start"].hour for r in rows]
    assert len(hours) == len(set(hours)), "window emitted more than once"
    assert len(hours) >= 2, "no windows closed/emitted"
    assert all(r["n"] == 1 for r in rows)


def test_windowed_term_counts_batch_twin(spark, corpus):
    """The streaming stats pass, run in batch mode, must agree with the
    logical index's term stats for the same hour of transcripts."""
    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.streaming import windowed_term_counts

    tr = transcripts_df(spark, "tiny")
    one_hour = tr.where("ts >= timestamp'2026-01-01 01:00:00' and ts < timestamp'2026-01-01 02:00:00'")
    got = {
        r["term"]: (r["cf"], r["df"])
        for r in windowed_term_counts(one_hour).collect()
    }
    from collections import Counter

    from searchengine_spark.analysis.analyzer import analyze

    cf = Counter()
    df = Counter()
    for r in one_hour.select("text").collect():
        toks = analyze(r["text"])
        for t, c in Counter(toks).items():
            cf[t] += c
            df[t] += 1
    assert got == {t: (cf[t], df[t]) for t in cf}


def test_session_fn_all_null_ts_chunk_does_not_freeze_last_ts():
    """An all-null-ts pandas chunk yields NaT; adopting it used to poison
    every later `>` comparison so real timestamps in the same call were
    never recorded."""
    import pandas as pd

    from searchengine_spark.streaming.stateful import _session_fn

    class StubState:
        exists = False
        hasTimedOut = False
        stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v
            self.exists = True

        def setTimeoutDuration(self, ms):
            pass

    fn = _session_fn("composable", 1000)
    st = StubState()
    real = pd.Timestamp("2026-01-01 01:00:00")
    chunks = iter(
        [
            pd.DataFrame({"text": ["spark error"], "ts": [pd.NaT]}),
            pd.DataFrame({"text": ["hash join"], "ts": [real]}),
        ]
    )
    list(fn(("c1",), chunks, st))
    n_turns, _n_tokens, last_ts = st.stored
    assert n_turns == 2
    assert last_ts == real


def test_windowed_event_counts_without_value_column(spark):
    from searchengine_spark.streaming import windowed_event_counts

    df = spark.createDataFrame(
        [("2026-01-01 00:10:00", "click"), ("2026-01-01 00:20:00", "click")],
        "ts_s string, event_type string",
    ).selectExpr("cast(ts_s as timestamp) as ts", "event_type")
    out = windowed_event_counts(df, value_col=None).collect()
    assert len(out) == 1 and out[0]["n"] == 2
    assert "sum_value" not in out[0].asDict()


def test_stateful_conversation_sessions(spark, corpus, tmp_path):
    """applyInPandasWithState: per-conversation state accumulates across
    micro-batches; summaries carry exact turn/token counts (verified against
    a batch computation with the same analyzer)."""
    from collections import Counter

    from searchengine_spark.analysis.analyzer import analyze
    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.streaming import conversation_sessions

    tr = (
        transcripts_df(spark, "tiny")
        .where("conv_id < 'conv-00000006'")
        .select("conv_id", "turn_idx", "text", "ts")
    )
    src_dir = str(tmp_path / "turns")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    # two files -> two micro-batches splitting conversations mid-stream
    tr.where("turn_idx < 2").coalesce(1).write.mode("append").parquet(src_dir)
    tr.where("turn_idx >= 2").coalesce(1).write.mode("append").parquet(src_dir)

    expect: dict = {}
    for r in tr.collect():
        n_t, n_tok = expect.get(r["conv_id"], (0, 0))
        expect[r["conv_id"]] = (n_t + 1, n_tok + len(analyze(r["text"])))

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, text string, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    # a continuous micro-batch trigger: processing-time timeouts only fire
    # on subsequent batches, which availableNow never runs — so poll + stop
    q = (
        conversation_sessions(stream, idle_ms=500)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        out: dict = {}
        deadline = time.time() + 120
        while time.time() < deadline and set(out) != set(expect):
            time.sleep(2)
            try:
                out = {
                    r["conv_id"]: (r["n_turns"], r["n_tokens"])
                    for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                out = {}
    finally:
        q.stop()
    # every idle conversation emitted exactly once, with exact counts —
    # state accumulated correctly across the mid-conversation batch split
    assert out == expect


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
    assert query.awaitTermination(600), 'stream did not finish in 600s'

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


def test_empty_bootstrap_then_append(spark, corpus, tmp_path):
    """The documented streaming bootstrap: build over an EMPTY corpus, then
    append the first real batch (empty partitioned writes produce no files;
    reads must still resolve the schema)."""
    path = str(tmp_path / "bootstrap")
    empty = spark.createDataFrame([], "doc_id string, text string")
    aidx = build_artifact(spark, empty, path)
    assert aidx.n_docs == 0
    assert aidx.search_bm25("spark", 5).count() == 0
    aidx = append_segment(
        spark, corpus.select("doc_id", "text"), path, stream_batch_id=0
    )
    assert aidx.n_docs == corpus.count()
    assert aidx.search_bm25("spark shuffle error", 5).count() == 5


def test_streaming_dedup_appends_only_novel(spark, corpus, tmp_path):
    """dedup_store: duplicates of the seed corpus, of earlier batches, and
    within a batch are dropped before the append; the final index equals a
    batch build over just the novel docs."""
    from searchengine_spark.streaming import init_dedup_store

    path = str(tmp_path / "ddidx")
    store = str(tmp_path / "ddstore")
    src_dir = str(tmp_path / "ddincoming")
    ckpt = str(tmp_path / "ddckpt")

    seed = corpus.where("conv_id < 'conv-00000005'").select("doc_id", "text")
    build_artifact(spark, seed, path)
    init_dedup_store(spark, seed, store)

    fresh = corpus.where(
        "conv_id >= 'conv-00000005' and conv_id < 'conv-00000010'"
    ).select("doc_id", "text")
    # duplicates of seed docs under NEW doc_ids (exact text copies)
    dup_of_seed = seed.limit(4).selectExpr(
        "concat('dupseed:', doc_id) as doc_id", "text"
    )
    batch1 = fresh.unionByName(dup_of_seed)
    # batch 2: copies of batch-1 fresh docs + a novel doc
    dup_of_b1 = fresh.limit(3).selectExpr(
        "concat('zdup1:', doc_id) as doc_id", "text"
    )
    novel2 = spark.createDataFrame(
        [("znovel:1", "a genuinely new sentence about watermelon harvests "
          "and midnight trains that appears nowhere else at all")],
        "doc_id string, text string",
    )
    batch1.write.mode("append").parquet(src_dir)
    dup_of_b1.unionByName(novel2).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    query = start_incremental_index(
        spark, stream, path, ckpt, trigger={"availableNow": True},
        dedup_store=store,
    )
    assert query.awaitTermination(600), 'stream did not finish in 600s'

    aidx = load_artifact(spark, path)
    expected = seed.unionByName(fresh).unionByName(novel2)
    assert aidx.n_docs == expected.count()
    # search parity vs a batch build over the deduped corpus
    lidx = build_index(spark, expected, cache=False)
    q = "spark shuffle error"
    l = [(r["doc_id"], round(r["score"], 10)) for r in lidx.search_bm25(q, 10).collect()]
    a = [(r["doc_id"], round(r["score"], 10)) for r in aidx.search_bm25(q, 10).collect()]
    assert l == a


def test_streaming_dedup_replay_is_deterministic_noop(spark, corpus, tmp_path):
    """Crash-replay rule: re-running the same batches through a FRESH
    checkpoint (ids restart at 0, colliding with existing store
    partitions) must leave both the index and the store unchanged — the
    store read excludes the batch's own partition, so the novel set
    recomputes identically and the partition overwrite is a no-op."""
    from searchengine_spark.streaming import init_dedup_store

    path = str(tmp_path / "rpidx")
    store = str(tmp_path / "rpstore")
    src_dir = str(tmp_path / "rpincoming")

    seed = corpus.where("conv_id < 'conv-00000005'").select("doc_id", "text")
    build_artifact(spark, seed, path)
    init_dedup_store(spark, seed, store)

    batch = corpus.where(
        "conv_id >= 'conv-00000005' and conv_id < 'conv-00000009'"
    ).select("doc_id", "text").unionByName(
        seed.limit(2).selectExpr("concat('dup:', doc_id) as doc_id", "text")
    )
    batch.write.mode("append").parquet(src_dir)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .parquet(src_dir)
        )
        q = start_incremental_index(
            spark, stream, path, ckpt, trigger={"availableNow": True},
            dedup_store=store,
        )
        assert q.awaitTermination(600), 'stream did not finish in 600s'

    run(str(tmp_path / "ck1"))
    n1 = load_artifact(spark, path).n_docs
    snap1 = latest_snapshot(path)["snapshot_id"]
    store1 = sorted(
        tuple(r) for r in spark.read.option("basePath", store).parquet(store)
        .selectExpr("doc_id", "text_sha", "batch_id").collect()
    )
    run(str(tmp_path / "ck2"))  # same batch content, batch_id 0 again
    assert load_artifact(spark, path).n_docs == n1
    assert latest_snapshot(path)["snapshot_id"] == snap1
    store2 = sorted(
        tuple(r) for r in spark.read.option("basePath", store).parquet(store)
        .selectExpr("doc_id", "text_sha", "batch_id").collect()
    )
    assert store1 == store2


def test_streaming_percolation_matches_batch_twin(spark, corpus, tmp_path):
    """Streaming percolation over file-source micro-batches: the union of
    per-batch match partitions equals one batch percolate over the whole
    corpus; a vacuous stored query fails at launch."""
    from searchengine_spark.analysis.analyzer import make_analyze_udf
    from searchengine_spark.query.percolate import percolate
    from searchengine_spark.streaming.percolate_stream import (
        read_percolate_matches,
        start_percolate_stream,
    )
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    a = corpus.where("conv_id < 'conv-00000010'").select("doc_id", "text")
    b = corpus.where("conv_id >= 'conv-00000010'").select("doc_id", "text")
    a.write.mode("append").parquet(src_dir)
    b.write.mode("append").parquet(src_dir)

    queries = spark.createDataFrame(
        [
            ("q-marker", "zqmarkeralpha"),
            ("q-pair", "spark shuffle"),
            ("q-phraseword", "merge sort"),
        ],
        "query_id string, query string",
    )
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(src_dir)
    )
    q = start_percolate_stream(
        spark, stream, queries, out, ckpt, trigger={"availableNow": True}
    )
    assert q.awaitTermination(600), "percolate stream did not finish"

    got = sorted(
        (r.doc_id, r.query_id)
        for r in read_percolate_matches(spark, out).collect()
    )
    twin_docs = corpus.select(
        "doc_id", make_analyze_udf()(F.col("text")).alias("tokens")
    )
    want = sorted(
        (r.doc_id, r.query_id) for r in percolate(queries, twin_docs).collect()
    )
    assert got == want and got, "stream matches must equal the batch twin"

    # the prepared-queries cache is released when the query terminates
    # (one leaked entry per stream launch otherwise). Other fixtures keep
    # session-scoped caches, so compare the persistent-RDD count to a
    # fresh launch+stop rather than asserting emptiness; the listener bus
    # is async, so poll briefly
    import time as _time

    def _n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = _n_cached()
    q2 = start_percolate_stream(
        spark, stream, queries, out + "_r", ckpt + "_r",
        trigger={"availableNow": True},
    )
    assert q2.awaitTermination(600)
    for _ in range(20):
        if _n_cached() <= base:
            break
        _time.sleep(0.5)
    assert _n_cached() <= base, "prepared-queries cache not released on stop"

    # a vacuous stored query is rejected at launch, not mid-stream
    bad = spark.createDataFrame(
        [("q-bad", "the of and")], "query_id string, query string"
    )
    with pytest.raises(ValueError, match="no terms"):
        start_percolate_stream(
            spark, stream, bad, out + "2", ckpt + "2",
            trigger={"availableNow": True},
        )
