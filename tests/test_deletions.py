"""Tombstone deletion semantics (reference ``deleteDocuments``,
``InvertedIndexManager.java:677-715``): deleted docs vanish from every query
kind at query time; stats stay stale until compaction physically purges
(``InvertedIndex.java:640-697``); tombstones persist across snapshot
reloads."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures import doc_key_col, transcripts_df
from searchengine_spark.index import build_index
from searchengine_spark.index.artifact import build_artifact, compact, load_artifact


@pytest.fixture()
def corpus(spark):
    return (
        transcripts_df(spark, "tiny")
        .withColumn("doc_id", doc_key_col())
        .select("doc_id", "text")
    )


def test_logical_delete_filters_all_query_kinds(spark, corpus):
    idx = build_index(spark, corpus, cache=False)
    victims = {r["doc_id"] for r in idx.search_keyword("zqmarkeralpha").collect()}
    assert victims
    n = idx.delete_documents("zqmarkeralpha")
    assert n == len(victims)
    assert idx.search_keyword("zqmarkeralpha").count() == 0
    for res in [
        idx.search_and("error function"),
        idx.search_or("elizabeth darcy"),
        idx.search_phrase("merge sort algorithm"),
        idx.search_bm25("zqmarkeralpha function", 50),
    ]:
        assert victims.isdisjoint({r["doc_id"] for r in res.collect()})
    # deleting again is a no-op (already tombstoned)
    assert idx.delete_documents("zqmarkeralpha") == 0
    # the batched path shares postings_for_terms -> filter_deleted, so
    # tombstones must filter it identically (incl. the single-query
    # delegation shape)
    batch = idx.search_bm25_batch(
        {"a": "zqmarkeralpha function", "b": "error function"}, 50
    ).collect()
    assert victims.isdisjoint({r["doc_id"] for r in batch})
    one = idx.search_bm25_batch({"a": "zqmarkeralpha function"}, 50).collect()
    assert victims.isdisjoint({r["doc_id"] for r in one})


def test_artifact_delete_persists_and_purges(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    aidx = build_artifact(spark, corpus, path, n_segments=2)
    before = aidx.search_bm25("spark shuffle error", 10).collect()
    victims = {r["doc_id"] for r in aidx.search_keyword("zqmarkeralpha").collect()}
    assert victims
    n = aidx.delete_documents("zqmarkeralpha")
    assert n == len(victims)

    # a fresh load of the committed snapshot sees the tombstones
    reloaded = load_artifact(spark, path)
    assert reloaded.snapshot["snapshot_id"] == aidx.snapshot["snapshot_id"]
    assert reloaded.search_keyword("zqmarkeralpha").count() == 0
    assert victims.isdisjoint(
        {r["doc_id"] for r in reloaded.search_bm25("zqmarkeralpha function", 50).collect()}
    )
    # stats stay stale pre-compaction (reference parity)
    assert reloaded.document_frequency("zqmarkeralpha") == len(victims)

    # compaction purges physically and refreshes stats
    cidx = compact(spark, path, str(tmp_path / "compacted"))
    assert cidx.n_docs == aidx.n_docs - len(victims)
    assert cidx.document_frequency("zqmarkeralpha") == 0
    assert cidx.search_keyword("zqmarkeralpha").count() == 0
    # docs untouched by the delete keep their raw postings
    survivors = {
        (r["doc_id"], r["term"], r["tf"])
        for r in cidx.postings.collect()
    }
    orig = {
        (r["doc_id"], r["term"], r["tf"])
        for r in aidx.postings.collect()
        if r["doc_id"] not in victims
    }
    assert survivors == orig


def test_duplicate_docid_query_semantics(spark, corpus, tmp_path):
    """A doc_id appended in two segments (legal transient state) must not
    corrupt queries: AND takes distinct terms (no cross-instance false
    positives from row counting), phrase doesn't hit DUPLICATE_MAP_KEY,
    and ranked results stay one-row-per-doc_id with single-instance scores
    on BOTH paths (WAND == exhaustive == pre-duplication)."""
    from searchengine_spark.index.artifact import (
        append_segment,
        build_artifact,
        load_artifact,
    )

    path = str(tmp_path / "dupq")
    base = corpus.where("conv_id < 'conv-00000012'").select("doc_id", "text")
    dup = corpus.where(
        "conv_id >= 'conv-00000004' and conv_id < 'conv-00000008'"
    ).select("doc_id", "text")
    clean = build_artifact(spark, base, str(tmp_path / "clean"))
    build_artifact(spark, base, path)
    append_segment(spark, dup, path, stream_batch_id=7)  # duplicates
    aidx = load_artifact(spark, path)

    for q in ("error function", "spark shuffle"):
        want = {r["doc_id"] for r in clean.search_and(q).collect()}
        got = {r["doc_id"] for r in aidx.search_and(q).collect()}
        assert got == want, f"AND {q!r} differs under duplication"
    want_ph = {r["doc_id"] for r in clean.search_phrase("merge sort").collect()}
    got_ph = {r["doc_id"] for r in aidx.search_phrase("merge sort").collect()}
    assert got_ph == want_ph

    # ranked: scores legitimately shift vs the clean index (N/df count
    # instances), so the invariants are WAND == exhaustive on the SAME
    # artifact, one row per doc_id, and single-instance (non-doubled)
    # scores: every duplicated doc's score must equal some clean doc's
    # per-term partial structure — cheapest robust check: dedupe holds and
    # the duplicated docs appear at most once with a finite score
    q = "spark shuffle error"
    wand_rk = [
        (r["doc_id"], round(r["score"], 9))
        for r in aidx.search_bm25(q, 10).collect()
    ]
    exh_rk = [
        (r["doc_id"], round(r["score"], 9))
        for r in aidx.search_bm25(q, None, mode="exhaustive").collect()[:10]
    ]
    assert wand_rk == exh_rk
    assert len({d for d, _ in wand_rk}) == len(wand_rk)  # no dup rows


def test_wand_theta_ignores_deleted_high_scorers(spark, corpus, tmp_path):
    """After deleting the top doc for a query, WAND must return the same
    ranking an exhaustive scorer does over the survivors."""
    path = str(tmp_path / "idx2")
    aidx = build_artifact(spark, corpus, path)
    top = aidx.search_bm25("elizabeth pride prejudice", 1).collect()[0]["doc_id"]
    aidx.tombstones = spark.createDataFrame([(top,)], "doc_id string")
    wand = [
        (r["doc_id"], round(r["score"], 10))
        for r in aidx.search_bm25("elizabeth pride prejudice", 5, mode="wand").collect()
    ]
    exh = [
        (r["doc_id"], round(r["score"], 10))
        for r in aidx.search_bm25(
            "elizabeth pride prejudice", None, mode="exhaustive"
        ).collect()[:5]
    ]
    assert top not in [d for d, _ in wand]
    assert wand == exh


def test_upsert_replaces_and_inserts(spark, tmp_path):
    """upsert_documents: existing doc_ids are replaced (old text no longer
    matches, new text does), new doc_ids are plain inserts; n_docs counts
    live docs; compaction purges the old versions physically; time travel
    to the pre-upsert snapshot still reads the old content."""
    from pyspark.sql import functions as F

    from searchengine_spark.index.artifact import (
        build_artifact,
        compact,
        load_artifact,
        read_snapshot,
        upsert_documents,
    )

    path = str(tmp_path / "ups")
    base = spark.createDataFrame(
        [(str(i), f"original text number{i} oldmarker") for i in range(10)],
        "doc_id string, text string",
    )
    build_artifact(spark, base, path, analyzer="punctuation")
    pre_snap = load_artifact(spark, path).snapshot["snapshot_id"]

    newer = spark.createDataFrame(
        [("3", "replaced text newmarker"),
         ("7", "replaced text newmarker"),
         ("42", "brandnew doc newmarker")],
        "doc_id string, text string",
    )
    aidx = upsert_documents(spark, newer, path)

    got_new = sorted(r["doc_id"] for r in aidx.search_keyword("newmarker").collect())
    assert got_new == ["3", "42", "7"]
    old = sorted(r["doc_id"] for r in aidx.search_keyword("oldmarker").collect())
    assert old == sorted(str(i) for i in range(10) if i not in (3, 7))
    # old versions of 3 and 7 are dead: their unique terms match nothing
    assert aidx.search_keyword("number3").count() == 0
    assert aidx.search_keyword("number7").count() == 0

    # upserting an upserted doc again replaces the latest version too
    aidx = upsert_documents(
        spark,
        spark.createDataFrame([("3", "third version finalmarker")],
                              "doc_id string, text string"),
        path,
    )
    assert [r["doc_id"] for r in aidx.search_keyword("finalmarker").collect()] == ["3"]
    assert aidx.search_keyword("newmarker").where(F.col("doc_id") == "3").count() == 0

    # time travel: the pre-upsert snapshot still shows the original doc 3
    tt = load_artifact(spark, path, snapshot_id=pre_snap)
    assert tt.search_keyword("number3").count() == 1

    # compaction purges tombstoned versions physically and keeps results
    cidx = compact(spark, path, str(tmp_path / "ups_c"))
    assert [r["doc_id"] for r in cidx.search_keyword("finalmarker").collect()] == ["3"]
    assert cidx.search_keyword("number3").count() == 0
    assert cidx.search_keyword("oldmarker").count() == 8


def test_upsert_is_single_snapshot_and_corpus_scans_see_replacements(
    spark, tmp_path
):
    """(a) One upsert = exactly ONE snapshot commit carrying BOTH the
    tombstones and the new segment (atomic MERGE semantics). (b) The
    doc_id-level corpus-scan filter (full_scan_search, document_iterator)
    keeps a replaced doc's LIVE version — only fully-dead doc_ids drop."""
    from searchengine_spark.index.artifact import (
        build_artifact,
        list_snapshots,
        load_artifact,
        upsert_documents,
    )

    path = str(tmp_path / "atomic")
    base = spark.createDataFrame(
        [(str(i), f"original number{i} oldmarker") for i in range(6)],
        "doc_id string, text string",
    )
    build_artifact(spark, base, path)
    n_before = len(list_snapshots(path))

    newer = spark.createDataFrame(
        [("2", "replacement newmarker text"), ("77", "brandnew newmarker")],
        "doc_id string, text string",
    )
    upsert_documents(spark, newer, path)
    assert len(list_snapshots(path)) == n_before + 1  # ONE commit
    snap = load_artifact(spark, path).snapshot
    assert snap["tombstones"], "tombstones missing from the upsert snapshot"
    assert any(
        "upsert" in s["lineage"].get("source", "") for s in snap["segments"]
    )

    # corpus-side scans: attach the post-upsert corpus; doc 2's live
    # replacement must appear, a keyword-deleted doc must not
    updated_corpus = base.where("doc_id <> '2'").unionByName(newer)
    aidx = load_artifact(spark, path).attach_corpus(updated_corpus)
    full = {r["doc_id"] for r in aidx.full_scan_search("newmarker").collect()}
    assert full == {"2", "77"}
    aidx.delete_documents("number3")
    it_ids = {d for d, _ in aidx.document_iterator()}
    assert "2" in it_ids and "77" in it_ids and "3" not in it_ids
