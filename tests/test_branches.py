"""Iceberg-style branches + write-audit-publish over the snapshot log:
staged appends invisible to main, fast-forward publish, divergence
refusal, global snapshot/segment id uniqueness across branches, branch
heads pinned through expiry, changelog confined to the main chain."""

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.artifact import (
    append_segment,
    build_artifact,
    create_branch,
    create_tag,
    docs_added_between,
    drop_branch,
    expire_snapshots,
    fast_forward,
    head_snapshot,
    list_branches,
    list_snapshots,
    load_artifact,
)


def _corpus(spark, ids, marker="base"):
    return spark.createDataFrame(
        [(f"d-{i}", f"{marker} text token{i} shared") for i in ids],
        "doc_id string, text string",
    )


@pytest.fixture()
def art(spark, tmp_path):
    path = str(tmp_path / "branched")
    build_artifact(
        spark, _corpus(spark, range(6)), path, analyzer="punctuation",
        source_desc="base",
    )
    return path


def test_wap_stage_audit_publish(spark, art):
    main_before = head_snapshot(art)["snapshot_id"]
    create_branch(art, "audit")
    # stage: new docs land on the branch, with a searchable marker term
    staged = append_segment(
        spark,
        _corpus(spark, range(100, 103), marker="zqstaged"),
        art,
        branch="audit",
    )
    assert staged.search_keyword("zqstaged").count() == 3
    # main readers see NOTHING staged (default load resolves main ref)
    main = load_artifact(spark, art)
    assert main.snapshot["snapshot_id"] == main_before
    assert main.search_keyword("zqstaged").count() == 0
    # audit: the branch ref reads the staged snapshot
    audit = load_artifact(spark, art, ref="audit")
    assert audit.search_keyword("zqstaged").count() == 3
    # publish: fast-forward main to the audited head
    new_head = fast_forward(art, "main", "audit")
    assert new_head == audit.snapshot["snapshot_id"]
    assert load_artifact(spark, art).search_keyword("zqstaged").count() == 3


def test_branch_and_main_ids_never_collide(spark, art):
    create_branch(art, "audit")
    staged = append_segment(
        spark, _corpus(spark, [200], marker="zqa"), art, branch="audit"
    )
    mained = append_segment(spark, _corpus(spark, [300], marker="zqb"), art)
    # distinct snapshot ids AND distinct segment ids (no directory clash)
    assert staged.snapshot["snapshot_id"] != mained.snapshot["snapshot_id"]
    seg_a = {s["segment_id"] for s in staged.snapshot["segments"]}
    seg_b = {s["segment_id"] for s in mained.snapshot["segments"]}
    assert (seg_a - seg_b) and (seg_b - seg_a)  # each has its own new seg
    # main advanced to its own commit; branch kept its own head
    assert list_branches(art)["main"] == mained.snapshot["snapshot_id"]
    assert list_branches(art)["audit"] == staged.snapshot["snapshot_id"]
    # both sides read their own marker and not the other's
    assert load_artifact(spark, art).search_keyword("zqb").count() == 1
    assert load_artifact(spark, art).search_keyword("zqa").count() == 0
    assert load_artifact(spark, art, ref="audit").search_keyword("zqa").count() == 1
    assert load_artifact(spark, art, ref="audit").search_keyword("zqb").count() == 0


def test_fast_forward_refuses_divergence(spark, art):
    create_branch(art, "audit")
    append_segment(spark, _corpus(spark, [201], marker="zqa"), art, branch="audit")
    append_segment(spark, _corpus(spark, [301], marker="zqb"), art)  # main moves too
    with pytest.raises(ValueError, match="diverged"):
        fast_forward(art, "main", "audit")


def test_expire_keeps_branch_heads_and_main(spark, art):
    create_branch(art, "audit")
    append_segment(spark, _corpus(spark, [210], marker="zqa"), art, branch="audit")
    append_segment(spark, _corpus(spark, [211], marker="zqa2"), art, branch="audit")
    main_head = list_branches(art)["main"]
    # newest files by id are the STAGED snapshots; keep_last=1 must still
    # keep main's head (branch-pinning), or default readers break
    expire_snapshots(art, keep_last=1)
    main = load_artifact(spark, art)
    assert main.snapshot["snapshot_id"] == main_head
    assert main.search_keyword("shared").count() == 6
    audit = load_artifact(spark, art, ref="audit")
    assert audit.search_keyword("zqa2").count() == 1


def test_changelog_follows_main_chain_only(spark, art):
    from_id = head_snapshot(art)["snapshot_id"]
    create_branch(art, "audit")
    append_segment(spark, _corpus(spark, [220], marker="zqa"), art, branch="audit")
    mained = append_segment(spark, _corpus(spark, [320], marker="zqb"), art)
    # main changelog: only the main append, even though the staged commit
    # holds a lower snapshot id than main's head
    delta = docs_added_between(spark, art, from_id)
    ids = {r.doc_id for r in delta.select("doc_id").collect()}
    assert ids == {"d-320"}
    # after publish... main diverged, so ff refuses; read the branch delta
    # directly against its own head instead
    audit_head = list_branches(art)["audit"]
    delta_audit = docs_added_between(spark, art, from_id, audit_head)
    assert {r.doc_id for r in delta_audit.select("doc_id").collect()} == {"d-220"}
    assert mained.snapshot["snapshot_id"] == list_branches(art)["main"]


def test_streaming_replay_guard_is_per_branch(spark, art):
    create_branch(art, "audit")
    first = append_segment(
        spark, _corpus(spark, [230], marker="zqa"), art,
        branch="audit", stream_batch_id=7,
    )
    replay = append_segment(
        spark, _corpus(spark, [230], marker="zqa"), art,
        branch="audit", stream_batch_id=7,
    )
    assert replay.snapshot["snapshot_id"] == first.snapshot["snapshot_id"]
    assert replay.search_keyword("zqa").count() == 1  # no duplicate append


def test_branch_name_hygiene(spark, art):
    create_tag(art, "v1")
    with pytest.raises(ValueError, match="tag"):
        create_branch(art, "v1")
    create_branch(art, "audit")
    with pytest.raises(ValueError, match="branch"):
        create_tag(art, "audit")
    with pytest.raises(ValueError, match="already points"):
        create_branch(art, "audit")
    with pytest.raises(ValueError, match="managed by fast_forward"):
        create_branch(art, "main")
    with pytest.raises(ValueError, match="cannot drop"):
        drop_branch(art, "main")
    drop_branch(art, "audit")
    with pytest.raises(KeyError):
        load_artifact(spark, art, ref="audit")


def test_publish_survives_expiry_of_interior_chain(spark, art):
    """The bricking scenario: stage TWO appends, expire with keep_last=1
    (interior staged snapshot is not a head), then publish. Expiry must
    pin the branch head's parent chain or fast_forward misreads the
    never-diverged history as diverged."""
    create_branch(art, "audit")
    append_segment(spark, _corpus(spark, [240], marker="zqa"), art, branch="audit")
    append_segment(spark, _corpus(spark, [241], marker="zqb"), art, branch="audit")
    expire_snapshots(art, keep_last=1)
    new_head = fast_forward(art, "main", "audit")
    main = load_artifact(spark, art)
    assert main.snapshot["snapshot_id"] == new_head
    assert main.search_keyword("zqa").count() == 1
    assert main.search_keyword("zqb").count() == 1


def test_tag_and_describe_default_to_main_not_staged(spark, art):
    from searchengine_spark.index.artifact import describe_artifact, list_refs

    main_head = head_snapshot(art)["snapshot_id"]
    create_branch(art, "audit")
    append_segment(spark, _corpus(spark, [250], marker="zqa"), art, branch="audit")
    # default tag pins MAIN's head, not the newest (staged) snapshot file
    create_tag(art, "release")
    assert list_refs(art)["release"] == main_head
    # ops summary describes what default readers serve
    assert describe_artifact(art)["snapshot_id"] == main_head


def test_delete_refuses_non_head_and_leaves_no_commit(spark, art):
    before = list_snapshots(art)
    append_segment(spark, _corpus(spark, [260], marker="zqa"), art)
    old = load_artifact(spark, art, snapshot_id=head_snapshot(art)["parent_id"])
    ids = old.spark.createDataFrame([("d-0",)], "doc_id string")
    with pytest.raises(ValueError, match="main is at"):
        old.delete_ids(ids)
    # the refusal happened before any snapshot commit
    assert len(list_snapshots(art)) == len(before) + 1  # only the append


def test_compact_rerun_same_out_path_is_idempotent(spark, art, tmp_path):
    from searchengine_spark.index.artifact import compact

    out = str(tmp_path / "compacted")
    first = compact(spark, art, out)
    again = compact(spark, art, out)  # scheduler retry: must not crash
    assert again.snapshot["snapshot_id"] > first.snapshot["snapshot_id"]
    assert again.search_keyword("shared").count() == 6


def test_staged_upsert_invisible_to_main_and_crash_windows(spark, art, monkeypatch):
    """VERDICT r3 #6: the adversarial reader-during-staging case, end to
    end — a staging branch holds an UNPUBLISHED upsert (tombstone + new
    segment in one snap) while main readers keep reading, plus the two
    crash windows: (a) mid-commit during the staged upsert, (b) between
    staging and publish."""
    import searchengine_spark.index.artifact as am
    from searchengine_spark.index.artifact import upsert_documents

    main_before = head_snapshot(art)["snapshot_id"]
    snaps_before = len(list_snapshots(art))
    create_branch(art, "stage")

    # (a) crash DURING the staged upsert: segment + tombstone files are
    # on disk but the atomic snapshot flip never happens
    real_commit = am._commit_snapshot

    def boom(path, snap):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(am, "_commit_snapshot", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        upsert_documents(
            spark, _corpus(spark, [1, 50], marker="zqcrash"), art,
            branch="stage",
        )
    monkeypatch.setattr(am, "_commit_snapshot", real_commit)
    # no commit, no branch movement, nothing readable on either ref
    assert len(list_snapshots(art)) == snaps_before
    assert head_snapshot(art)["snapshot_id"] == main_before
    assert head_snapshot(art, "stage")["snapshot_id"] == main_before
    assert load_artifact(spark, art).search_keyword("zqcrash").count() == 0
    assert load_artifact(spark, art, ref="stage").search_keyword("zqcrash").count() == 0

    # stage the real upsert: replace d-1, insert d-50 — on the branch only
    staged = upsert_documents(
        spark, _corpus(spark, [1, 50], marker="zqstagedup"), art,
        branch="stage",
    )
    assert staged.search_keyword("zqstagedup").count() == 2
    # exactly ONE live version of the replaced d-1 at the branch head,
    # and it is the staged replacement (AND of old-vs-new marker terms)
    assert staged.search_keyword("token1").count() == 1
    assert staged.search_and(["zqstagedup", "token1"]).count() == 1
    assert staged.search_and(["base", "token1"]).count() == 0

    # (b) crash between staging and publish == fast_forward never ran:
    # concurrent main readers still see the OLD d-1 and no d-50
    main = load_artifact(spark, art)
    assert main.snapshot["snapshot_id"] == main_before
    assert main.search_keyword("zqstagedup").count() == 0
    assert main.search_keyword("token1").count() == 1
    assert main.search_and(["base", "token1"]).count() == 1

    # recovery: publish flips main to BOTH changes at once
    new_head = fast_forward(art, "main", "stage")
    assert new_head == staged.snapshot["snapshot_id"]
    pub = load_artifact(spark, art)
    assert pub.search_keyword("zqstagedup").count() == 2
    assert pub.search_keyword("token1").count() == 1
    assert pub.search_and(["zqstagedup", "token1"]).count() == 1
    assert pub.search_and(["base", "token1"]).count() == 0
