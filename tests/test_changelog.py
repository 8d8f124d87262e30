"""docs_added_between — Iceberg-style incremental (changelog) read over
the artifact snapshot log: appends and upserts surface once, deletes and
rewrites don't, and a rewrite that consumed unread appends raises with a
time-travel escape hatch."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.artifact import (
    append_segment,
    build_artifact,
    docs_added_between,
    load_artifact,
    subcompact,
    upsert_documents,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    """One artifact whose snapshot log exercises every changelog case:
    1: base build (d1-d3)   2: append (d4, d5)   3: delete d4
    4: upsert d5 (replace)  5: subcompact segments [1, 2]."""
    path = str(tmp_path_factory.mktemp("changelog") / "idx")
    build_artifact(spark, _df(spark, [
        ("d1", "alpha beta"), ("d2", "beta gamma"), ("d3", "gamma delta"),
    ]), path)
    append_segment(spark, _df(spark, [
        ("d4", "epsilon zeta"), ("d5", "zeta eta"),
    ]), path)
    idx = load_artifact(spark, path)
    idx.delete_ids(idx.spark.createDataFrame([("d4",)], "doc_id string"))
    upsert_documents(spark, _df(spark, [("d5", "theta iota")]), path)
    return path


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_changelog_append_minus_later_delete(spark, log_path):
    # since snap 1: d4+d5 appended, d4 deleted, d5 replaced by the upsert
    # version — exactly one live row per surviving doc
    got = docs_added_between(spark, log_path, 1)
    assert _ids(got) == ["d5"]
    assert got.count() == 1


def test_changelog_delete_only_range_is_empty(spark, log_path):
    assert docs_added_between(spark, log_path, 2, to_snapshot_id=3).count() == 0


def test_changelog_upsert_surfaces_new_version_only(spark, log_path):
    got = docs_added_between(spark, log_path, 3)
    assert _ids(got) == ["d5"]


def test_changelog_empty_and_invalid_ranges(spark, log_path):
    to_id = load_artifact(spark, log_path).snapshot["snapshot_id"]
    assert docs_added_between(spark, log_path, to_id).count() == 0
    with pytest.raises(ValueError, match="after target"):
        docs_added_between(spark, log_path, to_id + 5)


def test_changelog_across_rewrite_raises_with_time_travel_escape(
    spark, log_path
):
    idx = load_artifact(spark, log_path)
    pre_merge = idx.snapshot["snapshot_id"]
    segs = sorted(s["segment_id"] for s in idx.snapshot["segments"])
    subcompact(spark, log_path, segs[1:])  # fold the append+upsert segments
    # the unread appends were rewritten away: state-diff would silently
    # return nothing; the log walk detects it and points at time travel
    with pytest.raises(ValueError, match="time-travel"):
        docs_added_between(spark, log_path, 1)
    # the escape hatch: consume at the pre-rewrite snapshot (files persist
    # until expire_snapshots)
    got = docs_added_between(spark, log_path, 1, to_snapshot_id=pre_merge)
    assert _ids(got) == ["d5"]
    # and ranges that start AFTER the rewrite see nothing new
    post = load_artifact(spark, log_path).snapshot["snapshot_id"]
    assert docs_added_between(spark, log_path, post).count() == 0


def test_changelog_scan_is_partition_pruned(spark, log_path):
    """Segment membership must reach the docs scan as a seg partition
    filter (directory pruning), not a post-scan filter."""
    got = docs_added_between(spark, log_path, 1, to_snapshot_id=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg_filter = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ][0]
    assert "seg" in seg_filter


def test_changelog_append_with_compaction_like_source_desc(spark, tmp_path):
    """Regression: rewrite detection uses the structured lineage op field,
    not the free-text source string — an append whose source_desc happens
    to start with 'compaction of' must still surface."""
    path = str(tmp_path / "opfield")
    build_artifact(spark, _df(spark, [("a", "x y")]), path)
    append_segment(
        spark, _df(spark, [("b", "y z")]), path,
        source_desc="compaction of upstream exports (a plain append)",
    )
    assert _ids(docs_added_between(spark, path, 1)) == ["b"]
