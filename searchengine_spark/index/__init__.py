from .engine import Index, build_index, build_postings, make_term_positions_udf


def __getattr__(name):
    # artifact layer re-exported lazily (keeps `import searchengine_spark.index`
    # light; artifact pulls in the codec + ordinal machinery)
    if name in {
        "ArtifactIndex", "build_artifact", "load_artifact", "compact",
        "append_segment", "upsert_documents", "latest_snapshot", "subcompact", "maybe_merge",
        "expire_snapshots", "read_snapshot", "describe_artifact",
        "create_branch", "drop_branch", "fast_forward", "list_branches",
        "head_snapshot", "create_tag", "remove_tag", "list_refs",
    }:
        from . import artifact

        return getattr(artifact, name)
    raise AttributeError(name)


__all__ = [
    "Index", "build_index", "build_postings", "make_term_positions_udf",
    "ArtifactIndex", "build_artifact", "load_artifact", "compact",
    "append_segment", "upsert_documents", "latest_snapshot", "subcompact", "maybe_merge",
    "expire_snapshots", "read_snapshot", "describe_artifact",
    "create_branch", "drop_branch", "fast_forward", "list_branches",
    "head_snapshot", "create_tag", "remove_tag", "list_refs",
]
