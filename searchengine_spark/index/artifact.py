"""Persisted compressed index artifact: segmented build, snapshot commit
log, checkpoint/resume, per-partition metrics + lineage, compaction.

This is the engine's durable form of the reference's on-disk segments
(``InvertedIndex.flush``, ``InvertedIndex.java:816-975``; segment metadata
``InvertedIndexManager.java:147-177,356-382``), re-thought for Spark:

- A *segment* is one committed increment of the build: three parquet
  datasets (``blocks/seg=N``, ``docs/seg=N``, ``stats/seg=N``) plus one
  JSON snapshot appended to ``_snapshots/``. The snapshot commit (atomic
  ``os.replace``) plays Iceberg's snapshot role: readers only see segments
  listed in the latest snapshot, and a killed build resumes from the last
  committed snapshot (north-rule checkpoint requirement). On a cluster with
  an Iceberg catalog the same layout maps 1:1 onto Iceberg appends; the JSON
  log keeps the sandbox dependency-free.
- Postings are packed into doc-ordinal-ordered, delta+varbyte-compressed
  blocks with block-max metadata (``blocks.py``) for WAND pruning.
- Skew defense: the packing shuffle is ``repartitionByRange(term, doc_ord)``
  — the range partitioner's sampled boundaries *split hot terms across many
  partitions* (each producing doc-disjoint block runs), which defuses
  hot-term skew strictly better than hash+salt while also delivering the
  doc order packing needs. Stats aggregation is a plain two-phase hash
  aggregate (map-side partial combine handles skew for sums).
- Per-segment doc ordinals live in disjoint ranges (``ordinals.SEG_SHIFT``),
  so appending segments never re-bases earlier ones — the reference's
  merge-time docID re-basing (``InvertedIndex.java:600,616,678``) vanishes.
- ``compact()`` rewrites all committed segments into one (the reference's
  ``mergeAllSegments``, ``InvertedIndexManager.java:384-452``, as one Spark
  job instead of a 4-thread pairwise merge).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .blocks import (
    BLOCK_SCHEMA,
    BLOCK_SIZE,
    pack_term_run,
    unpack_block,
    unpack_blocks_batch,
    unpack_blocks_batch_pos,
)
from .engine import Index
from .ordinals import assign_doc_ordinals, segment_base

PACKED_SCHEMA = f"part_id int, {BLOCK_SCHEMA}"
DECODED_SCHEMA = (
    "doc_ord long, term string, tf int, positions array<int>, dl int"
)
# non-positional decode omits the positions column entirely: materializing
# a batch-long object column of Nones pandas-side costs more than the
# whole varbyte decode (profiled: 3.6 s of 8 s on a 3.6M-posting scan);
# callers whose contract includes a null positions column add it JVM-side
# with F.lit(None).cast("array<int>") for free
DECODED_SCHEMA_NOPOS = "doc_ord long, term string, tf int, dl int"


def _null_positions():
    """JVM-side null positions column (see DECODED_SCHEMA_NOPOS note)."""
    return F.lit(None).cast("array<int>").alias("positions")


def decode_barrier(df: DataFrame, positional: bool) -> DataFrame:
    """The ONE way to cross the block-decode barrier: pairs the decoder
    with its schema by construction (they were previously paired by
    convention at every call site — a mismatched pair compiles fine and
    fails only at execution time with an Arrow schema error)."""
    return df.mapInPandas(
        _make_decoder(positional),
        schema=DECODED_SCHEMA if positional else DECODED_SCHEMA_NOPOS,
    )
N_BUCKETS = 16  # term-hash directory partitions per segment


def term_bucket_expr(term_col, n_buckets: int):
    """JVM-side term bucket: first 8 hex chars of md5(term) mod n. md5 (not
    xxhash64) so the SAME value is computable driver-side in pure Python
    (term_bucket) without a Spark job at query time."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def term_bucket(term: str, n_buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets

# ---------------------------------------------------------------------------
# snapshot log
# ---------------------------------------------------------------------------


def _snap_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def list_snapshots(path: str) -> list[str]:
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.startswith("snap-") and f.endswith(".json"))


def latest_snapshot(path: str) -> dict | None:
    snaps = list_snapshots(path)
    if not snaps:
        return None
    with open(os.path.join(_snap_dir(path), snaps[-1])) as fh:
        return json.load(fh)


def read_snapshot(path: str, snapshot_id: int) -> dict:
    """Load a SPECIFIC committed snapshot (time travel — Iceberg's
    ``VERSION AS OF``). Raises if it was never committed or was expired."""
    f = os.path.join(_snap_dir(path), f"snap-{snapshot_id:06d}.json")
    if not os.path.exists(f):
        raise FileNotFoundError(
            f"snapshot {snapshot_id} not found at {path} (expired or never committed)"
        )
    with open(f) as fh:
        return json.load(fh)


def _commit_snapshot(path: str, snap: dict) -> None:
    d = _snap_dir(path)
    os.makedirs(d, exist_ok=True)
    name = f"snap-{snap['snapshot_id']:06d}.json"
    final = os.path.join(d, name)
    if os.path.exists(final):
        # snapshot ids are allocated globally (_next_snapshot_id) so two
        # branches can never claim the same id; hitting this means a
        # writer bypassed the allocator — fail loudly, never overwrite
        # committed history
        raise FileExistsError(f"snapshot {snap['snapshot_id']} already committed at {path}")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(snap, fh, indent=1)
    os.replace(tmp, final)  # atomic commit point


def _next_snapshot_id(path: str) -> int:
    """Globally unique next snapshot id: max over EVERY committed snapshot
    file (not just some branch's head), so concurrent branch histories
    never collide on an id."""
    snaps = list_snapshots(path)
    if not snaps:
        return 1
    return int(snaps[-1][len("snap-"):-len(".json")]) + 1


def _next_segment_id(path: str, *snapshots: dict) -> int:
    """Globally unique next segment id: max over the given snapshots AND
    every ``seg=`` directory on disk — a staged branch's segment must not
    collide with one appended to main (both would otherwise take
    head-max + 1 and write the same blocks/docs/stats directories)."""
    mx = -1
    for snap in snapshots:
        for s in snap.get("segments", []):
            mx = max(mx, int(s["segment_id"]))
    base = os.path.join(path, "blocks")
    if os.path.isdir(base):
        for d in os.listdir(base):
            if d.startswith("seg="):
                mx = max(mx, int(d[4:]))
    return mx + 1


# --- named snapshot refs (Iceberg tags: pinned, human-named versions) -----


def _refs_file(path: str) -> str:
    return os.path.join(_snap_dir(path), "refs.json")


def list_refs(path: str) -> dict:
    """{tag_name: snapshot_id} for every named ref."""
    f = _refs_file(path)
    if not os.path.exists(f):
        return {}
    with open(f) as fh:
        return {k: int(v) for k, v in json.load(fh).items()}


def _write_refs(path: str, refs: dict) -> None:
    f = _refs_file(path)
    tmp = f + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(refs, fh, indent=1, sort_keys=True)
    os.replace(tmp, f)  # atomic, same discipline as snapshot commits


def create_tag(
    path: str, name: str, snapshot_id: int | None = None, replace: bool = False
) -> int:
    """Name a committed snapshot (Iceberg ``create_tag``): ``name`` resolves
    to that snapshot in ``load_artifact(ref=...)`` and PINS it — tagged
    snapshots (and the segment/tombstone files they list) survive
    ``expire_snapshots`` until the tag is removed. Defaults to the latest
    snapshot; raises on unknown snapshot ids and, without ``replace``, on
    existing names. Returns the resolved snapshot id. The default is the
    MAIN head — never the newest snapshot file, which may be an
    unpublished staged commit once a branch exists."""
    if snapshot_id is None:
        snap = head_snapshot(path, "main")
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under {path}")
        snapshot_id = int(snap["snapshot_id"])
    else:
        read_snapshot(path, snapshot_id)  # validate it exists
    refs = list_refs(path)
    if name in refs and not replace:
        raise ValueError(
            f"tag {name!r} already points at snapshot {refs[name]}; "
            "pass replace=True to move it"
        )
    if name in list_branches(path):
        raise ValueError(f"{name!r} already names a branch at {path}")
    refs[name] = int(snapshot_id)
    _write_refs(path, refs)
    return int(snapshot_id)


def remove_tag(path: str, name: str) -> int:
    """Drop a named ref (the snapshot becomes expirable again). Returns the
    snapshot id the tag pointed at; raises on unknown names."""
    refs = list_refs(path)
    if name not in refs:
        raise KeyError(f"tag {name!r} does not exist at {path}")
    sid = refs.pop(name)
    _write_refs(path, refs)
    return sid


# --- branches (Iceberg writable refs: write-audit-publish) -----------------
#
# Tags pin history; BRANCHES advance it. The WAP (write-audit-publish)
# pattern: stage appends on an audit branch (invisible to main readers),
# validate the staged snapshot, then fast_forward main to it. "main" is
# implicit (= latest snapshot) until the first create_branch pins it
# explicitly — from then on staged commits can hold HIGHER snapshot ids
# than main without becoming visible, because default reads resolve the
# main ref, never "newest file".


def _branches_file(path: str) -> str:
    return os.path.join(_snap_dir(path), "branches.json")


def list_branches(path: str) -> dict:
    """{branch_name: head_snapshot_id}; includes 'main' once pinned."""
    f = _branches_file(path)
    if not os.path.exists(f):
        return {}
    with open(f) as fh:
        return {k: int(v) for k, v in json.load(fh).items()}


def _write_branches(path: str, branches: dict) -> None:
    f = _branches_file(path)
    tmp = f + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(branches, fh, indent=1, sort_keys=True)
    os.replace(tmp, f)  # atomic, same discipline as snapshot commits


def head_snapshot(path: str, branch: str = "main") -> dict | None:
    """The snapshot a branch points at. 'main' falls back to the latest
    snapshot until explicitly pinned (pre-branching artifacts behave
    exactly as before); other names must exist."""
    branches = list_branches(path)
    if branch in branches:
        return read_snapshot(path, branches[branch])
    if branch == "main":
        return latest_snapshot(path)
    raise KeyError(f"unknown branch {branch!r} at {path}")


def _advance_branch(path: str, branch: str, snapshot_id: int) -> None:
    """Move a branch head after a commit. 'main' advances only once pinned
    (implicit main == latest needs no bookkeeping)."""
    branches = list_branches(path)
    if branch == "main" and "main" not in branches:
        return
    branches[branch] = int(snapshot_id)
    _write_branches(path, branches)


def create_branch(path: str, name: str, snapshot_id: int | None = None) -> int:
    """Create a writable branch (Iceberg ``create_branch``) at a committed
    snapshot (default: the current main head). Creating the FIRST branch
    pins main explicitly at its current head, so later staged commits —
    which take globally newer snapshot ids — stay invisible to default
    readers. Branch and tag names share a namespace (a ``ref=`` lookup
    must be unambiguous). Returns the branch's starting snapshot id."""
    if name == "main":
        raise ValueError("'main' is managed by fast_forward, not create_branch")
    if name in list_refs(path):
        raise ValueError(f"{name!r} already names a tag at {path}")
    branches = list_branches(path)
    if name in branches:
        raise ValueError(
            f"branch {name!r} already points at snapshot {branches[name]}"
        )
    main = head_snapshot(path, "main")
    if main is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    if snapshot_id is None:
        snapshot_id = int(main["snapshot_id"])
    else:
        read_snapshot(path, snapshot_id)  # validate it exists
    if "main" not in branches:
        branches["main"] = int(main["snapshot_id"])  # pin main first
    branches[name] = int(snapshot_id)
    _write_branches(path, branches)
    return int(snapshot_id)


def drop_branch(path: str, name: str) -> int:
    """Remove a branch ref (its unpublished snapshots become expirable).
    Returns the head snapshot id it pointed at."""
    if name == "main":
        raise ValueError("cannot drop 'main'")
    branches = list_branches(path)
    if name not in branches:
        raise KeyError(f"branch {name!r} does not exist at {path}")
    sid = branches.pop(name)
    _write_branches(path, branches)
    return sid


def _is_ancestor(path: str, ancestor_id: int, descendant_id: int) -> bool:
    """Walk the parent_id chain from ``descendant_id``; requires the chain's
    snapshots to still be on disk (expire keeps branch heads, not
    necessarily interior history — a broken chain reads as 'not an
    ancestor', and fast_forward reports it)."""
    sid = descendant_id
    while sid is not None:
        if sid == ancestor_id:
            return True
        f = os.path.join(_snap_dir(path), f"snap-{sid:06d}.json")
        if not os.path.exists(f):
            return False
        with open(f) as fh:
            sid = json.load(fh).get("parent_id")
    return False


def fast_forward(path: str, branch: str, to: str) -> int:
    """Publish: move ``branch`` (usually 'main') forward to the head of
    ``to`` (Iceberg ``fast_forward``). Requires the current ``branch`` head
    to be an ancestor of ``to``'s head — a diverged branch (commits on both
    sides) cannot be fast-forwarded and raises; rebuild the staging branch
    from the new main instead (the same rule Iceberg applies). Returns the
    new head snapshot id."""
    src = head_snapshot(path, to)
    dst = head_snapshot(path, branch)
    if src is None or dst is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    src_id, dst_id = int(src["snapshot_id"]), int(dst["snapshot_id"])
    if src_id == dst_id:
        return dst_id
    if not _is_ancestor(path, dst_id, src_id):
        raise ValueError(
            f"branch {branch!r} (snapshot {dst_id}) is not an ancestor of "
            f"{to!r} (snapshot {src_id}); histories diverged — cannot "
            "fast-forward"
        )
    branches = list_branches(path)
    branches[branch] = src_id
    _write_branches(path, branches)
    return src_id


# ---------------------------------------------------------------------------
# block packing (executor side)
# ---------------------------------------------------------------------------


def _make_packer(block_size: int, positional: bool):
    """mapInPandas fn: (term, doc_ord, tf, dl[, positions]) sorted within the
    partition by (term, doc_ord) -> packed block rows. Streams batches;
    memory is bounded by one term-run per partition slice (range-partitioned,
    so a hot term's run here is ~rows/partition, not its global df)."""

    def pack(batches):
        pid = TaskContext.get().partitionId()
        cur = None  # current term
        seq = 0
        b_ords: list = []
        b_tfs: list = []
        b_dls: list = []
        b_pos: list | None = [] if positional else None

        def flush_rows():
            nonlocal seq, b_ords, b_tfs, b_dls, b_pos
            if cur is None or not b_ords:
                return []
            rows = pack_term_run(
                cur,
                np.asarray(b_ords, dtype=np.int64),
                np.asarray(b_tfs, dtype=np.int64),
                np.asarray(b_dls, dtype=np.int64),
                b_pos,
                block_size=block_size,
                block_seq_start=seq,
            )
            seq += len(rows)
            b_ords, b_tfs, b_dls = [], [], []
            b_pos = [] if positional else None
            return rows

        for pdf in batches:
            out_rows = []
            terms = pdf["term"].to_numpy()
            ords = pdf["doc_ord"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["dl"].to_numpy()
            poss = pdf["positions"].to_numpy() if positional else None
            # boundaries of consecutive equal-term runs inside this batch
            cut = np.flatnonzero(terms[1:] != terms[:-1]) + 1
            starts = np.concatenate(([0], cut))
            ends = np.concatenate((cut, [len(terms)]))
            for s, e in zip(starts, ends):
                t = terms[s]
                if t != cur:
                    out_rows.extend(flush_rows())
                    cur = t
                    seq = 0
                b_ords.extend(ords[s:e])
                b_tfs.extend(tfs[s:e])
                b_dls.extend(dls[s:e])
                if positional:
                    b_pos.extend(poss[s:e])
                # cap buffer: emit complete blocks, carry the remainder
                if len(b_ords) >= block_size * 64:
                    keep = len(b_ords) % block_size
                    split = len(b_ords) - keep
                    rows = pack_term_run(
                        cur,
                        np.asarray(b_ords[:split], dtype=np.int64),
                        np.asarray(b_tfs[:split], dtype=np.int64),
                        np.asarray(b_dls[:split], dtype=np.int64),
                        b_pos[:split] if positional else None,
                        block_size=block_size,
                        block_seq_start=seq,
                    )
                    seq += len(rows)
                    out_rows.extend(rows)
                    b_ords = b_ords[split:]
                    b_tfs = b_tfs[split:]
                    b_dls = b_dls[split:]
                    if positional:
                        b_pos = b_pos[split:]
            if out_rows:
                df = pd.DataFrame(out_rows)
                df.insert(0, "part_id", pid)
                yield df
        tail = flush_rows()
        if tail:
            df = pd.DataFrame(tail)
            df.insert(0, "part_id", pid)
            yield df

    return pack


def _term_dictionary_col(term_col: pd.Series, counts: np.ndarray):
    """Per-posting term column as a pandas Categorical: the batch's unique
    terms once plus int codes, so the expansion to n_postings rows is a
    plain int ``np.repeat`` instead of repeating n_postings Python string
    objects.

    NOTE the win is pandas-side CPU only, NOT Arrow wire size: pyspark
    4.1.2's ArrowStreamPandasSerializer expands CategoricalDtype to
    ``categories.dtype`` (object strings) before building the Arrow array
    (``sql/pandas/serializers.py:450``), and the declared string schema
    pins ``arrow_type=pa.string()`` so an Arrow-native DictionaryArray
    would be cast back to a flat string array anyway. The serializer's
    ``astype`` expansion is a vectorized take on the category table, so
    the object-repeat cost moves from our loop into one C-level pass."""
    codes, uniques = pd.factorize(term_col)
    return pd.Categorical.from_codes(np.repeat(codes, counts), categories=uniques)


def _make_decoder(positional: bool):
    """mapInPandas fn: block rows -> exploded postings.

    Non-positional (schema ``DECODED_SCHEMA_NOPOS``) is fully
    batch-vectorized: ONE concatenated varbyte decode per column per Arrow
    batch (``blocks.unpack_blocks_batch``) and NO positions column — the
    per-block loop paid ~35 µs of numpy dispatch per tiny decode call plus
    a batch-long object column of ``None`` positions, together ~8x the
    batch form's cost on wide scans (BENCH.md session-15). This is the
    barrier every BM25 / WAND / boolean / batch query crosses.

    Positional (schema ``DECODED_SCHEMA``) is batch-vectorized the same
    way (``blocks.unpack_blocks_batch_pos`` — the ragged position payload
    decodes via one offsets-of-offsets concat pass, so the only remaining
    per-posting Python cost is slicing the flat array into the object
    column Arrow needs); blocks with a missing position payload (legacy /
    mixed input) fall back to the per-block loop for that Arrow batch."""

    if not positional:

        def decode_nopos(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                u = unpack_blocks_batch(
                    pdf["docs"].to_numpy(),
                    pdf["tfs"].to_numpy(),
                    pdf["dls"].to_numpy(),
                    pdf["first_ord"].to_numpy(),
                )
                yield pd.DataFrame(
                    {
                        "doc_ord": u["ords"],
                        "term": _term_dictionary_col(pdf["term"], u["counts"]),
                        "tf": u["tfs"].astype(np.int32),
                        "dl": u["dls"].astype(np.int32),
                    }
                )

        return decode_nopos

    def decode_rows(pdf):
        # per-block fallback for Arrow batches containing blocks without a
        # position payload (legacy / mixed input)
        ords_l, terms_l, tfs_l, dls_l, pos_l = [], [], [], [], []
        for row in pdf.to_dict("records"):
            u = unpack_block(row, with_positions=True)
            n = len(u["ords"])
            ords_l.append(u["ords"])
            tfs_l.append(u["tfs"])
            dls_l.append(u["dls"])
            terms_l.append(np.repeat(row["term"], n))
            if u["pos"] is not None:
                pos_l.extend(u["pos"])
            else:
                pos_l.extend([None] * n)
        if not ords_l:
            return None
        return pd.DataFrame(
            {
                "doc_ord": np.concatenate(ords_l),
                "term": np.concatenate(terms_l),
                "tf": np.concatenate(tfs_l).astype(np.int32),
                "positions": pos_l,
                "dl": np.concatenate(dls_l).astype(np.int32),
            }
        )

    def decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pos_col = pdf["pos"].to_numpy()
            if any(p is None or len(p) == 0 for p in pos_col):
                out = decode_rows(pdf)
                if out is not None:
                    yield out
                continue
            u = unpack_blocks_batch_pos(
                pdf["docs"].to_numpy(),
                pdf["tfs"].to_numpy(),
                pdf["dls"].to_numpy(),
                pos_col,
                pdf["first_ord"].to_numpy(),
            )
            # Arrow-native list column: one (offsets, values) pair for the
            # whole batch instead of one Python ndarray object per posting
            # — ~20-60x cheaper to build than np.split AND free to
            # serialize (the object column paid a second per-posting pass
            # inside the Arrow serializer). Offsets are int32 by Arrow's
            # list<int> layout; an Arrow batch is ~10k block rows, so the
            # flat position count stays far under 2^31.
            plens = u["pos_lengths"]
            offs = np.zeros(plens.size + 1, dtype=np.int64)
            np.cumsum(plens, out=offs[1:])
            pos_arrow = pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32)),
                pa.array(u["pos_flat"].astype(np.int32)),
            )
            yield pd.DataFrame(
                {
                    "doc_ord": u["ords"],
                    "term": _term_dictionary_col(pdf["term"], u["counts"]),
                    "tf": u["tfs"].astype(np.int32),
                    "positions": pd.arrays.ArrowExtensionArray(pos_arrow),
                    "dl": u["dls"].astype(np.int32),
                }
            )

    return decode


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def _build_segment(spark: SparkSession, *args, **kwargs) -> dict:
    """Build + write one segment under the build-scoped >=2-scan-waves conf
    (``session.scan_waves``); returns its snapshot entry (uncommitted)."""
    from ..session import scan_waves

    with scan_waves(spark):
        return _build_segment_impl(spark, *args, **kwargs)


def _build_segment_impl(
    spark: SparkSession,
    seg_corpus: DataFrame,
    path: str,
    seg: int,
    *,
    doc_id_col: str,
    text_col: str,
    analyzer: str,
    positional: bool,
    block_size: int,
    pack_partitions: int | None,
    n_buckets: int = N_BUCKETS,
) -> dict:
    from .engine import build_doc_terms, explode_doc_terms

    # persist the PRE-explode frame (one row per doc): same bytes as the
    # exploded postings but ~15x fewer cached row objects, and the doc
    # table (doc_id, dl) falls out below with NO groupBy shuffle
    doc_terms = build_doc_terms(
        seg_corpus, doc_id_col, text_col, analyzer, positional=positional
    ).persist()
    postings = explode_doc_terms(doc_terms, positional)

    # doc table: every corpus row is present (zero-token docs have dl=0)
    docs = doc_terms.select("doc_id", "dl")
    ords = assign_doc_ordinals(docs, base=segment_base(seg))
    docs_dir = os.path.join(path, "docs", f"seg={seg}")
    ords.write.mode("overwrite").parquet(docs_dir)

    # pack: range partition on (term, doc_ord) = skew-splitting + doc order.
    # 2x parallelism so each core gets >=2 waves (stragglers amortize).
    parts = pack_partitions or 2 * spark.sparkContext.defaultParallelism
    cols = ["term", "doc_ord", "tf", "dl"] + (["positions"] if positional else [])
    # persist: repartitionByRange's boundary-sampling pass would otherwise
    # execute the join lineage a second time
    p = (
        postings.join(ords.select("doc_id", "doc_ord"), "doc_id")
        .select(*cols)
        .persist()
    )
    ranged = p.repartitionByRange(
        parts, F.col("term"), F.col("doc_ord")
    ).sortWithinPartitions("term", "doc_ord")
    blocks = ranged.mapInPandas(
        _make_packer(block_size, positional), schema=PACKED_SCHEMA
    )
    blocks_dir = os.path.join(path, "blocks", f"seg={seg}")
    # bucket=<term-hash> directory partitions: query-term lookups prune whole
    # directories (PartitionFilters), which at 10^12-turn scale is the
    # difference between listing thousands vs millions of files.
    # n_buckets=0 = unbucketed (term_bucket_expr would be `% 0`, a
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode) — same guard as the
    # sub/compact write paths
    if n_buckets:
        blocks = blocks.withColumn(
            "bucket", term_bucket_expr(F.col("term"), n_buckets)
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(blocks_dir)
    else:
        blocks.write.mode("overwrite").parquet(blocks_dir)
    p.unpersist()

    # per-segment term stats (df, cf) — two-phase hash agg, skew-safe
    stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    stats_dir = os.path.join(path, "stats", f"seg={seg}")
    stats.write.mode("overwrite").parquet(stats_dir)

    n_docs = ords.count()
    ords.unpersist()
    doc_terms.unpersist()

    # metrics from the committed files (read-back doubles as a write check);
    # explicit schema: an empty segment writes no files under partitionBy
    written = spark.read.schema(f"{PACKED_SCHEMA}, bucket int").parquet(blocks_dir)
    size_expr = (
        F.length("docs") + F.length("tfs") + F.length("dls") + F.length("pos")
    )
    per_part = (
        written.groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("blocks"),
            F.sum("n").alias("postings"),
            F.sum(size_expr).alias("bytes"),
        )
        .orderBy("part_id")
        .collect()
    )
    partitions = [
        {
            "part_id": r["part_id"],
            "blocks": r["blocks"],
            "postings": int(r["postings"]),
            "bytes": int(r["bytes"]),
        }
        for r in per_part
    ]
    seg_stats = spark.read.parquet(stats_dir).agg(
        F.sum("cf").alias("total_tokens"), F.count(F.lit(1)).alias("n_terms")
    ).collect()[0]
    return {
        "segment_id": seg,
        "n_docs": n_docs,
        "n_terms": int(seg_stats["n_terms"] or 0),
        "total_tokens": int(seg_stats["total_tokens"] or 0),
        "n_postings": sum(x["postings"] for x in partitions),
        "n_blocks": sum(x["blocks"] for x in partitions),
        "bytes": sum(x["bytes"] for x in partitions),
        "partitions": partitions,
    }


def build_artifact(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "composable",
    positional: bool = True,
    n_segments: int = 1,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    n_buckets: int = N_BUCKETS,
    pack_partitions: int | None = None,
    resume: bool = True,
    source_desc: str = "",
    segment_col: str | None = None,
    fail_after_segments: int | None = None,
) -> "ArtifactIndex":
    """Build (or resume building) the persisted index at ``path``.

    Segmentation (each segment commits its own snapshot, so a killed build
    re-run with the same arguments resumes from the last commit):

    - default: ``n_segments`` disjoint doc sets by
      ``pmod(xxhash64(doc_id), n_segments)`` — a full corpus pass per
      segment (fine when the corpus fits a few passes);
    - ``segment_col``: one segment per distinct value of that column
      (sorted) — the realistic 10^12-turn pattern. With a source table
      partitioned on ``segment_col`` (e.g. an ingestion-date column), each
      segment's equality filter becomes a *partition-pruned* scan, so every
      segment reads only its own slice of the table. Late-arriving values
      go through ``append_segment``.

    ``fail_after_segments`` is a test hook simulating a mid-build crash.
    """
    config = {
        "analyzer": analyzer,
        "positional": positional,
        "block_size": block_size,
        "k1": k1,
        "b": b,
        "n_segments": n_segments,
        "n_buckets": n_buckets,
        "doc_id_col": doc_id_col,
        "text_col": text_col,
        "segment_col": segment_col,
    }
    seg_values = None
    if segment_col is not None:
        seg_values = [
            r["v"]
            for r in corpus.select(F.col(segment_col).alias("v"))
            .distinct()
            .orderBy("v")
            .collect()
        ]
        n_segments = len(seg_values)
        config["n_segments"] = n_segments
    prev = head_snapshot(path) if resume else None
    if prev is not None and prev["config"] != config:
        raise ValueError(
            f"artifact at {path} was built with a different config: "
            f"{prev['config']} != {config}"
        )
    done = {s["segment_id"] for s in prev["segments"]} if prev else set()
    parent = prev["snapshot_id"] if prev else None
    segments = list(prev["segments"]) if prev else []

    built = 0
    for seg in range(n_segments):
        if seg in done:
            continue
        if fail_after_segments is not None and built >= fail_after_segments:
            raise RuntimeError(f"simulated crash after {built} segments")
        if seg_values is not None:
            seg_filter = f"{segment_col} == {seg_values[seg]!r}"
            seg_corpus = corpus.where(F.col(segment_col) == seg_values[seg])
        elif n_segments == 1:
            seg_filter = "full corpus"
            seg_corpus = corpus
        else:
            seg_filter = f"pmod(xxhash64({doc_id_col}), {n_segments}) == {seg}"
            seg_corpus = corpus.where(
                F.pmod(F.xxhash64(F.col(doc_id_col).cast("string")), n_segments)
                == seg
            )
        t0 = time.time()
        entry = _build_segment(
            spark,
            seg_corpus,
            path,
            seg,
            doc_id_col=doc_id_col,
            text_col=text_col,
            analyzer=analyzer,
            positional=positional,
            block_size=block_size,
            pack_partitions=pack_partitions,
            n_buckets=n_buckets,
        )
        entry["build_sec"] = round(time.time() - t0, 3)
        entry["lineage"] = {"op": "append", "source": source_desc,
                            "filter": seg_filter}
        segments.append(entry)
        snap_id = _next_snapshot_id(path)
        _commit_snapshot(
            path,
            {
                "snapshot_id": snap_id,
                "parent_id": parent,
                "created_unix": time.time(),
                "config": config,
                "segments": segments,
            },
        )
        _advance_branch(path, "main", snap_id)
        parent = snap_id
        built += 1
    return load_artifact(spark, path)


def append_segment(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    source_desc: str = "",
    stream_batch_id: int | None = None,
    pack_partitions: int | None = None,
    branch: str = "main",
) -> "ArtifactIndex":
    """Append ONE new segment of docs to an existing artifact (the LSM
    "flush" increment; config inherited from the artifact). Idempotent per
    ``stream_batch_id``: a micro-batch replayed after a failure finds its id
    in the snapshot lineage and becomes a no-op (exactly-once appends under
    Structured Streaming's at-least-once foreachBatch).

    ``branch``: commit on a staging branch (``create_branch`` first) for
    write-audit-publish — the staged snapshot is invisible to default
    (main) readers until ``fast_forward(path, "main", branch)``. The
    replay guard checks the BRANCH's lineage, so exactly-once holds per
    branch. Returns the index AT the new snapshot, whichever branch it
    landed on."""
    prev = head_snapshot(path, branch)
    if prev is None:
        raise FileNotFoundError(f"no artifact at {path}; build_artifact first")
    cfg = dict(prev["config"])
    segments = list(prev["segments"])
    if stream_batch_id is not None:
        for s in segments:
            lin = s.get("lineage", {})
            # a merge (subcompact) carries the folded segments' batch ids
            # forward in merged_stream_batch_ids, so a batch replayed AFTER
            # its segment was merged away is still recognized as a no-op
            if stream_batch_id == lin.get("stream_batch_id") or (
                stream_batch_id in lin.get("merged_stream_batch_ids", ())
            ):
                # replayed batch: no-op at the branch head
                return load_artifact(
                    spark, path, snapshot_id=prev["snapshot_id"]
                )
    seg = _next_segment_id(path, prev)
    t0 = time.time()
    entry = _build_segment(
        spark,
        corpus,
        path,
        seg,
        doc_id_col=cfg["doc_id_col"],
        text_col=cfg["text_col"],
        analyzer=cfg["analyzer"],
        positional=cfg["positional"],
        block_size=cfg["block_size"],
        pack_partitions=pack_partitions,
        n_buckets=cfg.get("n_buckets", 0),
    )
    entry["build_sec"] = round(time.time() - t0, 3)
    entry["lineage"] = {
        "op": "append",
        "source": source_desc,
        "filter": "appended batch",
        "stream_batch_id": stream_batch_id,
    }
    segments.append(entry)
    cfg["n_segments"] = len(segments)
    snap = dict(prev)
    snap_id = _next_snapshot_id(path)
    snap.update(
        {
            "snapshot_id": snap_id,
            "parent_id": prev["snapshot_id"],
            "created_unix": time.time(),
            "config": cfg,
            "segments": segments,
        }
    )
    _commit_snapshot(path, snap)
    _advance_branch(path, branch, snap_id)
    return load_artifact(spark, path, snapshot_id=snap_id)


# ---------------------------------------------------------------------------
# load / query
# ---------------------------------------------------------------------------


@dataclass
class ArtifactIndex(Index):
    """Index backed by the persisted block artifact. All logical-index query
    operators work unchanged (``postings`` is a decode view over the blocks);
    BM25 additionally gets the block-max WAND path."""

    path: str = ""
    blocks: DataFrame | None = None
    docs_tbl: DataFrame | None = None  # (doc_id, dl, doc_ord)
    block_size: int = BLOCK_SIZE
    positional: bool = True
    n_buckets: int = 0
    snapshot: dict | None = None

    def blocks_for_terms(self, terms) -> DataFrame:
        """Block rows for the given terms, with the bucket partition filter
        (directory pruning) in front of the term filter (row-group pruning).
        Bucket ids come from the pure-Python md5 twin — no Spark job."""
        terms = list(terms)
        out = self.blocks
        if self.n_buckets:
            buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
            out = out.where(F.col("bucket").isin(buckets))
        return out.where(F.col("term").isin(terms))

    def postings_for_terms(
        self, terms, positional: bool = True, spread: bool = False
    ) -> DataFrame:
        """``positional=False``: decode WITHOUT the position bytes — the
        ``pos`` parquet column is projected out of the block scan, so the
        (dominant) position data never leaves disk. ``positions`` comes
        back null; callers asking for it must use the default.

        ``spread=True``: round-robin-repartition the filtered block rows
        BEFORE the decode barrier. The blocks parquet is term-sorted
        (repartitionByRange pack), so a hot term's blocks sit in few row
        groups and input splitting cannot break them apart — measured on a
        1.1M-turn artifact, one task decoded 21k of 22k block rows and the
        whole batch ran at single-task speed regardless of core count.
        The exchange moves exactly the compressed bytes that are about to
        be decoded anyway (never the corpus), one extra hop, and caps
        straggler size at total/parallelism. Meant for workload-scale
        scans (search_bm25_batch's union-vocabulary decode); leave False
        for tiny single-query scans where an exchange is pure overhead."""
        blocks = self.blocks_for_terms(terms)
        if spread:
            # one wave of decode tasks: mapInPandas pays a per-task Arrow
            # protocol cost, so cores-many bigger tasks beat 2x-cores
            # smaller ones (a straggler is already impossible — the rows
            # were just round-robined)
            n = self.spark.sparkContext.defaultParallelism
            blocks = blocks.repartition(n)
        if not (positional and self.positional):
            return self._nopos_decode(blocks)
        return self._decode(blocks)

    def postings_for_terms_ords(
        self, terms, spread: bool = False
    ) -> DataFrame:
        """ORDINAL-space postings for the given terms: (doc_ord, term, tf,
        dl), delete-filtered, WITHOUT the doc_id join. The workload-scale
        ranking path (search_bm25_batch) aggregates and cuts top-k in
        ordinal space and hydrates doc_id only for the tiny survivor set —
        joining the corpus-sized doc table under every posting before the
        cut would shuffle it per batch (the WAND path's rule, applied to
        the batch plan). ``spread`` as in :meth:`postings_for_terms`."""
        blocks = self.blocks_for_terms(terms)
        if spread:
            n = self.spark.sparkContext.defaultParallelism
            blocks = blocks.repartition(n)
        nopos = decode_barrier(
            blocks.select("term", "first_ord", "docs", "tfs", "dls"), False
        )
        return self.filter_deleted_ords(nopos)

    def doc_ids_for_ordinals_df(self, ords_df: DataFrame) -> DataFrame:
        """Plan-level hydration: join a SMALL (doc_ord, ...) frame against
        the doc table without shuffling the doc table — the small side is
        broadcast, the doc scan streams. The driver-side twin for
        collected ordinals is :meth:`docs_for_ordinals` (adds seg
        partition pruning); this form stays lazy for plans that must not
        collect."""
        return self.docs_tbl.select("doc_ord", "doc_id").join(
            F.broadcast(ords_df), "doc_ord"
        )

    def _nopos_decode(self, blocks: DataFrame) -> DataFrame:
        """Shared non-positional decode pipeline (postings_for_terms /
        all_postings): position bytes never leave disk, the delete filter
        runs in ORDINAL space before doc_ord is dropped — tombstones are
        (doc_id, doc_ord) pairs, and upsert replaces a doc under the SAME
        doc_id with a new ordinal, so a doc_id-level filter here would
        kill the live replacement too — and the contract's null positions
        column is a free JVM literal."""
        nopos = decode_barrier(
            blocks.select("term", "first_ord", "docs", "tfs", "dls"), False
        )
        return (
            self.filter_deleted_ords(nopos)
            .join(self.docs_tbl.select("doc_ord", "doc_id"), "doc_ord")
            .select("doc_id", "term", "tf", _null_positions(), "dl")
        )

    def all_postings(self, positional: bool = True) -> DataFrame:
        """Full decode for corpus-wide exports. ``positional=False``
        projects the ``pos`` parquet column out of the block scan — a
        tf-only export (``doc_vectors``) must not decode and ship the
        dominant position payload through the mapInPandas barrier.
        Ordinal-space delete filtering happens here (same rule as
        ``postings_for_terms``); the doc_id-level ``filter_deleted``
        callers may add on top is a harmless no-op then."""
        if positional and self.positional:
            return self.postings
        return self._nopos_decode(self.blocks)

    def docs_for_ordinals(self, ords) -> DataFrame:
        """Point-lookup hydration: ``(doc_ord, doc_id)`` for the given
        ordinals. The ``seg`` partition filter (segment id is ``doc_ord >>
        SEG_SHIFT`` by construction) prunes whole segment directories and the
        ``doc_ord IN (...)`` predicate is pushed to the parquet scan, where
        doc_ord-ordered files give row-group min/max skipping — so hydrating
        the k survivors of a top-k query reads a handful of row groups, not
        the corpus-sized doc table (reference ``readDocuments``,
        ``InvertedIndex.java:1367-1389``, as a point read)."""
        from .ordinals import SEG_SHIFT

        ords = [int(o) for o in ords]
        segs = sorted({o >> SEG_SHIFT for o in ords})
        pruned = self.docs_tbl.where(F.col("seg").isin(segs))
        if len(ords) > 512:
            # a tie-plateau boundary set can legitimately reach 64k ordinals
            # (_MAX_TIE_COLLECT); a 64k-literal Catalyst In predicate is slow
            # to plan — switch to a broadcast semi-join, keeping the seg
            # partition filter for directory pruning
            ords_df = self.docs_tbl.sparkSession.createDataFrame(
                [(o,) for o in ords], "doc_ord long"
            )
            return pruned.join(F.broadcast(ords_df), "doc_ord").select(
                "doc_ord", "doc_id"
            )
        return pruned.where(F.col("doc_ord").isin(ords)).select(
            "doc_ord", "doc_id"
        )

    def filter_deleted(self, df: DataFrame) -> DataFrame:
        """doc_id-keyed delete filter for CORPUS-side frames
        (full_scan_search, document_iterator). Unlike the base class's
        plain anti-join, only FULLY-dead doc_ids are dropped: after
        ``upsert_documents`` a tombstoned doc_id has a live replacement
        ordinal, and that version must survive a corpus scan. Cost is
        bounded by the tombstone set: docs_tbl is semi-join-pruned to the
        tombstoned ids before the liveness check."""
        if self.tombstones is None:
            return df
        t = self.tombstones
        if "doc_ord" not in t.columns:
            t = t.join(self.docs_tbl.select("doc_id", "doc_ord"), "doc_id")
        cand = self.docs_tbl.join(
            F.broadcast(t.select("doc_id").distinct()), "doc_id", "left_semi"
        )
        live_ids = (
            cand.join(F.broadcast(t.select("doc_ord")), "doc_ord", "left_anti")
            .select("doc_id")
            .distinct()
        )
        dead_ids = (
            t.select("doc_id").distinct().join(live_ids, "doc_id", "left_anti")
        )
        return df.join(F.broadcast(dead_ids), on="doc_id", how="left_anti")

    def filter_deleted_ords(self, df: DataFrame) -> DataFrame:
        """Ordinal-keyed twin of ``filter_deleted`` for frames that carry
        ``doc_ord`` instead of ``doc_id`` (the WAND scoring path, which
        defers the doc_id join to after its top-k cut). Artifact tombstones
        persist ``(doc_id, doc_ord)`` pairs so no corpus join is needed; a
        doc_id-only tombstone frame (legacy) is upgraded via one join."""
        if self.tombstones is None:
            return df
        t = self.tombstones
        if "doc_ord" not in t.columns:
            t = t.join(self.docs_tbl.select("doc_id", "doc_ord"), "doc_id")
        return df.join(
            F.broadcast(t.select("doc_ord")), on="doc_ord", how="left_anti"
        )

    def _decode(self, blocks: DataFrame, filtered: bool = True) -> DataFrame:
        decoded = decode_barrier(blocks, self.positional)
        # ordinal-space delete filter (see postings_for_terms note);
        # filtered=False gives the RAW decode (get_index_segment's dump)
        if filtered:
            decoded = self.filter_deleted_ords(decoded)
        pos_col = (
            F.col("positions") if self.positional else _null_positions()
        )
        return decoded.join(
            self.docs_tbl.select("doc_ord", "doc_id"), "doc_ord"
        ).select("doc_id", "term", "tf", pos_col, "dl")

    def search_phrase(self, phrase) -> DataFrame:
        if not self.positional:
            # reference parity: phrase search on a non-positional index throws
            # (InvertedIndexManager.java:234)
            raise ValueError("phrase search requires a positional artifact")
        return super().search_phrase(phrase)

    def get_index_segment(self, segment_id: int) -> dict:
        """Q12 test surface (reference ``getIndexSegmentPositional``,
        ``InvertedIndexManager.java:271-295``; DTO ``PositionalIndexSegment
        ForTest.java:16-63``): materialize one segment as
        ``{"inverted_lists": {term: [doc_id, ...]}, "positions": {(term,
        doc_id): [pos, ...]}, "documents": {doc_id}}``. For small segments /
        test fixtures only — this collects. A RAW dump of the segment's
        physical contents: tombstoned docs still appear (the reference's
        dump reads segment files directly; deletes live in metadata until
        merge) — consistent with the unfiltered ``documents`` set below."""
        seg_blocks = self.blocks.where(F.col("seg") == segment_id)
        rows = self._decode(seg_blocks, filtered=False).collect()
        inverted: dict = {}
        positions: dict = {}
        for r in rows:
            inverted.setdefault(r["term"], []).append(r["doc_id"])
            if r["positions"] is not None:
                positions[(r["term"], r["doc_id"])] = list(r["positions"])
        for t in inverted:
            inverted[t].sort()
        docs = {
            r["doc_id"]
            for r in self.docs_tbl.where(F.col("seg") == segment_id)
            .select("doc_id")
            .collect()
        }
        return {
            "inverted_lists": inverted,
            "positions": positions,
            "documents": docs,
        }

    def delete_documents(self, keyword: str) -> int:
        """Tombstone matching docs AND persist them: the doc_ids land in
        ``tombstones/ts-<n>/`` parquet and a new snapshot commits the list
        (reference persists removed docIDs in metadata.txt,
        ``InvertedIndexManager.java:356-382``). Readers of the new snapshot
        see the deletes; compaction purges them physically. Tombstones carry
        ``doc_ord`` too (one docs-table join at delete time) so the WAND
        path's ordinal-space filter never re-joins the corpus per query."""
        return self._commit_tombstones(self.search_keyword(keyword).select("doc_id"))

    def delete_ids(self, ids_df: DataFrame) -> int:
        """Tombstone the given doc_ids (frame with a ``doc_id`` column);
        ids absent from the artifact are ignored (the docs-table join drops
        them). Same persistence/snapshot semantics as delete_documents."""
        return self._commit_tombstones(ids_df.select("doc_id").distinct())

    def _commit_tombstones(self, ids_df: DataFrame) -> int:
        # deletes commit on main: with branches pinned, committing from a
        # non-head snapshot would fork history invisibly — refuse BEFORE
        # running any Spark work (the check is pure metadata; doing the
        # join first would also leak `matched` persisted on the raise path)
        main = head_snapshot(self.path, "main")
        if main is not None and main["snapshot_id"] != self.snapshot["snapshot_id"]:
            raise ValueError(
                f"delete from snapshot {self.snapshot['snapshot_id']} but "
                f"main is at {main['snapshot_id']}; load the main head "
                "(or fast_forward) before deleting"
            )
        matched = ids_df.join(
            self.docs_tbl.select("doc_id", "doc_ord"), "doc_id"
        ).persist()
        n = matched.count()
        snap = dict(self.snapshot)
        snap_id = _next_snapshot_id(self.path)
        rel = f"ts-{snap_id:06d}"
        if n:
            matched.write.mode("overwrite").parquet(
                os.path.join(self.path, "tombstones", rel)
            )
            snap["tombstones"] = list(snap.get("tombstones", [])) + [rel]
        snap["snapshot_id"] = snap_id
        snap["parent_id"] = self.snapshot["snapshot_id"]
        snap["created_unix"] = time.time()
        _commit_snapshot(self.path, snap)
        _advance_branch(self.path, "main", snap_id)
        self.snapshot = snap
        if self.tombstones is None:
            self.tombstones = matched
        else:
            # persist the union (and drop the old frame) so repeated deletes
            # don't chain an ever-growing lazy keyword-search lineage into
            # every subsequent query's anti-join
            prev = self.tombstones
            if "doc_ord" not in prev.columns:
                prev = prev.join(self.docs_tbl.select("doc_id", "doc_ord"), "doc_id")
            self.tombstones = prev.unionByName(matched).distinct().persist()
            self.tombstones.count()
            prev.unpersist()
            matched.unpersist()
        return n

    def search_bm25(self, query, k: int | None = None, mode: str = "auto") -> DataFrame:
        from ..query.wand import search_bm25_blockmax

        if mode == "exhaustive" or (mode == "auto" and k is None):
            from ..query.ranked import search_bm25

            return search_bm25(self, query, k)
        return search_bm25_blockmax(self, query, k)


def upsert_documents(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    source_desc: str = "upsert",
    branch: str = "main",
) -> "ArtifactIndex":
    """Replace-or-insert documents by doc_id in ONE atomic snapshot commit
    (Iceberg MERGE semantics): the tombstones for any existing versions of
    the incoming doc_ids AND the new segment land in the SAME snapshot, so
    readers see either the old versions or the new ones — never both,
    never neither. A crash before the commit leaves only orphaned
    (uncommitted, reader-invisible) files that ``expire_snapshots``
    removes; time travel to the pre-upsert snapshot still reads the old
    versions. Compaction later purges the dead postings physically.

    ``branch``: stage the upsert on an audit branch (write-audit-publish,
    same contract as ``append_segment``): the matched prior versions are
    resolved against the BRANCH head, the commit advances only that
    branch, and main readers see neither the tombstones nor the new
    segment until ``fast_forward(path, "main", branch)``.

    The reference has no update path (delete + re-add by hand); this is
    the lifecycle completion over the same tombstone machinery as B9.
    """
    prev_head = head_snapshot(path, branch)
    if prev_head is None:
        raise FileNotFoundError(f"no artifact at {path}; build_artifact first")
    aidx = load_artifact(spark, path, snapshot_id=prev_head["snapshot_id"])
    prev = aidx.snapshot
    cfg = dict(prev["config"])
    ids = corpus.select(F.col(cfg["doc_id_col"]).alias("doc_id")).distinct()
    matched = ids.join(
        aidx.docs_tbl.select("doc_id", "doc_ord"), "doc_id"
    ).persist()
    n_dead = matched.count()
    snap_id = _next_snapshot_id(path)
    tombstones = list(prev.get("tombstones", []))
    if n_dead:
        rel = f"ts-{snap_id:06d}"
        matched.write.mode("overwrite").parquet(
            os.path.join(path, "tombstones", rel)
        )
        tombstones.append(rel)
    seg = _next_segment_id(path, prev)
    t0 = time.time()
    entry = _build_segment(
        spark,
        corpus,
        path,
        seg,
        doc_id_col=cfg["doc_id_col"],
        text_col=cfg["text_col"],
        analyzer=cfg["analyzer"],
        positional=cfg["positional"],
        block_size=cfg["block_size"],
        pack_partitions=None,
        n_buckets=cfg.get("n_buckets", 0),
    )
    entry["build_sec"] = round(time.time() - t0, 3)
    entry["lineage"] = {
        "op": "append",  # an upsert's replacement rows ARE new data
        "source": source_desc,
        "filter": f"upsert ({n_dead} prior versions tombstoned)",
    }
    segments = list(prev["segments"]) + [entry]
    cfg["n_segments"] = len(segments)
    snap = dict(prev)
    snap.update(
        {
            "snapshot_id": snap_id,
            "parent_id": prev["snapshot_id"],
            "created_unix": time.time(),
            "config": cfg,
            "segments": segments,
            "tombstones": tombstones,
        }
    )
    _commit_snapshot(path, snap)  # the single atomic flip
    _advance_branch(path, branch, snap_id)
    matched.unpersist()
    return load_artifact(spark, path, snapshot_id=snap_id)


def docs_added_between(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Iceberg INCREMENTAL (changelog) read over the snapshot log: the
    documents appended or upserted strictly AFTER ``from_snapshot_id``
    and still live at the target snapshot (latest by default) — the
    consumption pattern of a downstream job that processes only new data
    per run (Iceberg's ``incremental read`` between snapshot ids).

    New segments are those listed at the target but absent at ``from``;
    REWRITE segments (compaction / subcompaction lineage) are skipped —
    their rows are relocations of already-consumed data, mirroring
    Iceberg's rule of skipping ``replace`` snapshots during incremental
    reads. Rows deleted again before the target never surface (the
    target's ordinal tombstone filter applies — an upsert's replacement
    row in a new segment DOES surface, its prior version does not).

    Segment membership compiles to a partition filter on the
    seg-partitioned docs table, so the scan is directory-pruned to the
    new data — O(|added|), never a corpus scan. Returns the docs-table
    rows ``(doc_id, dl, doc_ord, seg, ...)``.
    """
    idx = load_artifact(spark, path, to_snapshot_id)
    to_id = idx.snapshot["snapshot_id"]
    if from_snapshot_id > to_id:
        raise ValueError(
            f"from_snapshot_id {from_snapshot_id} is after target {to_id}"
        )

    def _is_rewrite(seg_entry) -> bool:
        lin = seg_entry.get("lineage", {})
        if "op" in lin:  # structured field (current writers)
            return lin["op"] == "rewrite"
        # legacy artifacts predate the op field: fall back to the
        # rewrite sources' prefix convention
        return lin.get("source", "").startswith(
            ("subcompaction of", "compaction of")
        )

    # walk the PARENT CHAIN from the target back to `from` (Iceberg-style):
    # a segment is "added in the range" if some ancestor snapshot in
    # (from, to] first lists it with append/upsert lineage. The chain walk
    # (not a snapshot-id range scan) is what keeps this correct once
    # branches exist — ids interleave across branches, and a staged
    # snapshot's segments must not surface in main's changelog. Requires
    # log retention over the chain — the same constraint Iceberg's
    # incremental read has (read_snapshot raises if a needed snapshot was
    # expired).
    chain: list[dict] = []
    sid: int | None = to_id
    while sid is not None and sid != from_snapshot_id:
        s = read_snapshot(path, sid)
        chain.append(s)
        sid = s.get("parent_id")
    if sid != from_snapshot_id:
        raise ValueError(
            f"snapshot {from_snapshot_id} is not an ancestor of {to_id} "
            f"(diverged branch or expired history)"
        )
    seen = {s["segment_id"] for s in read_snapshot(path, from_snapshot_id)["segments"]}
    added: list[int] = []
    for snap in reversed(chain):  # oldest -> newest
        for s in snap["segments"]:
            if s["segment_id"] not in seen:
                seen.add(s["segment_id"])
                if not _is_rewrite(s):
                    added.append(s["segment_id"])
    at_target = {s["segment_id"] for s in idx.snapshot["segments"]}
    merged_away = sorted(set(added) - at_target)
    if merged_away:
        raise ValueError(
            f"segments {merged_away} were appended in ({from_snapshot_id}, "
            f"{to_id}] but rewritten away before this incremental read; "
            f"time-travel (to_snapshot_id=<pre-rewrite snapshot>) to "
            f"consume them, or consume before compaction"
        )
    if not added:
        return idx.docs_tbl.where(F.lit(False))
    return idx.filter_deleted_ords(
        idx.docs_tbl.where(F.col("seg").isin(sorted(added)))
    )


def load_artifact(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    ref: str | None = None,
) -> ArtifactIndex:
    """Open the artifact at its latest snapshot, or — time travel — at any
    earlier committed snapshot still on disk (``snapshot_id=...``), or at
    a named ref (``ref=...``: a tag — Iceberg ``VERSION AS OF 'tag'`` — or
    a branch head): readers see exactly the segments and tombstones that
    snapshot listed, because superseded segment files are only removed by
    ``expire_snapshots`` (which keeps tag- and branch-referenced snapshots
    alive). The default resolves the MAIN branch head, not "newest file":
    snapshots staged on an audit branch stay invisible until published
    (``fast_forward``)."""
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or ref, not both")
        refs = list_refs(path)
        branches = list_branches(path)
        if ref in refs:  # tag (create_branch/create_tag keep these disjoint)
            snapshot_id = refs[ref]
        elif ref in branches:
            snapshot_id = branches[ref]
        else:
            raise KeyError(f"unknown ref {ref!r} at {path}")
    snap = (
        read_snapshot(path, snapshot_id)
        if snapshot_id is not None
        else head_snapshot(path, "main")
    )
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    segs = sorted(s["segment_id"] for s in snap["segments"])
    if not segs:
        raise ValueError(f"snapshot at {path} lists no segments")
    cfg = snap["config"]
    blocks = (
        spark.read.schema(f"{PACKED_SCHEMA}, bucket int, seg int")
        .option("basePath", os.path.join(path, "blocks"))
        .parquet(*[os.path.join(path, "blocks", f"seg={s}") for s in segs])
    )
    docs_tbl = spark.read.option("basePath", os.path.join(path, "docs")).parquet(
        *[os.path.join(path, "docs", f"seg={s}") for s in segs]
    )
    stats = (
        spark.read.option("basePath", os.path.join(path, "stats"))
        .parquet(*[os.path.join(path, "stats", f"seg={s}") for s in segs])
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .persist()  # every query consults it; tiny (one row per term)
    )
    n_docs = sum(s["n_docs"] for s in snap["segments"])
    total_tokens = sum(s["total_tokens"] for s in snap["segments"])
    avgdl = total_tokens / n_docs if n_docs else 0.0
    idx = ArtifactIndex(
        spark=spark,
        postings=None,  # filled below (needs self._decode)
        term_stats=stats,
        n_docs=n_docs,
        avgdl=avgdl,
        analyzer=cfg["analyzer"],
        k1=cfg["k1"],
        b=cfg["b"],
        path=path,
        blocks=blocks,
        docs_tbl=docs_tbl,
        block_size=cfg["block_size"],
        positional=cfg["positional"],
        n_buckets=cfg.get("n_buckets", 0),
        snapshot=snap,
    )
    ts_dirs = snap.get("tombstones", [])
    if ts_dirs:
        idx.tombstones = spark.read.parquet(
            *[os.path.join(path, "tombstones", d) for d in ts_dirs]
        ).distinct()
    idx.postings = idx._decode(blocks)
    return idx


def subcompact(
    spark: SparkSession,
    path: str,
    segment_ids,
    pack_partitions: int | None = None,
) -> ArtifactIndex:
    """Merge a CHOSEN SUBSET of committed segments into one new segment of
    the same artifact, without touching the others — the reference's
    incremental >=8-segment merge (``InvertedIndexManager.java:384-452``,
    LSM spirit), as one Spark job. At scale this is what lets N streaming
    micro-segments fold together without rewriting a 10-TB base segment
    (``compact`` rewrites everything).

    Semantics:
    - the merged segment gets a fresh ordinal range (``new_seg << 40``) —
      global ordinals mean nothing else re-bases;
    - tombstoned docs belonging to the merged segments are physically
      purged (reference purges at merge, ``InvertedIndex.java:640-697``);
      tombstones pointing into untouched segments are carried forward;
    - the snapshot commits the new segment list atomically; superseded
      segment files stay on disk for old readers (Iceberg-style: physical
      file GC is a separate concern).
    """
    src = load_artifact(spark, path)
    segs = sorted(set(int(s) for s in segment_ids))
    all_ids = {s["segment_id"] for s in src.snapshot["segments"]}
    if len(segs) < 2:
        raise ValueError("subcompact needs at least two segments to merge")
    if not set(segs) <= all_ids:
        raise ValueError(f"unknown segment ids {set(segs) - all_ids}")
    cfg = dict(src.snapshot["config"])
    new_seg = _next_segment_id(path, src.snapshot)

    # old->new ordinal mapping is keyed on the OLD ordinal, not doc_id: the
    # same doc_id may legally exist in two merged segments (append_segment
    # enforces no cross-segment uniqueness), and a doc_id equi-join would
    # match each such posting against both new ordinals, duplicating
    # postings and inflating df/cf. Ordinals are unique by construction.
    merged_docs = (
        src.filter_deleted_ords(
            src.docs_tbl.where(F.col("seg").isin(segs))
            .select("doc_id", "dl", "doc_ord")
        )
        .withColumnRenamed("doc_ord", "old_ord")
        # assign_doc_ordinals range-partitions its input, which executes
        # the child twice (boundary sampling) — persist the scan+anti-join
        .persist()
    )
    ords = assign_doc_ordinals(merged_docs, base=segment_base(new_seg))
    docs_dir = os.path.join(path, "docs", f"seg={new_seg}")
    ords.drop("old_ord").write.mode("overwrite").parquet(docs_dir)
    merged_docs.unpersist()

    cols = ["term", "doc_ord", "tf", "dl"] + (
        ["positions"] if cfg["positional"] else []
    )
    decoded = decode_barrier(
        src.blocks.where(F.col("seg").isin(segs)), cfg["positional"]
    )
    p = (
        src.filter_deleted_ords(decoded)
        .withColumnRenamed("doc_ord", "old_ord")
        .join(ords.select("old_ord", "doc_ord"), "old_ord")
        .select(*cols)
        .persist()
    )
    parts = pack_partitions or 2 * spark.sparkContext.defaultParallelism
    ranged = p.repartitionByRange(
        parts, F.col("term"), F.col("doc_ord")
    ).sortWithinPartitions("term", "doc_ord")
    blocks = ranged.mapInPandas(
        _make_packer(cfg["block_size"], cfg["positional"]), schema=PACKED_SCHEMA
    )
    blocks_dir = os.path.join(path, "blocks", f"seg={new_seg}")
    nb = cfg.get("n_buckets", 0)
    if nb:
        blocks = blocks.withColumn("bucket", term_bucket_expr(F.col("term"), nb))
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(blocks_dir)
    else:
        blocks.write.mode("overwrite").parquet(blocks_dir)
    stats = p.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    stats_dir = os.path.join(path, "stats", f"seg={new_seg}")
    stats.write.mode("overwrite").parquet(stats_dir)
    p.unpersist()

    n_docs = ords.count()
    ords.unpersist()
    schema = f"{PACKED_SCHEMA}, bucket int" if nb else PACKED_SCHEMA
    written = spark.read.schema(schema).parquet(blocks_dir)
    agg = written.agg(
        F.count(F.lit(1)).alias("blocks"),
        F.sum("n").alias("postings"),
        F.sum(
            F.length("docs") + F.length("tfs") + F.length("dls") + F.length("pos")
        ).alias("bytes"),
    ).collect()[0]
    seg_stats = spark.read.parquet(stats_dir).agg(
        F.sum("cf").alias("t"), F.count(F.lit(1)).alias("nt")
    ).collect()[0]

    snap = dict(src.snapshot)
    seg_set = set(segs)
    # exactly-once under streaming: the merged micro-segments' stream batch
    # ids must survive the merge, or a replay of one of those batches after
    # a crash would pass append_segment's lineage guard and double-append
    merged_batch_ids = sorted(
        {
            bid
            for s in snap["segments"]
            if s["segment_id"] in seg_set
            for bid in (
                [s.get("lineage", {}).get("stream_batch_id")]
                + list(s.get("lineage", {}).get("merged_stream_batch_ids", []))
            )
            if bid is not None
        }
    )
    kept = [s for s in snap["segments"] if s["segment_id"] not in set(segs)]
    kept.append(
        {
            "segment_id": new_seg,
            "n_docs": n_docs,
            "n_terms": int(seg_stats["nt"] or 0),
            "total_tokens": int(seg_stats["t"] or 0),
            "n_postings": int(agg["postings"] or 0),
            "n_blocks": int(agg["blocks"] or 0),
            "bytes": int(agg["bytes"] or 0),
            "partitions": [],
            "lineage": {
                "op": "rewrite",
                "source": f"subcompaction of segments {segs} "
                f"at snapshot {src.snapshot['snapshot_id']}",
                "filter": f"seg IN {segs}",
                "merged_stream_batch_ids": merged_batch_ids,
            },
        }
    )
    cfg["n_segments"] = len(kept)
    snap_id = _next_snapshot_id(path)
    ts_rels = []
    if src.tombstones is not None:
        t = src.tombstones
        if "doc_ord" not in t.columns:
            t = t.join(src.docs_tbl.select("doc_id", "doc_ord"), "doc_id")
        from .ordinals import SEG_SHIFT

        remaining = t.where(
            ~F.shiftright(F.col("doc_ord"), SEG_SHIFT).isin(segs)
        ).persist()
        if remaining.count():
            rel = f"ts-{snap_id:06d}"
            remaining.write.mode("overwrite").parquet(
                os.path.join(path, "tombstones", rel)
            )
            ts_rels = [rel]
        remaining.unpersist()
    snap.update(
        {
            "snapshot_id": snap_id,
            "parent_id": src.snapshot["snapshot_id"],
            "created_unix": time.time(),
            "config": cfg,
            "segments": sorted(kept, key=lambda s: s["segment_id"]),
            "tombstones": ts_rels,
        }
    )
    _commit_snapshot(path, snap)
    _advance_branch(path, "main", snap_id)
    return load_artifact(spark, path)


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Physical GC (Iceberg's ``expire_snapshots`` + orphan-file removal):
    drop all but the newest ``keep_last`` snapshot files — except snapshots
    pinned by a named tag (``create_tag``), which survive with their files
    until untagged — then delete every segment directory (blocks/docs/stats)
    and tombstone directory that no surviving snapshot references. Until this runs, superseded files stay
    on disk so time-travel readers keep working; after it, travel to an
    expired snapshot raises. Pure driver-side filesystem work — no Spark
    job. Returns {'snapshots_removed', 'segments_removed',
    'tombstone_dirs_removed'}."""
    import shutil

    snaps = list_snapshots(path)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    # tag- AND branch-referenced snapshots are pinned (Iceberg
    # ref-retention): they and their files survive expiry regardless of
    # keep_last, until the ref is removed. Branch heads matter doubly:
    # with a pinned main, "newest keep_last files" may be STAGED snapshots
    # — expiring main's head out from under default readers would be
    # catastrophic.
    branches = list_branches(path)
    pinned_ids = set(list_refs(path).values()) | set(branches.values())
    kept_ids = {
        int(n[len("snap-"):-len(".json")]) for n in snaps[-keep_last:]
    } | {sid for sid in pinned_ids}
    # ALSO pin every snapshot on a branch head's parent chain down to an
    # already-kept snapshot: fast_forward's ancestry walk (and incremental
    # reads along the branch) need the interior chain — expiring snap 2 of
    # main=1 -> staged 2 -> staged 3 would make a never-diverged branch
    # read as 'diverged' and permanently brick the publish
    for head_id in branches.values():
        sid = head_id
        while sid is not None:
            f = os.path.join(_snap_dir(path), f"snap-{sid:06d}.json")
            if not os.path.exists(f):
                break
            with open(f) as fh:
                parent = json.load(fh).get("parent_id")
            if parent is None or parent in kept_ids:
                break
            kept_ids.add(parent)
            sid = parent
    pinned = {f"snap-{sid:06d}.json" for sid in kept_ids}
    kept = [n for n in snaps[-keep_last:]] + [
        n for n in snaps[:-keep_last] if n in pinned
    ]
    expired = [n for n in snaps[:-keep_last] if n not in pinned]
    live_segs: set = set()
    live_ts: set = set()
    for name in kept:
        with open(os.path.join(_snap_dir(path), name)) as fh:
            snap = json.load(fh)
        live_segs |= {s["segment_id"] for s in snap["segments"]}
        live_ts |= set(snap.get("tombstones", []))
    removed_segs = 0
    for sub in ("blocks", "docs", "stats"):
        base = os.path.join(path, sub)
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            if d.startswith("seg=") and int(d[4:]) not in live_segs:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                if sub == "blocks":
                    removed_segs += 1
    removed_ts = 0
    ts_base = os.path.join(path, "tombstones")
    if os.path.isdir(ts_base):
        for d in os.listdir(ts_base):
            if d not in live_ts:
                shutil.rmtree(os.path.join(ts_base, d), ignore_errors=True)
                removed_ts += 1
    for name in expired:
        os.remove(os.path.join(_snap_dir(path), name))
    return {
        "snapshots_removed": len(expired),
        "segments_removed": removed_segs,
        "tombstone_dirs_removed": removed_ts,
    }


def maybe_merge(
    spark: SparkSession,
    path: str,
    threshold: int = 8,
    keep_largest: int = 1,
) -> "ArtifactIndex | None":
    """Threshold-triggered merge (reference: flush auto-merges when the
    segment count reaches DEFAULT_MERGE_THRESHOLD=8,
    ``InvertedIndexManager.java:99,345-352``). The reference merges ALL
    segments; at scale that rewrites the multi-TB base on every trigger, so
    this folds only the micro-segments — every segment except the
    ``keep_largest`` biggest (by bytes) — via ``subcompact`` (LSM tiering).
    ``keep_largest=0`` reproduces the reference's merge-all. Returns the
    reloaded index when a merge ran, else None."""
    snap = head_snapshot(path, "main")
    if snap is None or len(snap["segments"]) < max(threshold, 2):
        return None
    by_size = sorted(snap["segments"], key=lambda s: (-s["bytes"], s["segment_id"]))
    victims = [s["segment_id"] for s in by_size[keep_largest:]]
    if len(victims) < 2:
        return None
    return subcompact(spark, path, victims)


def compact(spark: SparkSession, path: str, out_path: str) -> ArtifactIndex:
    """Rewrite all committed segments into a single segment at ``out_path``
    (the reference's mergeAllSegments as one Spark job). The decoded postings
    stream is re-packed with fresh dense ordinals; stats re-aggregate."""
    src = load_artifact(spark, path)
    cfg = dict(src.snapshot["config"])
    # tombstone purge happens HERE, physically (reference purges removed docs
    # at merge, InvertedIndex.java:640-697) — surviving docs only
    # ordinal-keyed mapping for the same reason as subcompact: duplicate
    # doc_ids across source segments must each keep exactly one new ordinal
    corpus_like = (
        src.filter_deleted_ords(
            src.docs_tbl.select("doc_id", "dl", "doc_ord")
        )
        .withColumnRenamed("doc_ord", "old_ord")
        # persist: assign_doc_ordinals' range partitioner samples (executes)
        # its child once for boundaries and again for the real pass
        .persist()
    )
    ords = assign_doc_ordinals(corpus_like, base=0)
    docs_dir = os.path.join(out_path, "docs", "seg=0")
    ords.drop("old_ord").write.mode("overwrite").parquet(docs_dir)
    corpus_like.unpersist()
    cols = ["term", "doc_ord", "tf", "dl"] + (
        ["positions"] if cfg["positional"] else []
    )
    # re-pack directly from decoded surviving postings (no re-analysis)
    decoded = decode_barrier(src.blocks, cfg["positional"])
    p = (
        src.filter_deleted_ords(decoded)
        .withColumnRenamed("doc_ord", "old_ord")
        .join(ords.select("old_ord", "doc_ord"), "old_ord")
        .select(*cols)
        .persist()
    )
    parts = 2 * spark.sparkContext.defaultParallelism
    ranged = p.repartitionByRange(
        parts, F.col("term"), F.col("doc_ord")
    ).sortWithinPartitions("term", "doc_ord")
    blocks = ranged.mapInPandas(
        _make_packer(cfg["block_size"], cfg["positional"]), schema=PACKED_SCHEMA
    )
    blocks_dir = os.path.join(out_path, "blocks", "seg=0")
    nb = cfg.get("n_buckets", 0)
    if nb:
        blocks = blocks.withColumn("bucket", term_bucket_expr(F.col("term"), nb))
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(blocks_dir)
    else:
        blocks.write.mode("overwrite").parquet(blocks_dir)
    stats_dir = os.path.join(out_path, "stats", "seg=0")
    # stats re-derive from surviving postings (df/cf drop with the purge)
    stats = p.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    stats.write.mode("overwrite").parquet(stats_dir)
    p.unpersist()

    n_docs = ords.count()
    ords.unpersist()
    written = spark.read.parquet(blocks_dir)
    agg = written.agg(
        F.count(F.lit(1)).alias("blocks"),
        F.sum("n").alias("postings"),
        F.sum(
            F.length("docs") + F.length("tfs") + F.length("dls") + F.length("pos")
        ).alias("bytes"),
    ).collect()[0]
    total_tokens = int(
        spark.read.parquet(stats_dir).agg(F.sum("cf").alias("t")).collect()[0]["t"]
        or 0
    )
    cfg["n_segments"] = 1
    # a re-compaction into the SAME out_path is idempotent: the data dirs
    # were rewritten with mode('overwrite'); allocate the next snapshot id
    # (never overwrite a committed file) and chain onto the previous
    # compact's snapshot so latest/main resolves to the fresh result
    prior = latest_snapshot(out_path)
    _commit_snapshot(
        out_path,
        {
            "snapshot_id": _next_snapshot_id(out_path),
            "parent_id": prior["snapshot_id"] if prior else None,
            "created_unix": time.time(),
            "config": cfg,
            "segments": [
                {
                    "segment_id": 0,
                    "n_docs": n_docs,
                    "n_terms": None,
                    "total_tokens": total_tokens,
                    "n_postings": int(agg["postings"] or 0),
                    "n_blocks": int(agg["blocks"] or 0),
                    "bytes": int(agg["bytes"] or 0),
                    "partitions": [],
                    "lineage": {
                        "op": "rewrite",
                        "source": f"compaction of {path} "
                        f"snapshot {src.snapshot['snapshot_id']}",
                        "filter": "full corpus",
                        # carry every source batch id so a streaming job
                        # re-pointed at the compacted artifact (same
                        # checkpoint) still no-ops replayed batches
                        "merged_stream_batch_ids": sorted(
                            {
                                bid
                                for s in src.snapshot["segments"]
                                for bid in (
                                    [s.get("lineage", {}).get("stream_batch_id")]
                                    + list(
                                        s.get("lineage", {}).get(
                                            "merged_stream_batch_ids", []
                                        )
                                    )
                                )
                                if bid is not None
                            }
                        ),
                    },
                }
            ],
        },
    )
    return load_artifact(spark, out_path)


def describe_artifact(path: str) -> dict:
    """Ops-tooling summary of an artifact from its snapshot METADATA alone
    — no Spark session, no data scan (the per-segment metrics were
    recorded at build/append/merge time; the Iceberg-manifest-summary
    role). Returns totals plus per-segment rows and the snapshot/tombstone
    lineage a dashboard or capacity planner wants. Describes the MAIN head
    (what default readers serve), not the newest snapshot file — those
    differ once a staging branch holds unpublished commits."""
    snap = head_snapshot(path, "main")
    if snap is None:
        raise FileNotFoundError(f"no artifact at {path}")
    segs = snap["segments"]
    seg_rows = [
        {
            "segment_id": s["segment_id"],
            "n_docs": s["n_docs"],
            "n_terms": s["n_terms"],
            "n_postings": s["n_postings"],
            "n_blocks": s["n_blocks"],
            "bytes": s["bytes"],
            "n_partitions": len(s.get("partitions", [])),
            "source": s.get("lineage", {}).get("source", ""),
            "build_sec": s.get("build_sec"),
        }
        for s in segs
    ]
    total_postings = sum(s["n_postings"] for s in segs)
    total_bytes = sum(s["bytes"] for s in segs)
    return {
        "path": path,
        "snapshot_id": snap["snapshot_id"],
        "n_snapshots": len(list_snapshots(path)),
        "n_segments": len(segs),
        "n_docs": sum(s["n_docs"] for s in segs),
        "n_postings": total_postings,
        "bytes": total_bytes,
        "bytes_per_posting": round(total_bytes / total_postings, 3)
        if total_postings
        else None,
        "n_tombstone_files": len(snap.get("tombstones", [])),
        "config": dict(snap["config"]),
        "segments": seg_rows,
    }
