"""Posting-block packing/unpacking (pure numpy — no Spark imports).

The persisted index artifact stores posting lists as fixed-size *blocks*
(default 128 docs, the block-max WAND literature's standard size). Each
block row carries:

- ``docs``: delta+varbyte-encoded sorted doc ordinals (wire format parity
  with the reference ``DeltaVarLenCompressor.java:14-64``),
- ``tfs`` / ``dls``: plain-varbyte term frequencies and doc lengths (dl is
  denormalized into the block so BM25 scoring needs no join to a doc table),
- ``pos``: per-doc position lists (``codec.varbyte.encode_position_lists``,
  the reference's ``.plist`` [len][positions] layout, ``InvertedIndex.java:
  919-933``) — empty bytes when the index is built non-positional,
- block-max metadata for WAND pruning: ``max_tf`` and ``min_dl``. The BM25
  per-term score part tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) is increasing in
  tf and decreasing in dl, so part(max_tf, min_dl) evaluated with the
  *query-time* avgdl upper-bounds every posting in the block — storing the
  raw pair instead of a precomputed score keeps bounds valid when later
  segments shift avgdl,
- ``ub_tfs``/``ub_dls``: the block's (tf, dl) PARETO FRONT (postings not
  dominated by another with tf' >= tf and dl' <= dl). Because the score
  part is increasing in tf and decreasing in dl for every valid
  (k1, b, avgdl), the maximizing posting is always ON the front, so
  max over the front is the block's EXACT max score part — a strictly
  tighter WAND bound than the (max_tf, min_dl) composite, still valid
  under any later avgdl shift and any (k1, b). Fronts are tiny (usually
  1-4 pairs); a front wider than 8 falls back to the dominating synthetic
  pair [(max_tf, min_dl)] (a valid upper bound, never an under-estimate).

Blocks are doc-ordinal-ordered within a term; ``first_ord``/``last_ord``
give the block's doc range for alignment/pruning.
"""

from __future__ import annotations

import numpy as np

from ..codec import varbyte

BLOCK_SIZE = 128

# Spark-side schema for one packed block row (mapInPandas output).
BLOCK_SCHEMA = (
    "term string, block_seq int, n int, first_ord long, last_ord long, "
    "max_tf int, min_dl int, ub_tfs array<int>, ub_dls array<int>, "
    "docs binary, tfs binary, dls binary, pos binary"
)

_FRONT_CAP = 8


def score_front(tfs: np.ndarray, dls: np.ndarray) -> tuple[list, list]:
    """(tf, dl) Pareto front of a block (tf desc, dl strictly decreasing
    along the front). If wider than ``_FRONT_CAP``, collapse to the
    dominating synthetic pair (max_tf, min_dl)."""
    order = np.lexsort((dls, -tfs))
    tfs_s, dls_s = tfs[order], dls[order]
    run_min = np.minimum.accumulate(dls_s)
    prev_min = np.concatenate(([np.iinfo(np.int64).max], run_min[:-1]))
    keep = dls_s < prev_min
    if int(keep.sum()) > _FRONT_CAP:
        return [int(tfs.max())], [int(dls.min())]
    return (
        [int(x) for x in tfs_s[keep]],
        [int(x) for x in dls_s[keep]],
    )


def pack_term_run(
    term: str,
    ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos_lists: list | None,
    block_size: int = BLOCK_SIZE,
    block_seq_start: int = 0,
) -> list[dict]:
    """Pack one term's doc-ordinal-sorted postings into block rows.

    ``block_seq_start`` lets a caller that packs a term's postings across
    several partitions keep block sequence numbers locally increasing (the
    global order across partitions is given by ``first_ord``, not seq).
    """
    n = len(ords)
    out = []
    for bi, lo in enumerate(range(0, n, block_size)):
        hi = min(lo + block_size, n)
        b_ords = np.asarray(ords[lo:hi], dtype=np.int64)
        b_tfs = np.asarray(tfs[lo:hi], dtype=np.int64)
        b_dls = np.asarray(dls[lo:hi], dtype=np.int64)
        pos_bytes = (
            varbyte.encode_position_lists(pos_lists[lo:hi])
            if pos_lists is not None
            else b""
        )
        front_tfs, front_dls = score_front(b_tfs, b_dls)
        out.append(
            {
                "term": term,
                "block_seq": block_seq_start + bi,
                "n": int(hi - lo),
                "first_ord": int(b_ords[0]),
                "last_ord": int(b_ords[-1]),
                "max_tf": int(b_tfs.max()),
                "min_dl": int(b_dls.min()),
                "ub_tfs": front_tfs,
                "ub_dls": front_dls,
                # ordinals stored relative to first_ord: the leading absolute
                # value stays 1 byte even under large segment bases
                "docs": varbyte.encode(b_ords - b_ords[0]),
                "tfs": varbyte.encode_plain(b_tfs),
                "dls": varbyte.encode_plain(b_dls),
                "pos": pos_bytes,
            }
        )
    return out


def unpack_blocks_batch(docs_col, tfs_col, dls_col, first_ords) -> dict:
    """Vectorized unpack of MANY block rows at once (no positions): ONE
    concatenated varbyte decode per column (``varbyte.decode_concat`` /
    ``decode_plain_concat``) instead of 3 tiny numpy calls per block.
    Per-block numpy dispatch (~35 µs/call) dominates wide decode scans —
    the batch form is ~8x faster on a 28k-block scan (BENCH.md
    session-15). Bit-identical to :func:`unpack_block` per row.

    Returns ``{"ords", "tfs", "dls", "counts"}`` as flat int64 arrays plus
    per-block posting counts (for ``np.repeat`` of per-block columns)."""
    n = len(docs_col)

    def cat(col):
        lens = np.fromiter(map(len, col), dtype=np.int64, count=n)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        return b"".join(col), offs

    dbuf, doffs = cat(docs_col)
    rel, counts = varbyte.decode_concat(dbuf, doffs)
    ords = rel + np.repeat(np.asarray(first_ords, dtype=np.int64), counts)
    tfs, tcounts = varbyte.decode_plain_concat(*cat(tfs_col))
    dls, lcounts = varbyte.decode_plain_concat(*cat(dls_col))
    if not (
        np.array_equal(counts, tcounts) and np.array_equal(counts, lcounts)
    ):
        raise ValueError("posting-count mismatch across block columns")
    return {"ords": ords, "tfs": tfs, "dls": dls, "counts": counts}


def unpack_blocks_batch_pos(
    docs_col, tfs_col, dls_col, pos_col, first_ords
) -> dict:
    """Positional twin of :func:`unpack_blocks_batch`: vectorized unpack of
    MANY block rows INCLUDING their ragged position payloads — one
    concatenated decode per column (``varbyte.decode_position_lists_concat``
    handles the offsets-of-offsets layout). Bit-identical per row to
    :func:`unpack_block` with positions.

    Requires every block to carry a non-empty ``pos`` payload (always true
    for blocks packed positional); raises on a blocks/positions doc-count
    mismatch instead of silently misaligning postings.

    Returns the :func:`unpack_blocks_batch` dict plus ``pos_flat`` (all
    positions back to back) and ``pos_lengths`` (per-POSTING position
    counts; ``np.split(pos_flat, np.cumsum(pos_lengths)[:-1])`` yields one
    array per posting)."""
    u = unpack_blocks_batch(docs_col, tfs_col, dls_col, first_ords)
    n = len(pos_col)
    lens = np.fromiter(map(len, pos_col), dtype=np.int64, count=n)
    if (lens == 0).any():
        raise ValueError("unpack_blocks_batch_pos: empty position payload")
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat, plengths, n_docs = varbyte.decode_position_lists_concat(
        b"".join(pos_col), offs
    )
    if not np.array_equal(n_docs, u["counts"]):
        raise ValueError("posting-count mismatch between docs and positions")
    u["pos_flat"] = flat
    u["pos_lengths"] = plengths
    return u


def unpack_block(row, with_positions: bool = True) -> dict:
    """Decode one block row (dict-like / pandas row) back to arrays."""
    ords = varbyte.decode(row["docs"]) + row["first_ord"]
    tfs = varbyte.decode_plain(row["tfs"])
    dls = varbyte.decode_plain(row["dls"])
    pos_bytes = row.get("pos") if with_positions else None
    pos = (
        varbyte.decode_position_lists(pos_bytes)
        if pos_bytes is not None and len(pos_bytes) > 0
        else None
    )
    return {"ords": ords, "tfs": tfs, "dls": dls, "pos": pos}


def bm25_part_upper_bound(
    max_tf: float, min_dl: float, k1: float, b: float, avgdl: float
) -> float:
    """Upper bound of tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) over a block."""
    norm = max_tf + k1 * (1.0 - b + b * min_dl / (avgdl or 1.0))
    return max_tf * (k1 + 1.0) / norm
