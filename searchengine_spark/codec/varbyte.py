"""Delta + variable-byte codec, vectorized with numpy.

Wire-format parity with the reference ``index/inverted/DeltaVarLenCompressor.java:14-64``:
sorted ints are gap-encoded (first value kept absolute), each gap written as
big-endian 7-bit groups where every byte except the last has the MSB
continuation bit set. Golden vectors (``positional/Team3CompressorTest.java``):

- ``[1,2,3,4,5,6]``            -> ``01 01 01 01 01 01``
- ``[128,384,896,1920,3968]``  -> ``81 00 82 00 84 00 88 00 90 00``
- ``[2147483647]``             -> ``87 ff ff ff 7f``

Unsorted input raises (the reference throws "array is not sorted").
``decode(data, start, length)`` supports the reference's partial-range mode:
decoding restarts the delta base at 0 from ``start`` (boundary-aligned).

A "naive" raw-int32 big-endian codec is kept for compression-ratio
benchmarks, mirroring ``NaiveCompressor.java:14-28``.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # any int64 fits: ceil(63/7) = 9 groups (+1 slack); inputs
# beyond int64 fail loudly at np.asarray (OverflowError), never truncate


def _needed_groups(max_value: int) -> int:
    """7-bit groups needed for max_value (caps the encode loops: small
    values — the common case — pay 1-2 passes, not _MAX_BYTES)."""
    width = 1
    while max_value >= (1 << (7 * width)) and width < _MAX_BYTES:
        width += 1
    return width


def encode(values) -> bytes:
    """Delta + varbyte encode a sorted sequence of non-negative ints."""
    arr = np.asarray(values, dtype=np.int64)
    if arr.size == 0:
        return b""
    gaps = np.empty_like(arr)
    gaps[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=gaps[1:])
    if gaps.min() < 0:
        raise ValueError("array is not sorted")

    width = _needed_groups(int(gaps.max()))
    nbytes = np.ones(arr.size, dtype=np.int64)
    for shift in range(7, 7 * width, 7):
        nbytes += gaps >= (1 << shift)
    ends = np.cumsum(nbytes)  # index one past each value's last byte
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for back in range(width):
        mask = nbytes > back
        pos = ends[mask] - 1 - back
        chunk = (gaps[mask] >> (7 * back)) & 0x7F
        if back > 0:
            chunk |= 0x80
        out[pos] = chunk.astype(np.uint8)
    return out.tobytes()


def decode(data: bytes, start: int = 0, length: int | None = None) -> np.ndarray:
    """Decode to an int64 array. With (start, length), decodes only that byte
    range with the delta base reset to 0 (reference partial-read semantics)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if length is None:
        length = buf.size - start
    if length <= 0 or start >= buf.size:
        return np.empty(0, dtype=np.int64)
    buf = buf[start : start + length]
    payload = (buf & 0x7F).astype(np.int64)
    is_last = (buf & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varbyte stream")
    # group index per byte: 0,0,..,1,1,.. where a group ends at each is_last
    group = np.zeros(buf.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    n = int(group[-1]) + 1
    # distance (in bytes) from each byte to its group's terminator
    term_pos = np.flatnonzero(is_last)
    dist = term_pos[group] - np.arange(buf.size)
    gaps = np.zeros(n, dtype=np.int64)
    np.add.at(gaps, group, payload << (7 * dist))
    return np.cumsum(gaps)


def encode_raw(values) -> bytes:
    """Uncompressed 4-byte big-endian ints (``NaiveCompressor`` parity)."""
    return np.asarray(values, dtype=">i4").tobytes()


def decode_raw(data: bytes, start: int = 0, length: int | None = None) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8)
    if length is None:
        length = buf.size - start
    sub = buf[start : start + length]
    return sub.view(">i4").astype(np.int64)


CODECS = {
    "deltavar": (encode, decode),
    "raw": (encode_raw, decode_raw),
}


def encode_plain(values) -> bytes:
    """Varbyte WITHOUT delta (for unsorted small ints, e.g. tf lists)."""
    arr = np.asarray(values, dtype=np.int64)
    if arr.size == 0:
        return b""
    if arr.min() < 0:
        raise ValueError("negative value")
    width = _needed_groups(int(arr.max()))
    nbytes = np.ones(arr.size, dtype=np.int64)
    for shift in range(7, 7 * width, 7):
        nbytes += arr >= (1 << shift)
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for back in range(width):
        mask = nbytes > back
        pos = ends[mask] - 1 - back
        chunk = (arr[mask] >> (7 * back)) & 0x7F
        if back > 0:
            chunk |= 0x80
        out[pos] = chunk.astype(np.uint8)
    return out.tobytes()


def decode_plain(data: bytes) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.int64)
    payload = (buf & 0x7F).astype(np.int64)
    is_last = (buf & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varbyte stream")
    group = np.zeros(buf.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    n = int(group[-1]) + 1
    term_pos = np.flatnonzero(is_last)
    dist = term_pos[group] - np.arange(buf.size)
    vals = np.zeros(n, dtype=np.int64)
    np.add.at(vals, group, payload << (7 * dist))
    return vals


def _validate_concat_offsets(offsets: np.ndarray, buf_size: int) -> None:
    """Loud misuse guard shared by the ``*_concat`` decoders: offsets that
    don't span the buffer would otherwise decode trailing bytes into orphan
    values not covered by any stream's count. Runs for EMPTY buffers too —
    malformed offsets paired with zero data must fail just as loudly."""
    if (
        offsets.size < 1
        or offsets[0] != 0
        or offsets[-1] != buf_size
        or (np.diff(offsets) < 0).any()
    ):
        raise ValueError("offsets must be monotone, start at 0, and span the buffer")


def _concat_groups(buf: np.ndarray, offsets: np.ndarray):
    """Shared machinery for the ``*_concat`` decoders: per-group (=
    per-value) payloads of a buffer holding MANY independent varbyte
    streams laid back to back, plus each stream's value count and first
    group index. Validates that every non-empty stream ends on a
    terminator byte — otherwise a group would silently span two streams."""
    _validate_concat_offsets(offsets, buf.size)
    payload = (buf & 0x7F).astype(np.int64)
    is_last = (buf & 0x80) == 0
    ends = offsets[1:]
    ne = ends[ends > offsets[:-1]]  # non-empty streams' end offsets
    if ne.size and not is_last[ne - 1].all():
        raise ValueError("truncated varbyte stream")
    group = np.zeros(buf.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=group[1:])
    term_pos = np.flatnonzero(is_last)
    dist = term_pos[group] - np.arange(buf.size)
    vals = np.zeros(term_pos.size, dtype=np.int64)
    np.add.at(vals, group, payload << (7 * dist))
    # groups fully before byte j, for every j: counts/firsts by offset diff
    cnt = np.zeros(buf.size + 1, dtype=np.int64)
    np.cumsum(is_last, out=cnt[1:])
    counts = cnt[offsets[1:]] - cnt[offsets[:-1]]
    firsts = cnt[offsets[:-1]]
    return vals, counts, firsts


def decode_plain_concat(data: bytes, offsets) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY independent plain-varbyte streams concatenated back to
    back in ONE vectorized pass. ``offsets`` is an int64 array of n+1 byte
    offsets (``offsets[-1] == len(data)``; empty streams allowed). Returns
    ``(values, counts)`` with ``counts[i]`` = values in stream i —
    bit-identical to ``np.concatenate([decode_plain(s) for s in streams])``.

    This is the batch form the block-decode barrier uses: per-block
    ``decode_plain`` calls cost ~35 µs of numpy dispatch each, which
    dominates wide scans (tens of thousands of 128-doc blocks per task)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    if buf.size == 0:
        _validate_concat_offsets(offsets, 0)
        return (
            np.empty(0, dtype=np.int64),
            np.zeros(offsets.size - 1, dtype=np.int64),
        )
    vals, counts, _ = _concat_groups(buf, offsets)
    return vals, counts


def decode_concat(data: bytes, offsets) -> tuple[np.ndarray, np.ndarray]:
    """Delta+varbyte batch decode of many concatenated independent streams:
    each stream's delta base restarts at 0 (first value absolute), exactly
    like per-stream :func:`decode`. One global cumsum over all gaps, then a
    per-stream base subtraction — bit-identical to
    ``np.concatenate([decode(s) for s in streams])``.

    Precondition: the SUM of all streams' maxima must stay under 2**63 —
    the global cumsum runs across stream boundaries, so many streams each
    carrying a large absolute first value (e.g. seg<<40 ordinal bases)
    can wrap int64 even though each per-stream ``decode()`` would be
    fine. In-engine this cannot happen (blocks encode ordinals relative
    to ``first_ord``, so per-stream values are block-local), and the
    guard below raises loudly if a future caller feeds absolute
    seg-based ordinals through the batch path."""
    buf = np.frombuffer(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    if buf.size == 0:
        _validate_concat_offsets(offsets, 0)
        return (
            np.empty(0, dtype=np.int64),
            np.zeros(offsets.size - 1, dtype=np.int64),
        )
    gaps, counts, firsts = _concat_groups(buf, offsets)
    cs = np.cumsum(gaps)
    # ANY wrap must raise — checking only cs[-1] < 0 misses totals that
    # wrap past 2**64 back to non-negative (e.g. four streams each
    # contributing 2**62), and np.diff(cs) wraps the same way the cumsum
    # does. Robust form: view the running total as uint64 (COMPARISONS
    # cannot wrap) — gaps are non-negative and < 2**64, so the first time
    # the true total passes 2**64 the uint64 view strictly decreases; if
    # it stays monotone, the view holds exact totals and the final (= max)
    # element bounds the whole array, which must stay inside int64. This
    # module has had a silent-truncation bug before — fail loudly.
    cs_u = cs.view(np.uint64)
    if (
        (gaps < 0).any()
        or (cs_u[1:] < cs_u[:-1]).any()
        or cs_u[-1] > np.uint64((1 << 63) - 1)
    ):
        raise OverflowError(
            "decode_concat: global cumsum wrapped int64; "
            "sum of stream maxima must stay under 2**63"
        )
    # base value accumulated before each stream's first group; firsts == 0
    # (or an empty stream) contributes nothing — np.where evaluates the
    # cs[-1] branch harmlessly, repeat() drops empty streams entirely
    base = np.where(firsts > 0, cs[firsts - 1], 0)
    return cs - np.repeat(base, counts), counts


def encode_position_lists(pos_lists) -> bytes:
    """Pack per-doc position lists: varbyte lengths header then one
    delta+varbyte stream per doc (each doc's deltas restart at 0), matching
    the reference's ``.plist`` [len][positions] layout per (term, doc)
    (``InvertedIndex.java:919-933``) without byte pointers — lengths are
    recovered from the header.

    Vectorized: the concatenation of per-doc delta+varbyte streams is
    byte-identical to ONE plain-varbyte stream over the flat gap array with
    gaps reset to the absolute value at each doc start, so the whole block
    encodes in a single numpy pass (the per-doc ``encode()`` loop was the
    index build's hot spot)."""
    n = len(pos_lists)
    lengths = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=n)
    parts = [encode_plain([n]), encode_plain(lengths)]
    total = int(lengths.sum())
    if total:
        flat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pos_lists if len(p)]
        )
        gaps = np.empty_like(flat)
        gaps[0] = flat[0]
        np.subtract(flat[1:], flat[:-1], out=gaps[1:])
        starts = np.cumsum(lengths[lengths > 0])[:-1]
        gaps[starts] = flat[starts]  # delta restarts at each doc boundary
        if gaps.min() < 0:
            raise ValueError("array is not sorted")
        parts.append(encode_plain(gaps))
    return b"".join(parts)


def decode_position_lists_concat(data: bytes, offsets):
    """Batch decode of MANY concatenated :func:`encode_position_lists`
    payloads in ONE vectorized pass — the positional twin of
    :func:`decode_concat` (same motivation: per-block numpy dispatch
    dominates wide positional scans).

    ``offsets`` is an int64 array of n+1 byte offsets into ``data``
    (``offsets[-1] == len(data)``; empty payloads allowed — they decode to
    zero docs, matching ``decode_position_lists(b"") == []``). Returns
    ``(flat_positions, lengths, n_docs)``:

    - ``flat_positions``: all docs' position values back to back,
    - ``lengths``: per-DOC position counts across all payloads in order
      (``np.split(flat_positions, np.cumsum(lengths)[:-1])`` reproduces
      each doc's array bit-identically to the per-payload decoder),
    - ``n_docs``: per-payload doc counts.

    Each payload is one plain-varbyte stream ``[n, lengths..., gaps...]``
    with gaps restarting absolute at every doc boundary, so one global
    cumsum over ALL gaps plus a per-doc base subtraction recovers every
    position — exactly the decode_concat trick, one level more ragged."""
    vals, counts = decode_plain_concat(data, offsets)
    n_streams = counts.size
    starts = np.zeros(n_streams + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    n_docs = np.zeros(n_streams, dtype=np.int64)
    nonempty = counts > 0
    n_docs[nonempty] = vals[starts[:-1][nonempty]]
    if (n_docs < 0).any() or (nonempty & (counts < 1 + n_docs)).any():
        raise ValueError("corrupt position payload: bad doc-count header")
    total_docs = int(n_docs.sum())
    # grouped arange: for each payload, indices of its length header words
    doc_base = np.cumsum(n_docs) - n_docs
    ar = np.arange(total_docs, dtype=np.int64) - np.repeat(doc_base, n_docs)
    lengths = vals[np.repeat(starts[:-1] + 1, n_docs) + ar]
    if (lengths < 0).any():
        raise ValueError("corrupt position payload: negative length")
    g_counts = np.where(nonempty, counts - 1 - n_docs, 0)
    # per-payload sum of lengths must equal its gap count
    lcum = np.zeros(total_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=lcum[1:])
    per_stream_lens = lcum[doc_base + n_docs] - lcum[doc_base]
    if not np.array_equal(per_stream_lens, g_counts):
        raise ValueError("corrupt position payload: lengths/gaps mismatch")
    total_gaps = int(g_counts.sum())
    if total_gaps == 0:
        return np.empty(0, dtype=np.int64), lengths, n_docs
    gap_base = np.cumsum(g_counts) - g_counts
    gar = np.arange(total_gaps, dtype=np.int64) - np.repeat(gap_base, g_counts)
    gaps = vals[np.repeat(starts[:-1] + 1 + n_docs, g_counts) + gar]
    cs = np.cumsum(gaps)
    doc_starts = lcum[:-1]  # global start of each doc's gap run
    base = np.where(doc_starts > 0, cs[np.maximum(doc_starts - 1, 0)], 0)
    flat = cs - np.repeat(base, lengths)
    return flat, lengths, n_docs


def decode_position_lists(data: bytes) -> list:
    """Inverse of encode_position_lists -> list of int64 arrays."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return []
    vals = decode_plain(buf)  # one pass: [n, lengths..., gaps...]
    n = int(vals[0])
    lengths = vals[1 : 1 + n]
    gaps = vals[1 + n :]
    if gaps.size == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(n)]
    flat = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    base = np.where(starts > 0, flat[np.maximum(starts - 1, 0)], 0)
    adj = flat - np.repeat(base, lengths)
    return np.split(adj, np.cumsum(lengths)[:-1])
