"""Delta+varbyte codec tests — byte-exact golden vectors from the reference
(``positional/Team3CompressorTest.java``) plus roundtrip properties."""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from searchengine_spark.codec import decode, decode_raw, encode, encode_raw
from searchengine_spark.codec import varbyte


class TestGoldenVectors:
    def test_ones(self):
        # Team3CompressorTest.java:25-29
        assert encode([1, 2, 3, 4, 5, 6]) == bytes([1, 1, 1, 1, 1, 1])

    def test_multi_byte_gaps(self):
        # Team3CompressorTest.java:33-38
        assert encode([128, 384, 896, 1920, 3968]) == bytes.fromhex(
            "8100820084008800" + "9000"
        )

    def test_int_max(self):
        # Team3CompressorTest.java:41-45
        assert encode([2147483647]) == bytes.fromhex("87ffffff7f")

    def test_empty(self):
        assert encode([]) == b""
        assert decode(b"").tolist() == []

    def test_partial_decode(self):
        # Team3CompressorTest.java:83-91: bytes 01*6, offset 4 len 2 -> [1,2]
        data = encode([1, 2, 3, 4, 5, 6])
        assert decode(data, 4, 2).tolist() == [1, 2]

    def test_unsorted_raises(self):
        with pytest.raises(ValueError):
            encode([5, 3])

    def test_zero_first(self):
        assert encode([0, 0, 0]) == bytes([0, 0, 0])
        assert decode(bytes([0, 0, 0])).tolist() == [0, 0, 0]


@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=300).map(sorted)
)
def test_roundtrip(values):
    assert decode(encode(values)).tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=64).map(sorted)
)
def test_raw_roundtrip(values):
    assert decode_raw(encode_raw(values)).tolist() == values


def test_compression_ratio_floor():
    # BASELINE.md: naive bytes > 1.5x compressed bytes on dense posting lists
    ids = np.cumsum(np.random.default_rng(42).integers(1, 30, size=10_000))
    assert len(encode_raw(ids)) > 1.5 * len(encode(ids))


# --- concatenated-stream (batch) decoders --------------------------------


def _cat(blobs):
    offs = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=offs[1:])
    return b"".join(blobs), offs


class TestConcatDecoders:
    """decode_concat / decode_plain_concat must be bit-identical to the
    per-stream decoders — they are the block-decode barrier's batch form
    (one numpy pass per column instead of one tiny call per block)."""

    def test_plain_concat_matches_per_stream(self):
        rng = np.random.default_rng(3)
        streams = [
            rng.integers(0, 300, size=int(rng.integers(0, 40)))
            for _ in range(200)
        ] + [np.array([], dtype=np.int64), np.array([0]), np.array([2**62])]
        blobs = [varbyte.encode_plain(s) for s in streams]
        vals, counts = varbyte.decode_plain_concat(*_cat(blobs))
        want = [varbyte.decode_plain(b) for b in blobs]
        assert counts.tolist() == [len(w) for w in want]
        assert np.array_equal(vals, np.concatenate(want))

    def test_delta_concat_matches_per_stream_large_ordinals(self):
        # seg << 40 bases: the int64-wide path (CLAUDE.md silent-truncation
        # lesson) must survive the batch form too
        rng = np.random.default_rng(4)
        streams = [
            np.sort(rng.choice(1 << 22, size=int(rng.integers(0, 50)),
                               replace=False)) + (int(s) << 40)
            for s, _ in enumerate(range(100))
        ] + [np.array([], dtype=np.int64), np.array([0, 0, 5])]
        blobs = [varbyte.encode(s) for s in streams]
        vals, counts = varbyte.decode_concat(*_cat(blobs))
        want = [varbyte.decode(b) for b in blobs]
        assert counts.tolist() == [len(w) for w in want]
        assert np.array_equal(vals, np.concatenate(want))

    def test_concat_empty_input(self):
        vals, counts = varbyte.decode_plain_concat(b"", np.array([0, 0, 0]))
        assert vals.size == 0 and counts.tolist() == [0, 0]

    def test_concat_truncated_stream_raises(self):
        good = varbyte.encode_plain([7])
        bad = varbyte.encode_plain([300])[:-1]  # drop the terminator byte
        data = bad + good
        offs = np.array([0, len(bad), len(bad) + len(good)])
        with pytest.raises(ValueError, match="truncated"):
            varbyte.decode_plain_concat(data, offs)

    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=2**50), max_size=30
            ).map(sorted),
            max_size=30,
        )
    )
    def test_delta_concat_property(self, streams):
        blobs = [varbyte.encode(s) for s in streams]
        vals, counts = varbyte.decode_concat(*_cat(blobs))
        assert counts.tolist() == [len(s) for s in streams]
        assert vals.tolist() == [x for s in streams for x in s]


def test_unpack_blocks_batch_matches_unpack_block():
    """The mapInPandas non-positional decode barrier's kernel: batch unpack
    must equal the per-block form posting-for-posting (ords carry segment
    bases; counts equal the packed n column)."""
    import pandas as pd

    from searchengine_spark.index.blocks import (
        pack_term_run,
        unpack_block,
        unpack_blocks_batch,
    )

    rng = np.random.default_rng(11)
    rows = []
    for t in range(25):
        n = int(rng.integers(1, 300))
        ords = np.sort(rng.choice(1 << 20, size=n, replace=False)) + (3 << 40)
        tfs = rng.integers(1, 9, size=n)
        dls = rng.integers(1, 500, size=n)
        pos = [
            np.sort(rng.choice(1000, size=int(tf), replace=False))
            for tf in tfs
        ]
        rows.extend(pack_term_run(f"t{t}", ords, tfs, dls, pos))
    pdf = pd.DataFrame(rows)
    u = unpack_blocks_batch(
        pdf["docs"].to_numpy(),
        pdf["tfs"].to_numpy(),
        pdf["dls"].to_numpy(),
        pdf["first_ord"].to_numpy(),
    )
    per = [unpack_block(r, with_positions=False) for r in pdf.to_dict("records")]
    assert np.array_equal(u["ords"], np.concatenate([p["ords"] for p in per]))
    assert np.array_equal(u["tfs"], np.concatenate([p["tfs"] for p in per]))
    assert np.array_equal(u["dls"], np.concatenate([p["dls"] for p in per]))
    assert np.array_equal(u["counts"], pdf["n"].to_numpy())


def test_unpack_blocks_batch_pos_matches_unpack_block():
    """The POSITIONAL decode barrier's kernel (phrase/NEAR/rescore scans):
    batch unpack with positions must equal the per-block form
    posting-for-posting, position-array-for-position-array."""
    import pandas as pd

    from searchengine_spark.index.blocks import (
        pack_term_run,
        unpack_block,
        unpack_blocks_batch_pos,
    )

    rng = np.random.default_rng(12)
    rows = []
    for t in range(25):
        n = int(rng.integers(1, 300))
        ords = np.sort(rng.choice(1 << 20, size=n, replace=False)) + (3 << 40)
        tfs = rng.integers(1, 9, size=n)
        dls = rng.integers(1, 500, size=n)
        pos = [
            np.sort(rng.choice(1000, size=int(tf), replace=False))
            for tf in tfs
        ]
        rows.extend(pack_term_run(f"t{t}", ords, tfs, dls, pos))
    pdf = pd.DataFrame(rows)
    u = unpack_blocks_batch_pos(
        pdf["docs"].to_numpy(),
        pdf["tfs"].to_numpy(),
        pdf["dls"].to_numpy(),
        pdf["pos"].to_numpy(),
        pdf["first_ord"].to_numpy(),
    )
    per = [unpack_block(r, with_positions=True) for r in pdf.to_dict("records")]
    assert np.array_equal(u["ords"], np.concatenate([p["ords"] for p in per]))
    assert np.array_equal(u["tfs"], np.concatenate([p["tfs"] for p in per]))
    assert np.array_equal(u["dls"], np.concatenate([p["dls"] for p in per]))
    want_pos = [arr for p in per for arr in p["pos"]]
    got_pos = np.split(u["pos_flat"], np.cumsum(u["pos_lengths"])[:-1])
    assert len(got_pos) == len(want_pos) == u["ords"].size
    for g, w in zip(got_pos, want_pos):
        assert np.array_equal(g, w)
    # posting-count mismatch between docs and positions raises loudly
    bad = pdf.copy()
    bad.loc[bad.index[0], "pos"] = varbyte.encode_position_lists([[1]])
    with pytest.raises(ValueError, match="mismatch|corrupt"):
        unpack_blocks_batch_pos(
            bad["docs"].to_numpy(),
            bad["tfs"].to_numpy(),
            bad["dls"].to_numpy(),
            bad["pos"].to_numpy(),
            bad["first_ord"].to_numpy(),
        )


def test_decode_position_lists_concat_property():
    """Batch position-lists decode vs per-payload decode, including empty
    payloads, zero-length docs, and zero-doc payloads."""
    rng = np.random.default_rng(13)
    payloads = [b"", varbyte.encode_position_lists([]), varbyte.encode_position_lists([[], []])]
    for _ in range(150):
        lists = [
            np.sort(rng.choice(5000, size=int(rng.integers(0, 7)), replace=False))
            for _ in range(int(rng.integers(0, 5)))
        ]
        payloads.append(varbyte.encode_position_lists(lists))
    offs = np.zeros(len(payloads) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in payloads], out=offs[1:])
    flat, lengths, n_docs = varbyte.decode_position_lists_concat(
        b"".join(payloads), offs
    )
    per = [varbyte.decode_position_lists(p) for p in payloads]
    assert n_docs.tolist() == [len(p) for p in per]
    want = [arr for pl in per for arr in pl]
    got = np.split(flat, np.cumsum(lengths)[:-1]) if lengths.size else []
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_concat_offsets_must_span_buffer():
    blob = varbyte.encode_plain([1, 2, 3])
    with pytest.raises(ValueError, match="span the buffer"):
        varbyte.decode_plain_concat(blob + b"\x01", np.array([0, len(blob)]))
    with pytest.raises(ValueError, match="span the buffer"):
        varbyte.decode_concat(blob, np.array([0, len(blob), len(blob) - 1]))


def test_concat_empty_buffer_still_validates_offsets():
    """ADVICE r3: the empty-buffer early return must not skip the offsets
    misuse guard — malformed offsets with zero data fail just as loudly."""
    for fn in (varbyte.decode_plain_concat, varbyte.decode_concat):
        with pytest.raises(ValueError, match="span the buffer"):
            fn(b"", np.array([0, 3]))  # doesn't span (buffer is empty)
        with pytest.raises(ValueError, match="span the buffer"):
            fn(b"", np.array([1, 0]))  # doesn't start at 0 / non-monotone
        with pytest.raises(ValueError, match="span the buffer"):
            fn(b"", np.array([], dtype=np.int64))  # no streams at all
        vals, counts = fn(b"", np.array([0, 0, 0]))
        assert vals.size == 0 and counts.tolist() == [0, 0]


def test_decode_concat_int64_wrap_raises():
    """ADVICE r3: many streams with large ABSOLUTE values (seg<<40-style
    bases) can wrap the global cumsum even though each per-stream decode
    is fine. The batch path must raise, never silently wrap."""
    stream = varbyte.encode([1 << 62])
    blobs = [stream, stream]  # sum = 2**63 → wraps negative
    with pytest.raises(OverflowError, match="wrapped int64"):
        varbyte.decode_concat(*_cat(blobs))
    # just under the edge still decodes exactly
    ok = [varbyte.encode([(1 << 62) - 1]), varbyte.encode([1 << 61])]
    vals, counts = varbyte.decode_concat(*_cat(ok))
    assert vals.tolist() == [(1 << 62) - 1, 1 << 61]
    assert counts.tolist() == [1, 1]


def test_decode_concat_double_wrap_past_uint64_raises():
    """ADVICE r4: four streams each encoding 2**62 sum to 2**64 — the
    cumsum wraps PAST int64 and lands non-negative (0), so a guard that
    only checks cs[-1] < 0 misses it. Any wrap breaks monotonicity of the
    non-negative-gap running total; the guard must catch that too."""
    stream = varbyte.encode([1 << 62])
    blobs = [stream] * 4  # sum = 2**64 → wraps back to 0 (non-negative)
    with pytest.raises(OverflowError, match="wrapped int64"):
        varbyte.decode_concat(*_cat(blobs))
