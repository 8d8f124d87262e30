"""Baseline-sequential JPEG codec, from scratch (numpy only).

Closes the last real image-decode gap left open in rounds 2-3
(``multimodal.decode_image`` raised NotImplementedError for JPEG): the
entropy coder is plain canonical Huffman over 8x8 DCT blocks, which
needs no external library — only WebP/AVIF-class arithmetic/ANS coders
genuinely do.

Decoder (`decode_jpeg`): baseline sequential DCT (SOF0), 8-bit, 1 or 3
components, arbitrary h/v sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
restart markers, byte stuffing — plus progressive DCT (SOF2, Huffman):
spectral selection, successive approximation (DC/AC first + refinement
passes, EOB runs), interleaved and non-interleaved scans, restarts
(T.81 Annex G). Arithmetic coding and 12-bit raise NotImplementedError
— honest narrow edges.

Encoder (`encode_jpeg`): 4:4:4 / 4:2:0 / grayscale with the JPEG spec
Annex K example quantization + Huffman tables (ITU T.81 §K.1/K.3 —
public spec data, like the PNG/BMP constants elsewhere in this
package), quality scaling per the familiar 50-point convention;
``progressive=True`` emits a multi-scan SOF2 stream (successive
approximation Al=1 -> 0). Exists so tests and the media oracles can
synthesize real JPEG payloads without any library.

All IDCT/DCT math is exact orthonormal matrix multiplication — the same
deterministic arithmetic driver-side (oracle construction) and
executor-side (decode), so construction-derived VALUES oracles stay
bit-stable.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU T.81 Annex K example tables (public spec data) -------------------

# K.1 luminance / chrominance quantization tables, natural (row-major) order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# K.3 typical Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# hard cap on total padded plane samples a decode may allocate (float64:
# 2**27 samples = 1 GiB across all components — far above any test/media
# payload, far below an executor OOM); crafted headers fail loudly instead
_MAX_PLANE_ELEMS = 2**27

# zig-zag scan order: ZIGZAG[i] = natural index of the i-th scanned coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II matrix: spatial = A.T @ coeffs @ A
_A = np.array([
    [(np.sqrt(1.0 / 8) if u == 0 else 0.5)
     * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    return _A.T @ coeffs @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# --- Huffman machinery -----------------------------------------------------


def _build_decode_table(bits, vals) -> dict:
    """{(length, code): symbol} canonical Huffman assignment (T.81 C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals) -> dict:
    """{symbol: (code, length)} — inverse of the decode assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes."""

    __slots__ = ("data", "pos", "cur", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past the end: pad with 1-bits (T.81 F.2.2.5 allows the
                # final EOB code to be truncated by the terminating marker)
                return 1
            self.cur = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- decoder ---------------------------------------------------------------


def _entropy_intervals(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy-coded data (starting at ``pos``) at restart
    markers, unstuffing 0xFF00. Returns (intervals, next_pos) with
    ``next_pos`` at the 0xFF of the terminating marker (or EOF)."""
    n = len(payload)
    intervals: list[bytes] = []
    buf = bytearray()
    p = pos
    while p < n:
        b = payload[p]
        if b == 0xFF and p + 1 < n:
            nb = payload[p + 1]
            if nb == 0x00:
                buf.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nb <= 0xD7:  # RSTn
                intervals.append(bytes(buf))
                buf = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        buf.append(b)
        p += 1
    intervals.append(bytes(buf))
    return intervals, p


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (H, W, channels) uint8 (1 or 3 ch).

    Raises NotImplementedError for progressive/arithmetic/12-bit streams
    and ValueError for corrupt data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None          # (precision, h, w, comps) from SOF0
    restart_interval = 0
    scan = None           # set at SOS

    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization table")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = (prec, h, w, comps)
        elif marker == 0xC2:  # SOF2: progressive, Huffman
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0x0F))
            pos += seglen
            break  # entropy-coded data follows
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    _, h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # split entropy data at restart markers, unstuff 0xFF00
    intervals, _ = _entropy_intervals(payload, pos)

    # Sanity-bound the declared frame BEFORE allocating component planes:
    # a small crafted payload declaring 65535x65535 would otherwise force
    # multi-GB np.zeros allocations and an MCU loop of billions of
    # pure-Python iterations (the bit reader 1-pads past the end, so the
    # loop does NOT stop at payload exhaustion). Failure contract of the
    # media paths is a catchable ValueError, never an executor OOM.
    blocks_per_mcu = sum(c["h"] * c["v"] for c in comps)
    total_entropy_bits = 8 * sum(len(iv) for iv in intervals)
    # every block consumes >= 2 bits (a DC symbol and an AC EOB, each >= 1
    # bit); T.81 F.2.2.5 lets the final EOB be truncated — allow 16 bits
    if mcux * mcuy * blocks_per_mcu * 2 > total_entropy_bits + 16:
        raise ValueError(
            "JPEG entropy data too short for declared frame size "
            f"({w}x{h}, {mcux * mcuy} MCUs)"
        )
    plane_elems = sum(
        (mcuy * c["v"] * 8) * (mcux * c["h"] * 8) for c in comps
    )
    if plane_elems > _MAX_PLANE_ELEMS:
        raise ValueError(
            f"JPEG declared frame too large ({w}x{h}, "
            f"{plane_elems} plane samples > {_MAX_PLANE_ELEMS})"
        )

    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for c in comps
    }
    order = [(cs, td, ta) for cs, td, ta in scan]
    pred = {cs: 0 for cs, _, _ in order}
    mcu_i = 0
    reader = _BitReader(intervals[0])
    interval_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                interval_i += 1
                if interval_i >= len(intervals):
                    raise ValueError("JPEG truncated at restart marker")
                reader = _BitReader(intervals[interval_i])
                pred = {cs: 0 for cs, _, _ in order}
            for cs, td, ta in order:
                c = by_id[cs]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.read_symbol(huff_dc[td])
                        diff = _extend(reader.read_bits(s), s)
                        pred[cs] += diff
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(huff_ac[ta])
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(sz), sz)
                            k += 1
                        coeff = np.zeros(64)
                        coeff[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
                        block = _idct2(coeff.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_i += 1

    return _finish_planes(planes, comps, h, w, hmax, vmax)


def _finish_planes(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full resolution, crop to (h, w),
    convert YCbCr->RGB (3 comps) and clamp to uint8. Shared tail of the
    baseline and progressive decoders."""
    full = []
    for c in comps:
        pl = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    else:
        raise NotImplementedError(f"JPEG with {len(full)} components")
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --- progressive decoder (T.81 Annex G, Huffman) ---------------------------


def _comp_blocks(c, w, h, hmax, vmax) -> tuple[int, int]:
    """(block rows, block cols) of a component's REAL (non-MCU-padded)
    block raster — the unit grid of non-interleaved progressive scans
    (T.81 A.2.2: ceil of the downsampled dimensions over 8)."""
    cw = -(-(w * c["h"]) // hmax)
    ch_ = -(-(h * c["v"]) // vmax)
    return -(-ch_ // 8), -(-cw // 8)


def _dc_unit(blk, reader, table, preds, cs, Ah, Al) -> None:
    """One block's DC contribution: first pass (Ah=0) Huffman-decodes the
    shifted-domain diff; refinement appends one magnitude bit."""
    if Ah == 0:
        if table is None:
            raise ValueError("JPEG progressive DC scan missing DC table")
        s = reader.read_symbol(table)
        preds[cs] += _extend(reader.read_bits(s), s)
        blk[0] = preds[cs] << Al
    elif reader.read_bit():
        blk[0] = int(blk[0]) | (1 << Al)


def _ac_first(blk, reader, table, ss, se, al, eobrun) -> int:
    """AC first pass (G.1.2.2): band coefficients at precision Al, with
    end-of-band runs. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overflow")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(blk, reader, table, ss, se, al, eobrun) -> int:
    """AC refinement pass (G.1.2.3): newly-nonzero coefficients arrive as
    +-1<<Al; every previously-nonzero coefficient passed along the way
    consumes one correction bit. Returns the remaining EOB run."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(table)
            r, s = rs >> 4, rs & 0x0F
            if s:
                if s != 1:
                    raise ValueError(
                        "JPEG AC refinement coded magnitude > 1"
                    )
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and reader.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive (SOF2, Huffman) JPEG -> (H, W, channels) uint8.

    Multi-scan: coefficients accumulate across DC/AC first + refinement
    scans (spectral selection x successive approximation), then one
    vectorized dequantize + IDCT pass reconstructs the planes. Restart
    markers reset DC predictors and the EOB run per interval."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, n = 2, len(payload)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}
    by_id: dict[int, dict] = {}
    hmax = vmax = mcux = mcuy = 0
    h = w = 0

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization table")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                p += 17 + nv
        elif marker == 0xC2:  # SOF2
            if frame is not None:
                raise ValueError("multiple SOF in JPEG stream")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = (prec, h, w, comps)
            by_id = {c["id"]: c for c in comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            plane_elems = sum(
                (mcuy * c["v"] * 8) * (mcux * c["h"] * 8) for c in comps
            )
            if plane_elems > _MAX_PLANE_ELEMS:
                raise ValueError(
                    f"JPEG declared frame too large ({w}x{h}, "
                    f"{plane_elems} plane samples > {_MAX_PLANE_ELEMS})"
                )
            # coefficient store over the MCU-padded block grid (interleaved
            # DC scans code the padding blocks; AC scans only the real ones)
            for c in comps:
                coef[c["id"]] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unexpected second frame type in progressive stream")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — one of many
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in by_id:
                    raise ValueError("JPEG scan references unknown component")
                scomps.append((cs, tables >> 4, tables & 0x0F))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            pos += seglen
            intervals, pos = _entropy_intervals(payload, pos)
            _decode_prog_scan(
                intervals, restart_interval, scomps, ss, se, ah, al,
                coef, by_id, mcux, mcuy, huff_dc, huff_ac, w, h, hmax, vmax,
            )
            continue  # pos already advanced past the entropy data
        pos += seglen

    if frame is None or not coef:
        raise ValueError("JPEG missing SOF/SOS")
    _, h, w, comps = frame
    planes = {}
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quantization table")
        q = qt[c["tq"]].reshape(-1).astype(np.float64)
        arr = coef[c["id"]]
        nby, nbx, _ = arr.shape
        flat = arr.reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(flat)
        nat[:, ZIGZAG] = flat  # zigzag position i -> natural index ZIGZAG[i]
        nat *= q
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _A.T, blocks, _A) + 128.0
        planes[c["id"]] = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
    return _finish_planes(planes, comps, h, w, hmax, vmax)


def _decode_prog_scan(
    intervals, restart_interval, scomps, ss, se, ah, al,
    coef, by_id, mcux, mcuy, huff_dc, huff_ac, w, h, hmax, vmax,
) -> None:
    """Decode one progressive scan into the coefficient store."""
    state = {
        "reader": _BitReader(intervals[0]),
        "interval": 0,
        "eobrun": 0,
        "preds": {cs: 0 for cs, _, _ in scomps},
    }

    def maybe_restart(unit_i: int) -> None:
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            state["interval"] += 1
            if state["interval"] >= len(intervals):
                raise ValueError("JPEG truncated at restart marker")
            state["reader"] = _BitReader(intervals[state["interval"]])
            state["eobrun"] = 0
            state["preds"] = {cs: 0 for cs, _, _ in scomps}

    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        unit = 0
        if len(scomps) > 1:  # interleaved over MCUs, padding blocks coded
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(unit)
                    unit += 1
                    for cs, td, _ta in scomps:
                        c = by_id[cs]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                _dc_unit(
                                    coef[cs][my * c["v"] + by,
                                             mx * c["h"] + bx],
                                    state["reader"], huff_dc.get(td),
                                    state["preds"], cs, ah, al,
                                )
        else:  # single component: its own real-block raster
            ((cs, td, _ta),) = scomps
            hb, wb = _comp_blocks(by_id[cs], w, h, hmax, vmax)
            for by in range(hb):
                for bx in range(wb):
                    maybe_restart(unit)
                    unit += 1
                    _dc_unit(
                        coef[cs][by, bx], state["reader"],
                        huff_dc.get(td), state["preds"], cs, ah, al,
                    )
    else:
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ((cs, _td, ta),) = scomps
        table = huff_ac.get(ta)
        if table is None:
            raise ValueError("JPEG progressive AC scan missing AC table")
        hb, wb = _comp_blocks(by_id[cs], w, h, hmax, vmax)
        unit = 0
        for by in range(hb):
            for bx in range(wb):
                maybe_restart(unit)
                unit += 1
                blk = coef[cs][by, bx]
                if ah == 0:
                    state["eobrun"] = _ac_first(
                        blk, state["reader"], table, ss, se, al,
                        state["eobrun"],
                    )
                else:
                    state["eobrun"] = _ac_refine(
                        blk, state["reader"], table, ss, se, al,
                        state["eobrun"],
                    )


# --- encoder ---------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "cur", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _mag(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, block, q, enc_dc_t, enc_ac_t, pred, zz_of_nat):
    """Quantize + Huffman-encode one 8x8 block; returns the new DC pred."""
    coeff = _dct2(block - 128.0)
    quant = np.rint(coeff / q).astype(np.int64)
    zz = np.zeros(64, dtype=np.int64)
    zz[zz_of_nat] = quant.reshape(-1)
    diff = int(zz[0]) - pred
    s = _mag(diff)
    code, ln = enc_dc_t[s]
    bw.write(code, ln)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v & ((1 << s) - 1), s)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last_nz = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac_t[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _mag(v)
        code, ln = enc_ac_t[(run << 4) | s]
        bw.write(code, ln)
        vv = v if v >= 0 else v + (1 << s) - 1
        bw.write(vv & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, ln = enc_ac_t[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _pad_to(pl: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a plane up to (ph, pw)."""
    h, w = pl.shape
    if h < ph:
        pl = np.vstack([pl, np.repeat(pl[-1:, :], ph - h, axis=0)])
    if w < pw:
        pl = np.hstack([pl, np.repeat(pl[:, -1:], pw - w, axis=1)])
    return pl


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(H, W, 1|3) uint8 -> JPEG bytes (Annex K tables scaled by
    ``quality``). ``subsample=True`` emits 4:2:0 (2x2 luma sampling, box-
    downsampled chroma); ``restart_interval`` emits DRI + RSTn markers
    every that many MCUs — both exist chiefly so the decoder's interleave
    and restart paths have real streams to be tested against.

    ``progressive=True`` emits an SOF2 stream with a DC first+refine pair
    and per-component AC spectral-selection first+refine scans (successive
    approximation Al=1 -> 0); EOB runs are never aggregated across blocks
    (valid per T.81, and the standard Annex K AC tables carry no EOBn
    symbols for n > 1). ``restart_interval`` emits DRI + RSTn every that
    many MCUs in DC scans / blocks in AC scans, resetting DC predictors
    per interval — so the decoder's progressive restart path has real
    streams to be tested against."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if ch == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
        sub = subsample
    else:
        planes = [arr[..., 0].astype(np.float64)]
        sub = False
    # sampling factors per component
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if sub:
        # box-downsample chroma 2x2 (pad odd dims by edge replication)
        ds = []
        for pl in planes[1:]:
            p = _pad_to(pl, h + (h & 1), w + (w & 1))
            ds.append(
                (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2])
                / 4.0
            )
        planes = [planes[0]] + ds

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    qts = [qy] + ([qc] if ch == 3 else [])
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA)]
    if ch == 3:
        enc_dc.append(_build_encode_table(*HUFF_DC_CHROMA))
        enc_ac.append(_build_encode_table(*HUFF_AC_CHROMA))

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to whole MCUs
    padded = []
    for ci, pl in enumerate(planes):
        sh, sv = samp[ci]
        padded.append(_pad_to(pl, mcuy * sv * 8, mcux * sh * 8))

    if progressive:
        return _encode_progressive(
            padded, samp, qts, h, w, ch, mcux, mcuy, restart_interval
        )

    bw = _BitWriter()
    pred = [0] * len(planes)
    zz_of_nat = np.argsort(ZIGZAG)  # natural index -> zigzag position
    entropy_parts: list[bytes] = []
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                entropy_parts.append(bytes(bw.out))
                bw = _BitWriter()
                pred = [0] * len(planes)
            for ci, pl in enumerate(padded):
                ti = 0 if ci == 0 else 1
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = pl[y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, qts[ti], enc_dc[ti], enc_ac[ti],
                            pred[ci], zz_of_nat,
                        )
            mcu_i += 1
    bw.flush()
    entropy_parts.append(bytes(bw.out))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        z = np.zeros(64, dtype=np.uint8)
        z[:] = q.reshape(-1)[ZIGZAG]
        out += seg(0xDB, bytes([tq]) + z.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        tq = 0 if ci == 0 else 1
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += seg(0xC0, sof)
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if ch == 3:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    for i, part in enumerate(entropy_parts):
        out += part
        if i < len(entropy_parts) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])  # RSTn
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive encoder ---------------------------------------------------


def _tz_shift(v: int, al: int) -> int:
    """Point transform for AC coefficients: magnitude shift preserving
    sign (truncation toward zero, T.81 G.1.2.2) — NOT arithmetic >>,
    which floors negatives."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _quant_zigzag(padded, qts):
    """Per-component quantized coefficients in zigzag order over the
    MCU-padded block grid: list of (nby, nbx, 64) int64 arrays."""
    out = []
    for ci, pl in enumerate(padded):
        q = qts[0 if ci == 0 else 1].astype(np.float64)
        nby, nbx = pl.shape[0] // 8, pl.shape[1] // 8
        blocks = (
            pl.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coeff = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        quant = np.rint(coeff / q).astype(np.int64).reshape(-1, 64)
        out.append(quant[:, ZIGZAG].reshape(nby, nbx, 64))
    return out


def _emit_extend(bw, v: int, s: int) -> None:
    bw.write((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1), s)


def _prog_ac_first_block(bw, zz, ss, se, al, enc_ac) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = _tz_shift(int(zz[k]), al)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _mag(v)
        code, ln = enc_ac[(run << 4) | s]
        bw.write(code, ln)
        _emit_extend(bw, v, s)
        run = 0
    if run > 0:  # EOB, never aggregated across blocks
        code, ln = enc_ac[0x00]
        bw.write(code, ln)


def _prog_ac_refine_block(bw, zz, ss, se, al, enc_ac) -> None:
    """Mirror of :func:`_ac_refine` (libjpeg-style single-block EOB): ZRL
    and (r,1) symbols carry the correction bits buffered since the last
    emitted symbol; a trailing EOB flushes the rest."""
    mags = [_tz_shift(abs(int(zz[k])), al) for k in range(ss, se + 1)]
    eob_rel = 0  # index AFTER the last newly-nonzero coefficient
    for i, t in enumerate(mags):
        if t == 1:
            eob_rel = i + 1
    run, br = 0, []
    for i in range(eob_rel):
        t = mags[i]
        if t == 0:
            run += 1
            continue
        if t > 1:  # previously nonzero: correction bit, run unaffected
            br.append(t & 1)
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]
            bw.write(code, ln)
            run -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        code, ln = enc_ac[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if int(zz[ss + i]) < 0 else 1, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        run = 0
    tail = [t & 1 for t in mags[eob_rel:] if t > 1]
    if run > 0 or br or tail or eob_rel <= se - ss:
        code, ln = enc_ac[0x00]
        bw.write(code, ln)
        for b in br + tail:
            bw.write(b, 1)


class _IntervalWriter:
    """Bit writer that splits the stream into restart intervals: every
    ``ri`` coding units the current interval is flushed and (decoder-side)
    DC predictors / EOB runs reset. ``ri=0`` means one interval."""

    def __init__(self, ri: int):
        self.ri = ri
        self.bw = _BitWriter()
        self.parts: list[bytes] = []
        self.unit = 0

    def unit_boundary(self, reset_state=None) -> None:
        """Call BEFORE coding each unit (MCU or block)."""
        if self.ri and self.unit and self.unit % self.ri == 0:
            self.bw.flush()
            self.parts.append(bytes(self.bw.out))
            self.bw = _BitWriter()
            if reset_state is not None:
                reset_state()
        self.unit += 1

    def done(self) -> list[bytes]:
        self.bw.flush()
        self.parts.append(bytes(self.bw.out))
        return self.parts


def _join_intervals(parts: list[bytes]) -> bytes:
    out = bytearray(parts[0])
    for i, part in enumerate(parts[1:]):
        out += bytes([0xFF, 0xD0 + (i % 8)])
        out += part
    return bytes(out)


def _encode_progressive(
    padded, samp, qts, h, w, ch, mcux, mcuy, restart_interval: int = 0
) -> bytes:
    """Assemble the SOF2 stream: DC first (Al=1) + DC refine, then per
    component AC first/refine over two spectral bands for luma (1-5,
    6-63) and the full band for chroma. ``restart_interval`` emits DRI +
    RSTn every that many MCUs (DC scans) / blocks (AC scans)."""
    czz = _quant_zigzag(padded, qts)
    ncomp = len(padded)
    ri = restart_interval
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA)]
    if ch == 3:
        enc_dc.append(_build_encode_table(*HUFF_DC_CHROMA))
        enc_ac.append(_build_encode_table(*HUFF_AC_CHROMA))

    def dc_first(al: int) -> bytes:
        iw = _IntervalWriter(ri)
        preds = [0] * ncomp

        def reset():
            preds[:] = [0] * ncomp

        for my in range(mcuy):
            for mx in range(mcux):
                iw.unit_boundary(reset)
                for ci in range(ncomp):
                    ti = 0 if ci == 0 else 1
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(
                                czz[ci][my * sv + by, mx * sh + bx, 0]
                            ) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _mag(diff)
                            code, ln = enc_dc[ti][s]
                            iw.bw.write(code, ln)
                            if s:
                                _emit_extend(iw.bw, diff, s)
        return _join_intervals(iw.done())

    def dc_refine(al: int) -> bytes:
        iw = _IntervalWriter(ri)
        for my in range(mcuy):
            for mx in range(mcux):
                iw.unit_boundary()
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            iw.bw.write(
                                (int(czz[ci][my * sv + by, mx * sh + bx, 0])
                                 >> al) & 1,
                                1,
                            )
        return _join_intervals(iw.done())

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        # no cross-block encoder state to reset at restarts: EOB runs are
        # never aggregated, so eobrun is 0 at every block boundary
        iw = _IntervalWriter(ri)
        ti = 0 if ci == 0 else 1
        c = {"h": samp[ci][0], "v": samp[ci][1]}
        hb, wb = _comp_blocks(c, w, h, hmax, vmax)
        fn = _prog_ac_first_block if ah == 0 else _prog_ac_refine_block
        for by in range(hb):
            for bx in range(wb):
                iw.unit_boundary()
                fn(iw.bw, czz[ci][by, bx], ss, se, al, enc_ac[ti])
        return _join_intervals(iw.done())

    # scan script: (comp ids, Ss, Se, Ah, Al, entropy bytes)
    all_ids = list(range(ncomp))
    scans = [
        (all_ids, 0, 0, 0, 1, dc_first(1)),
        (all_ids, 0, 0, 1, 0, dc_refine(0)),
    ]
    bands = {0: [(1, 5), (6, 63)]}  # luma split; chroma full-band
    for ci in range(ncomp):
        for ss, se in bands.get(ci, [(1, 63)]):
            scans.append(([ci], ss, se, 0, 1, ac_scan(ci, ss, se, 0, 1)))
    for ci in range(ncomp):
        for ss, se in bands.get(ci, [(1, 63)]):
            scans.append(([ci], ss, se, 1, 0, ac_scan(ci, ss, se, 1, 0)))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        z = np.zeros(64, dtype=np.uint8)
        z[:] = q.reshape(-1)[ZIGZAG]
        out += seg(0xDB, bytes([tq]) + z.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if ch == 3:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    for comp_ids, ss, se, ah, al, data in scans:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | td])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += data
    out += b"\xff\xd9"
    return bytes(out)
