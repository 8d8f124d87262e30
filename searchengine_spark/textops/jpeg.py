"""Baseline-sequential JPEG codec, from scratch (numpy only).

Closes the last real image-decode gap left open in rounds 2-3
(``multimodal.decode_image`` raised NotImplementedError for JPEG): the
entropy coder is plain canonical Huffman over 8x8 DCT blocks, which
needs no external library — only WebP/AVIF-class arithmetic/ANS coders
genuinely do.

Decoder (`decode_jpeg`): baseline sequential DCT (SOF0), 8-bit, 1 or 3
components, arbitrary h/v sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
restart markers, byte stuffing. Progressive (SOF2), arithmetic coding,
and 12-bit raise NotImplementedError — honest narrow edges.

Encoder (`encode_jpeg`): 4:4:4 / grayscale with the JPEG spec Annex K
example quantization + Huffman tables (ITU T.81 §K.1/K.3 — public spec
data, like the PNG/BMP constants elsewhere in this package), quality
scaling per the familiar 50-point convention. Exists so tests and the
media oracles can synthesize real JPEG payloads without any library.

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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
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

    # upsample each component to full resolution and crop
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
) -> bytes:
    """(H, W, 1|3) uint8 -> baseline JPEG bytes (Annex K tables scaled by
    ``quality``). ``subsample=True`` emits 4:2:0 (2x2 luma sampling, box-
    downsampled chroma); ``restart_interval`` emits DRI + RSTn markers
    every that many MCUs — both exist chiefly so the decoder's interleave
    and restart paths have real streams to be tested against."""
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
