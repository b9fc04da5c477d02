"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF).

Closes the last stubbed media family with a REAL lossy-DCT codec: 8-bit
baseline sequential, 4:4:4 (no chroma subsampling) or grayscale, standard
Annex K quantization + Huffman tables, byte-stuffed entropy stream,
marker-structured container. Encoder and decoder share nothing but the
published constants, so the roundtrip test exercises both directions of
the bit-level Huffman coding and the DCT/quantization math.

Scope (documented, actionable errors elsewhere): baseline DCT only (SOF0;
progressive SOF2 rejected), 8-bit precision, 1x1 sampling factors (what
this encoder emits), no restart intervals. Correctness-first Python
bit-loop entropy coding — media decode runs inside actor-pool
``map_batches`` stages where per-image decode cost is the unit of
parallelism (stages/multimodal.py), so single-image throughput is not the
bottleneck at pipeline scale.

Constants are the public tables from ITU-T T.81 Annex K (the same tables
virtually every encoder ships); self-validated at import (Huffman count
sums, table shapes).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K constants

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# (bits-per-length[1..16], values) — Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

for _bits, _vals in ((DC_LUMA_BITS, DC_LUMA_VALS),
                     (DC_CHROMA_BITS, DC_CHROMA_VALS),
                     (AC_LUMA_BITS, AC_LUMA_VALS),
                     (AC_CHROMA_BITS, AC_CHROMA_VALS)):
    assert sum(_bits) == len(_vals), "Annex K Huffman table mismatch"

# orthonormal 8x8 DCT-II basis: JPEG's FDCT/IDCT pair is exactly
# F = M B M^T, B = M^T F M with this normalization
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1 / 8) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, c): s for s, (c, ln) in _huffman_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing; raises on a
    marker (other than stuffing) or running off the end."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG: entropy stream ended early")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG: dangling 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside scan "
                        f"(restart intervals are not supported)")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: undecodable Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (n_blocks_y, n_blocks_x, 64) zigzagged ints."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,nmxy,vy->nmuv", _M, blocks, _M)
    quant = np.round(coef / q).astype(np.int32)
    return quant.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_plane(writer: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Entropy-encode one block's zigzag coefficients; returns new DC pred."""
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 as baseline JFIF JPEG
    (4:4:4, Annex K tables). Lossy: expect quantization error on decode."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3) or \
            (img.ndim == 3 and img.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got "
                         f"{img.shape} {img.dtype}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = img.ndim == 2
    # pad to block multiple by edge replication
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        pad = ((0, ph), (0, pw)) if gray else ((0, ph), (0, pw), (0, 0))
        img = np.pad(img, pad, mode="edge")
    f = img.astype(np.float64)
    if gray:
        planes = [(f, QUANT_LUMA, True)]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, QUANT_LUMA, True), (cb, QUANT_CHROMA, False),
                  (cr, QUANT_CHROMA, False)]

    zz_planes = [_fdct_quant(p, q) for p, q, _ in planes]
    dc_l = _huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    by, bx = zz_planes[0].shape[:2]
    preds = [0] * len(planes)
    for iy in range(by):
        for ix in range(bx):
            for ci, (zz, (_, _, is_luma)) in enumerate(
                    zip(zz_planes, planes)):
                preds[ci] = _encode_plane(
                    writer, zz[iy, ix], preds[ci],
                    dc_l if is_luma else dc_c,
                    ac_l if is_luma else ac_c)
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + QUANT_LUMA.reshape(64)[ZIGZAG]
               .astype(np.uint8).tobytes())
    if not gray:
        out += seg(0xFFDB, b"\x01" + QUANT_CHROMA.reshape(64)[ZIGZAG]
                   .astype(np.uint8).tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in ((0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if not gray:
        for tc_th, bits, vals in ((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                                  (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)):
            out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to (H, W) gray or (H, W, 3) RGB uint8.

    Supports what :func:`encode_jpeg` emits (baseline SOF0, 8-bit, 1x1
    sampling, no restarts) and rejects everything else with actionable
    errors — progressive (SOF2), 12-bit, subsampled, or arithmetic-coded
    streams name the missing feature instead of mis-decoding. Malformed
    streams always raise ValueError (never IndexError/struct.error —
    fuzz-pinned in tests).
    """
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error, OverflowError) as e:
        raise ValueError(f"invalid JPEG: malformed segment ({e})") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("invalid JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    sof = None
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", data, pos + 2)
        if pos + 2 + length > len(data):
            raise ValueError("truncated JPEG: segment past end")
        payload = data[pos + 4:pos + 2 + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(payload[p + 1:p + 65],
                                            dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                htables[tc_th] = _huffman_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise ValueError(f"unsupported JPEG: {precision}-bit")
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = payload[6 + 3 * ci:9 + 3 * ci]
                if sampling != 0x11:
                    raise ValueError(
                        "unsupported JPEG: chroma subsampling (only 1x1 "
                        "sampling factors are implemented)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG: SOF{marker - 0xC0} (only baseline "
                f"sequential SOF0 is implemented)")
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", payload, 0)
            if interval:
                raise ValueError("unsupported JPEG: restart intervals")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = []
            for ci in range(ns):
                cid, tables = payload[1 + 2 * ci], payload[2 + 2 * ci]
                scan_comps.append((cid, tables >> 4, tables & 0x0F))
            pos = pos + 2 + length
            break
        pos += 2 + length
    if sof is None or scan_comps is None:
        raise ValueError("invalid JPEG: missing SOF0 or SOS")
    h, w, comps = sof
    if not (0 < h <= 1 << 15 and 0 < w <= 1 << 15):
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    if len(scan_comps) != len(comps):
        raise ValueError("unsupported JPEG: multi-scan streams")

    by, bx = (h + 7) // 8, (w + 7) // 8
    reader = _BitReader(data, pos)
    planes = [np.zeros((by * 8, bx * 8)) for _ in comps]
    preds = [0] * len(comps)
    comp_q = []
    for (cid, tq), (scid, td, ta) in zip(comps, scan_comps):
        if cid != scid:
            raise ValueError("invalid JPEG: SOS/SOF component mismatch")
        if tq not in qtables or td not in htables or (0x10 | ta) not in htables:
            raise ValueError("invalid JPEG: missing quant/Huffman table")
        comp_q.append((qtables[tq], htables[td], htables[0x10 | ta]))
    for iy in range(by):
        for ix in range(bx):
            for ci, (q, dct, act) in enumerate(comp_q):
                zz = np.zeros(64, dtype=np.int64)
                size = reader.read_symbol(dct)
                if size > 15:  # corrupt DHT can define any byte as symbol
                    raise ValueError(
                        f"invalid JPEG: DC magnitude category {size}")
                diff = _extend(reader.read_bits(size), size)
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(act)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("invalid JPEG: AC index overflow")
                    zz[k] = _extend(reader.read_bits(size), size)
                    k += 1
                block = np.zeros(64)
                block[ZIGZAG] = zz
                coef = block.reshape(8, 8) * q
                spat = _M.T @ coef @ _M + 128.0
                planes[ci][iy * 8:iy * 8 + 8, ix * 8:ix * 8 + 8] = spat
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
