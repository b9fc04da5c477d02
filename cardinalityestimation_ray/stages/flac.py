"""Pure-Python/numpy FLAC codec (RFC 9639 subset).

The REAL free-lossless-audio-codec bitstream: STREAMINFO metadata block,
frame sync headers with CRC-8, subframes with Rice-coded residuals. This
implementation covers the 16-bit mono subset with CONSTANT, VERBATIM and
FIXED-predictor (orders 0-4) subframes — everything a `flac -0`-class
encoder emits for the short clips the audio stages process — and rejects
LPC subframes, stereo decorrelation and other bit depths with actionable
errors. The encoder picks the best FIXED order per frame exactly like
reference fast modes, so encode->decode is a true lossless roundtrip
through genuine Rice entropy coding.

Correctness-first bit loops (the format is bit-serial); media decode runs
inside actor-pool map_batches stages where the clip is the parallelism
unit (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}

_BLOCK = 4096


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC: bitstream ended early")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("invalid FLAC: runaway unary code")
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos


def _rice_encode(w: _BitWriter, residuals: np.ndarray, k: int) -> None:
    # zigzag map to unsigned
    u = (residuals << 1) ^ (residuals >> 63)
    for v in u:
        v = int(v)
        w.write_unary(v >> k)
        if k:
            w.write(v & ((1 << k) - 1), k)


def _rice_decode(r: _BitReader, n: int, k: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        q = r.read_unary()
        v = (q << k) | (r.read(k) if k else 0)
        out[i] = (v >> 1) ^ -(v & 1)
    return out


def _best_rice_k(residuals: np.ndarray) -> int:
    if len(residuals) == 0:
        return 0
    u = (residuals << 1) ^ (residuals >> 63)
    mean = max(float(u.mean()), 1.0)
    return min(max(int(np.log2(mean)), 0), 30)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def encode_flac(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono int16 samples as a FLAC stream (fixed predictors)."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"expected 1-D int16, got {samples.shape} "
                         f"{samples.dtype}")
    if len(samples) == 0:
        raise ValueError("empty signal")
    if not (1 <= sample_rate < 1 << 20):
        raise ValueError(f"invalid sample rate {sample_rate}")
    n_total = len(samples)

    # STREAMINFO: min/max blocksize, min/max framesize(0), rate, channels,
    # bits, total samples, md5 (zeros = unknown)
    si = _BitWriter()
    si.write(_BLOCK, 16)
    si.write(_BLOCK, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)      # channels - 1
    si.write(15, 5)     # bits per sample - 1
    si.write(n_total, 36)
    si.align()
    streaminfo = si.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    x = samples.astype(np.int64)
    for fi, start in enumerate(range(0, n_total, _BLOCK)):
        blk = x[start:start + _BLOCK]
        n = len(blk)
        # frame header: sync(14)=0x3FFE, reserved(1), blocking(1)=0 fixed,
        # blocksize bits=0b0111 (get 16 bit at end... use 0b0110: 8-bit-1?).
        # Use 0b0111 -> 16-bit blocksize-1 follows header; rate 0b0000 ->
        # from STREAMINFO; channels 0b0000 mono; sample size 0b100 (16).
        h = _BitWriter()
        h.write(0x3FFE, 14)
        h.write(0, 1)
        h.write(0, 1)   # fixed-blocksize stream; frame number = coded number
        h.write(0b0111, 4)
        h.write(0b0000, 4)
        h.write(0b0000, 4)
        h.write(0b100, 3)
        h.write(0, 1)
        # UTF-8-style coded frame number (fits 7 bits for our clip sizes;
        # multi-byte form for larger indices)
        if fi < 0x80:
            h.write(fi, 8)
        elif fi < 0x800:
            h.write(0xC0 | (fi >> 6), 8)
            h.write(0x80 | (fi & 0x3F), 8)
        else:
            raise ValueError("clip too long for this encoder (>2^11 frames)")
        h.write(n - 1, 16)
        h.align()
        header = h.bytes()
        header += bytes([_crc8(header)])

        # choose best fixed order by residual magnitude
        best_order, best_res, best_cost = 0, None, None
        for order in range(5):
            if n <= order:
                break
            res = _fixed_residual(blk, order)
            cost = np.abs(res).sum()
            if best_cost is None or cost < best_cost:
                best_order, best_res, best_cost = order, res, cost
        body = _BitWriter()
        if np.all(blk == blk[0]):
            body.write(0, 1)
            body.write(0b000000, 6)  # CONSTANT
            body.write(0, 1)
            body.write(int(blk[0]), 16)
        else:
            body.write(0, 1)
            body.write(0b001000 | best_order, 6)  # FIXED order
            body.write(0, 1)
            for w in blk[:best_order]:
                body.write(int(w), 16)
            # residual: one partition (order 0); rice method 0 (4-bit k)
            # up to k=14, else method 1 (5-bit k, RICE2) — a 4-bit field
            # cannot carry the k>=15 a white-noise block needs
            k = _best_rice_k(best_res)
            if k <= 14:
                body.write(0b00, 2)
                body.write(0, 4)
                body.write(k, 4)
            else:
                k = min(k, 30)
                body.write(0b01, 2)
                body.write(0, 4)
                body.write(k, 5)
            _rice_encode(body, best_res, k)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit FLAC stream -> (int16 samples, rate).

    Supports CONSTANT / VERBATIM / FIXED subframes (what
    :func:`encode_flac` and `flac -0`-class encoders emit); LPC subframes,
    stereo and other bit depths raise with the missing feature named.
    """
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("invalid FLAC: bad magic or truncated")
    pos = 4
    rate = None
    n_total = None
    while pos + 4 <= len(data):
        head = data[pos]
        last = head & 0x80
        btype = head & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        if pos + 4 + size > len(data):
            raise ValueError("truncated FLAC: metadata block past end")
        if btype == 0:  # STREAMINFO
            r = _BitReader(data, pos + 4)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            n_total = r.read(36)
            if channels != 1:
                raise ValueError(
                    f"unsupported FLAC: {channels} channels (only mono)")
            if bits != 16:
                raise ValueError(f"unsupported FLAC: {bits}-bit samples")
        pos += 4 + size
        if last:
            break
    if rate is None:
        raise ValueError("invalid FLAC: missing STREAMINFO")

    out: list[np.ndarray] = []
    got = 0
    # STREAMINFO total_samples == 0 legally means UNKNOWN (RFC 9639 —
    # streaming encoders writing to a pipe emit it): decode frames until
    # the data runs out instead of silently returning zero samples
    while pos < len(data) and (not n_total or got < n_total):
        frame_start = pos
        r = _BitReader(data, pos)
        if r.read(14) != 0x3FFE:
            raise ValueError("invalid FLAC: lost frame sync")
        r.read(1)
        r.read(1)
        bs_bits = r.read(4)
        sr_bits = r.read(4)
        ch_bits = r.read(4)
        ss_bits = r.read(3)
        r.read(1)
        if ch_bits != 0:
            raise ValueError("unsupported FLAC: stereo decorrelation")
        if ss_bits not in (0b100, 0b000):
            raise ValueError("unsupported FLAC: non-16-bit frame")
        # coded frame number (UTF-8-style)
        lead = r.read(8)
        if lead >= 0xC0:
            n_follow = 1
            while (lead << n_follow) & 0x80:
                n_follow += 1
            n_follow -= 1
            for _ in range(n_follow):
                r.read(8)
        if bs_bits == 0b0110:
            n = r.read(8) + 1
        elif bs_bits == 0b0111:
            n = r.read(16) + 1
        elif bs_bits == 0b0001:
            n = 192
        elif 0b0010 <= bs_bits <= 0b0101:
            n = 576 << (bs_bits - 2)
        elif bs_bits >= 0b1000:
            n = 256 << (bs_bits - 8)
        else:
            raise ValueError(f"invalid FLAC: blocksize bits {bs_bits}")
        if sr_bits == 0b1100:
            r.read(8)
        elif sr_bits in (0b1101, 0b1110):
            r.read(16)
        # CRC-8 over the header bytes
        hdr_end = r.byte_pos()
        crc = r.read(8)
        if _crc8(data[frame_start:hdr_end]) != crc:
            raise ValueError("invalid FLAC: frame header CRC mismatch")

        # one mono subframe
        if r.read(1) != 0:
            raise ValueError("invalid FLAC: subframe padding bit set")
        sf_type = r.read(6)
        if r.read(1) != 0:
            raise ValueError("unsupported FLAC: wasted bits")
        if sf_type == 0b000000:  # CONSTANT
            v = r.read(16)
            v = v - (1 << 16) if v >= (1 << 15) else v
            blk = np.full(n, v, dtype=np.int64)
        elif sf_type == 0b000001:  # VERBATIM
            blk = np.empty(n, dtype=np.int64)
            for i in range(n):
                v = r.read(16)
                blk[i] = v - (1 << 16) if v >= (1 << 15) else v
        elif 0b001000 <= sf_type <= 0b001100:  # FIXED
            order = sf_type & 0x07
            warm = np.empty(order, dtype=np.int64)
            for i in range(order):
                v = r.read(16)
                warm[i] = v - (1 << 16) if v >= (1 << 15) else v
            method = r.read(2)
            if method not in (0, 1):
                raise ValueError("invalid FLAC: reserved residual method")
            part_order = r.read(4)
            if (n >> part_order) << part_order != n:
                raise ValueError("invalid FLAC: partition order mismatch")
            kbits = 4 if method == 0 else 5
            escape = (1 << kbits) - 1
            res = np.empty(n - order, dtype=np.int64)
            filled = 0
            for p in range(1 << part_order):
                cnt = (n >> part_order) - (order if p == 0 else 0)
                k = r.read(kbits)
                if k == escape:
                    raw = r.read(5)
                    vals = np.empty(cnt, dtype=np.int64)
                    for i in range(cnt):
                        v = r.read(raw)
                        vals[i] = v - (1 << raw) if raw and \
                            v >= (1 << (raw - 1)) else v
                    res[filled:filled + cnt] = vals
                else:
                    res[filled:filled + cnt] = _rice_decode(r, cnt, k)
                filled += cnt
            blk = np.empty(n, dtype=np.int64)
            blk[:order] = warm
            coefs = _FIXED_COEFS[order]
            for i in range(order, n):
                blk[i] = res[i - order] + (coefs * blk[i - order:i][::-1]).sum()
        elif sf_type >= 0b100000:
            raise ValueError(
                "unsupported FLAC: LPC subframes (only CONSTANT/VERBATIM/"
                "FIXED, the flac -0 family)")
        else:
            raise ValueError(f"invalid FLAC: subframe type {sf_type:#08b}")
        r.align()
        body_end = r.byte_pos()
        crc16 = (r.read(8) << 8) | r.read(8)
        if _crc16(data[frame_start:body_end]) != crc16:
            raise ValueError("invalid FLAC: frame CRC-16 mismatch")
        pos = r.byte_pos()
        out.append(blk)
        got += n
    samples = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    if n_total is not None and n_total:
        if len(samples) < n_total:
            raise ValueError(
                f"truncated FLAC: {len(samples)} of {n_total} samples")
        samples = samples[:n_total]
    if len(samples) and (samples.max() > 32767 or samples.min() < -32768):
        raise ValueError("invalid FLAC: sample out of 16-bit range")
    return samples.astype(np.int16), int(rate)
