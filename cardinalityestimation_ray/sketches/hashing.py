"""Hash functions and byte-encoding rules for sketch elements.

Element identity follows the reference: every element is normalized to bytes
(UTF-8 for strings, little-endian fixed width for numbers) and those bytes are
hashed to a 64-bit value which is the canonical datum
(/root/reference/CardinalityEstimation/CardinalityEstimator.cs:346-528, 755).
The reference pins that Add(123) and Add(LE-bytes(123)) collide
(CardinalityEstimatorTests.cs:750-770) — the byte encoding IS the identity.

FNV-1a 64 is implemented bit-exactly (golden vectors from
CardinalityEstimation.Test/Hash/Fnv1ATests.cs:35-41) and is this library's
default hash: it vectorizes to a handful of numpy passes per batch for
fixed-width elements. Murmur3 x64-128 (low 64 bits) is provided for parity
(golden vectors Hash/Murmur3Tests.cs:35-41). splitmix64 is a fast non-reference
mixer option for int64 streams.

All vectorized kernels are pure numpy over uint64 with wrap-around semantics —
no Python per-element loops.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

U64 = np.uint64

_FNV_OFFSET = U64(14695981039346656037)
_FNV_PRIME = U64(1099511628211)
_BYTE_MASK = U64(0xFF)

DEFAULT_HASH = "fnv1a_mix"

# ---------------------------------------------------------------------------
# bit utilities


_M32 = U64(0xFFFFFFFF)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length (position of highest set bit; 0 for 0).

    Split-32 frexp: each 32-bit half is < 2^53 so its float64 image is exact
    and ``frexp`` returns the bit length directly — two cheap vector passes,
    exact over the full uint64 range.
    """
    x = x.astype(np.uint64, copy=False)
    hi = (x >> U64(32)).astype(np.float64)
    lo = (x & _M32).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    return np.where(e_hi > 0, e_hi + 32, e_lo).astype(np.uint8)


def bit_length_u64_small(x: np.ndarray) -> np.ndarray:
    """Bit length for values known to be < 2^53 (single exact frexp pass)."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.uint8)


# ---------------------------------------------------------------------------
# FNV-1a 64 — scalar (bit-exact reference parity) and vectorized


def fnv1a64(data: bytes) -> int:
    """Scalar FNV-1a 64 over raw bytes (reference Hash/Fnv1A.cs:68-86 parity)."""
    h = 14695981039346656037
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _fnv1a64_over_words(v: np.ndarray, width: int) -> np.ndarray:
    """FNV-1a folding the low ``width`` LE bytes of each uint64 word.

    In-place ops over exactly three live buffers (input, hash, scratch) so a
    chunk's working set stays cache-resident under high concurrency.
    """
    n = len(v)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    for j in range(width):
        np.right_shift(v, U64(8 * j), out=tmp)
        np.bitwise_and(tmp, _BYTE_MASK, out=tmp)
        np.bitwise_xor(h, tmp, out=h)
        np.multiply(h, _FNV_PRIME, out=h)
    return h


def fnv1a64_fixed(values: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 of a fixed-width integer/float array.

    Each element is encoded as its little-endian byte image (4 bytes for
    32-bit dtypes, 8 for 64-bit), matching the reference's typed Add overloads
    (CardinalityEstimator.cs:376-459), then FNV-1a folded byte by byte —
    width vector passes total.
    """
    values = np.ascontiguousarray(values)
    if values.dtype == np.float32:
        values = values.view(np.uint32)
    elif values.dtype == np.float64:
        values = values.view(np.uint64)
    if values.dtype.itemsize == 4:
        v = values.astype(np.uint32, copy=False).astype(np.uint64)
        width = 4
    elif values.dtype.itemsize == 8:
        v = values.view(np.uint64) if values.dtype != np.uint64 else values
        v = v.astype(np.uint64, copy=False)
        width = 8
    else:
        raise TypeError(f"unsupported dtype for fixed-width hash: {values.dtype}")
    return _fnv1a64_over_words(v, width)


def fnv1a64_bytes_array(data: np.ndarray, offsets: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over n variable-length byte strings.

    ``data`` is the concatenated uint8 buffer, ``offsets[i]``/``lengths[i]``
    delimit element i. Runs max(lengths) masked vector passes — fast for
    short-string columns (doc ids, source labels); equals the scalar fnv1a64
    on every element.
    """
    n = len(lengths)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    maxlen = int(lengths.max())
    minlen = int(lengths.min())
    offsets = offsets.astype(np.int64, copy=False)
    lengths = lengths.astype(np.int64, copy=False)
    tmp = np.empty(n, dtype=np.uint64)
    # common prefix: every string is active — no compaction, in-place ops
    for j in range(minlen):
        tmp[:] = data[offsets + j]
        np.bitwise_xor(h, tmp, out=h)
        np.multiply(h, _FNV_PRIME, out=h)
    # tail: compact the shrinking active set once per position
    active = np.arange(n)
    off = offsets
    lens = lengths
    for j in range(minlen, maxlen):
        keep = lens > j
        if not keep.all():
            active = active[keep]
            off = off[keep]
            lens = lens[keep]
        b = data[off + j].astype(np.uint64)
        h[active] = (h[active] ^ b) * _FNV_PRIME
    return h


def hash_arrow_binary(arr: pa.Array, hash_name: str = DEFAULT_HASH) -> np.ndarray:
    """Hash each element of an Arrow string/binary array (zero-copy buffers).

    ``fnv1a`` folds the raw bytes; ``fnv1a_mix`` (library default) applies the
    splitmix64 finalizer on top; ``polars`` delegates to polars' native Rust
    string hash (~10x faster on long strings; stable within a polars
    version — use for throughput, not for cross-version persisted identity).

    Output is positional (one hash per input slot); a null entry hashes as
    the empty string because the offsets buffer carries no gap for it.
    Callers needing SQL null semantics (the sketch ``add_arrow`` paths do
    this) must ``drop_null()``/filter before calling.
    """
    if hash_name == "polars":
        import polars as pl

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pl.from_arrow(arr).hash(seed=0).to_numpy()
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            arr = arr.chunk(0)
        else:
            arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected string/binary array, got {arr.type}")
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                            count=len(arr) + arr.offset + 1)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    if hash_name == "wordfnv_mix":
        return splitmix64_inplace(wordfnv64_bytes_array(data, starts, lengths))
    if hash_name == "xxhash64":
        return xxh64_bytes_array(data, starts, lengths)
    if hash_name == "xxhash128":
        from .xxh3 import xxh128_dotnet_bytes_array

        return xxh128_dotnet_bytes_array(data, starts, lengths)
    if hash_name == "murmur3":
        # scalar per-string loop — murmur3's 16-byte block structure does
        # not vectorize cleanly over variable lengths; provided for parity
        # (reference default usage), not throughput
        return np.fromiter(
            (murmur3_128_x64_low64(
                data[starts[i]:starts[i] + lengths[i]].tobytes())
             for i in range(len(starts))),
            dtype=np.uint64, count=len(starts))
    h = fnv1a64_bytes_array(data, starts, lengths)
    if hash_name == "fnv1a":
        return h
    if hash_name == "fnv1a_mix":
        return splitmix64(h)
    raise ValueError(f"unsupported hash for binary arrays: {hash_name}")


# ---------------------------------------------------------------------------
# word-wise FNV variant — numpy-only fast path for variable-length strings

_WORD_TAIL_MASKS = np.array(
    [(1 << (8 * r)) - 1 for r in range(1, 8)] + [0xFFFFFFFFFFFFFFFF],
    dtype=np.uint64)  # index = remaining_bytes - 1


def wordfnv64(data: bytes) -> int:
    """Scalar word-wise FNV variant: fold little-endian 8-byte words (tail
    zero-padded), then mix the length so trailing NUL bytes stay distinct.
    Identity = exact bytes. ~8x fewer operations per byte than FNV-1a; not
    byte-compatible with it (a different registered hash name)."""
    h = 14695981039346656037
    for j in range(0, len(data), 8):
        w = int.from_bytes(data[j:j + 8].ljust(8, b"\0"), "little")
        h = ((h ^ w) * 0x100000001B3) & _MASK64
    h = ((h ^ len(data)) * 0x100000001B3) & _MASK64
    return h


def wordfnv64_mix(data: bytes) -> int:
    return splitmix64_scalar(wordfnv64(data))


def wordfnv64_bytes_array(data: np.ndarray, starts: np.ndarray,
                          lengths: np.ndarray) -> np.ndarray:
    """Vectorized :func:`wordfnv64` over n byte strings.

    Trick: a string starting at byte offset o has all its 8-byte words at
    offsets o+8j, which share the phase p = o mod 8 — so one u64 view per
    phase turns word access into single vectorized u64 gathers (8 bytes per
    gather op instead of 1). O(total_bytes / 8) gathers total.
    """
    n = len(starts)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    starts = starts.astype(np.int64, copy=False)
    lengths = lengths.astype(np.int64, copy=False)
    dpad = np.concatenate([data, np.zeros(16, dtype=np.uint8)])
    views = []
    for p in range(8):
        usable = (len(dpad) - p) // 8 * 8
        views.append(dpad[p:p + usable].view(np.uint64))
    n_words = (lengths + 7) >> 3
    phases = (starts & 7).astype(np.int64)
    for p in range(8):
        sel = np.flatnonzero(phases == p)
        if len(sel) == 0:
            continue
        view = views[p]
        # sort by descending word count so "still active at word j" is a
        # PREFIX — the inner loop is then pure in-place prefix arithmetic
        nw_sel = n_words[sel]
        order = np.argsort(-nw_sel, kind="stable")
        sel = sel[order]
        nw = nw_sel[order]
        widx = (starts[sel] - p) >> 3
        lens = lengths[sel]
        hh = np.full(len(sel), _FNV_OFFSET, dtype=np.uint64)
        max_w = int(nw[0]) if len(nw) else 0
        # active-count per full-word index j (strings with nw-1 > j)
        counts_full = np.searchsorted(-nw, -(np.arange(1, max_w + 1) + 1),
                                      side="right") if max_w else np.empty(0)
        for j in range(max_w - 1 if max_w else 0):
            c = int(counts_full[j])
            if c == 0:
                continue
            w = view[widx[:c] + j]
            np.bitwise_xor(hh[:c], w, out=hh[:c])
            np.multiply(hh[:c], _FNV_PRIME, out=hh[:c])
        # fold each string's LAST word (tail-masked) — order-correct because
        # all preceding full words were already folded
        has_word = nw > 0
        if has_word.any():
            last_idx = widx + nw - 1
            w_last = view[np.where(has_word, last_idx, 0)]
            rem = np.clip(lens - 8 * (nw - 1), 1, 8)
            w_last &= _WORD_TAIL_MASKS[rem - 1]
            nh = (hh ^ w_last) * _FNV_PRIME
            hh = np.where(has_word, nh, hh)
        hh = (hh ^ lens.astype(np.uint64)) * _FNV_PRIME
        h[sel] = hh
    return h


# ---------------------------------------------------------------------------
# splitmix64 — fast alternative mixer (Steele/Lea/Flood, public domain)

_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)


def splitmix64_inplace(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer applied in place (one scratch buffer)."""
    tmp = np.empty_like(z)
    z += _SM_GAMMA
    np.right_shift(z, U64(30), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, _SM_M1, out=z)
    np.right_shift(z, U64(27), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, _SM_M2, out=z)
    np.right_shift(z, U64(31), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    return z


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    return splitmix64_inplace(x.astype(np.uint64, copy=True))


def splitmix64_scalar(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & _MASK64
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & _MASK64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _MASK64
    z ^= z >> 31
    return z


def fnv1a64_mix(data: bytes) -> int:
    """Library default hash: FNV-1a folded bytes + splitmix64 finalizer.

    Plain FNV-1a avalanches the high bits poorly (HLL indexes on the TOP b
    bits, reference CardinalityEstimator.cs:768) — sequential integers skew
    the estimate by >50%. The splitmix64 finalizer fixes the distribution
    while preserving the reference's byte-identity rule (equal bytes ->
    equal hash). This mirrors the reference defaulting to XxHash128 rather
    than raw FNV for quality (CardinalityEstimator.cs:212-213).
    """
    return splitmix64_scalar(fnv1a64(data))


# ---------------------------------------------------------------------------
# Murmur3 x64-128 (low 64 bits) — scalar, for reference parity tests

_MASK64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_128_x64_low64(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x64-128 (Austin Appleby, public domain), low 64 bits.

    Matches the reference default usage (Hash/Murmur3.cs:50,67-81): hash the
    bytes with seed 0 and keep the first 8 bytes of the 128-bit digest.
    """
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    length = len(data)
    h1 = seed
    h2 = seed
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16: i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8: i * 16 + 16], "little")
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16:]
    k1 = 0
    k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    return h1


def murmur3_128_x64_low64_fixed(values: np.ndarray) -> np.ndarray:
    """Vectorized Murmur3 x64-128 low64 for 4/8-byte LE elements.

    For inputs <= 8 bytes the algorithm reduces to the k1 tail path +
    finalization (no 16-byte blocks, k2 == 0) — bit-identical to
    :func:`murmur3_128_x64_low64` on the element's byte image (tested),
    expressed as ~12 numpy passes per batch.
    """
    values = np.ascontiguousarray(values)
    if values.dtype == np.float32:
        values = values.view(np.uint32)
    elif values.dtype == np.float64:
        values = values.view(np.uint64)
    width = values.dtype.itemsize
    if width == 4:
        k1 = values.astype(np.uint32, copy=False).astype(np.uint64)
    elif width == 8:
        k1 = values.view(np.uint64).astype(np.uint64, copy=False).copy()
    else:
        raise TypeError(f"unsupported dtype for murmur3 fixed: {values.dtype}")
    c1 = U64(0x87C37B91114253D5)
    c2 = U64(0x4CF5AD432745937F)
    k1 = k1 * c1
    k1 = (k1 << U64(31)) | (k1 >> U64(33))
    k1 *= c2
    h1 = k1 ^ U64(width)     # h1 = (0 ^ k1) ^ length
    h2 = np.full(len(k1), U64(width))  # h2 = 0 ^ length
    h1 = h1 + h2
    h2 = h2 + h1

    def fmix(h):
        h ^= h >> U64(33)
        h *= U64(0xFF51AFD7ED558CCD)
        h ^= h >> U64(33)
        h *= U64(0xC4CEB9FE1A85EC53)
        h ^= h >> U64(33)
        return h

    h1 = fmix(h1)
    h2 = fmix(h2)
    return h1 + h2


# ---------------------------------------------------------------------------
# scalar element encoding (reference byte-identity rules)


def encode_int32(x: int) -> bytes:
    return struct.pack("<i", x)


def encode_uint32(x: int) -> bytes:
    return struct.pack("<I", x)


def encode_int64(x: int) -> bytes:
    return struct.pack("<q", x)


def encode_uint64(x: int) -> bytes:
    return struct.pack("<Q", x)


def encode_float32(x: float) -> bytes:
    return struct.pack("<f", x)


def encode_float64(x: float) -> bytes:
    return struct.pack("<d", x)


def encode_str(x: str) -> bytes:
    return x.encode("utf-8")


# ---------------------------------------------------------------------------
# XXH64 — fills the reference's default-hash role (the reference defaults to
# XxHash128→low64, CardinalityEstimator.cs:212-213; no xxhash wheel exists in
# this environment, so the classic XXH64 — same family, published spec —
# is implemented bit-exactly instead and registered as "xxhash64". Golden
# vectors below are the published reference values (xxHash spec / python-
# xxhash docs). Hash choice is pluggable exactly as in the reference
# (GetHashCodeDelegate, CardinalityEstimator.cs:39-46).

_XP1 = U64(0x9E3779B185EBCA87)
_XP2 = U64(0xC2B2AE3D27D4EB4F)
_XP3 = U64(0x165667B19E3779F9)
_XP4 = U64(0x85EBCA77C2B2AE63)
_XP5 = U64(0x27D4EB2F165667C5)
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _vrotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << U64(r)) | (x >> U64(64 - r))


def _xxh_avalanche(h: np.ndarray) -> np.ndarray:
    h ^= h >> U64(33)
    h *= _XP2
    h ^= h >> U64(29)
    h *= _XP3
    h ^= h >> U64(32)
    return h


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 (spec-exact; golden-vector-tested)."""

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _MASK64

    P1, P2, P3, P4, P5 = (int(_XP1), int(_XP2), int(_XP3), int(_XP4), int(_XP5))
    n = len(data)
    i = 0
    if n >= 32:
        acc = [(seed + P1 + P2) & _MASK64, (seed + P2) & _MASK64,
               seed & _MASK64, (seed - P1) & _MASK64]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                acc[j] = (rotl((acc[j] + lane * P2) & _MASK64, 31) * P1) & _MASK64
            i += 32
        h = (rotl(acc[0], 1) + rotl(acc[1], 7)
             + rotl(acc[2], 12) + rotl(acc[3], 18)) & _MASK64
        for a in acc:
            h = (((h ^ ((rotl((a * P2) & _MASK64, 31) * P1) & _MASK64))
                  * P1) + P4) & _MASK64
    else:
        h = (seed + P5) & _MASK64
    h = (h + n) & _MASK64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h = (rotl(h ^ ((rotl((lane * P2) & _MASK64, 31) * P1) & _MASK64), 27)
             * P1 + P4) & _MASK64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = (rotl(h ^ ((lane * P1) & _MASK64), 23) * P2 + P3) & _MASK64
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & _MASK64), 11) * P1) & _MASK64
        i += 1
    h ^= h >> 33
    h = (h * int(_XP2)) & _MASK64
    h ^= h >> 29
    h = (h * int(_XP3)) & _MASK64
    h ^= h >> 32
    return h


def _xxh_step8(h: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _vrotl64(h ^ (_vrotl64(lane * _XP2, 31) * _XP1), 27) * _XP1 + _XP4


def _xxh_step4(h: np.ndarray, lane32: np.ndarray) -> np.ndarray:
    return _vrotl64(h ^ (lane32 * _XP1), 23) * _XP2 + _XP3


def _xxh_step1(h: np.ndarray, byte: np.ndarray) -> np.ndarray:
    return _vrotl64(h ^ (byte * _XP5), 11) * _XP1


def xxh64_fixed(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of fixed-width (4/8-byte LE image) elements.

    Bit-identical to ``xxh64(struct.pack('<I'/'<Q', v))`` — preserves the
    reference's Add(123) == Add(LE bytes) identity rule under xxhash64.
    Pure numpy: two rotate-multiply passes + avalanche per batch.
    """
    values = np.ascontiguousarray(values)
    if values.dtype == np.float32:
        values = values.view(np.uint32)
    elif values.dtype == np.float64:
        values = values.view(np.uint64)
    width = values.dtype.itemsize
    n = len(values)
    h = np.full(n, (seed + int(_XP5) + width) & _MASK64, dtype=np.uint64)
    if width == 4:
        lane = values.astype(np.uint32, copy=False).astype(np.uint64)
        h = _xxh_step4(h, lane)
    elif width == 8:
        lane = values.view(np.uint64).astype(np.uint64, copy=False)
        h = _xxh_step8(h, lane)
    else:
        raise TypeError(f"unsupported dtype for xxh64_fixed: {values.dtype}")
    return _xxh_avalanche(h)


def _gather_u64(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Unaligned little-endian u64 loads at arbitrary byte positions."""
    out = data[pos].astype(np.uint64)
    for j in range(1, 8):
        out |= data[pos + j].astype(np.uint64) << U64(8 * j)
    return out


def _gather_u32(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    out = data[pos].astype(np.uint64)
    for j in range(1, 4):
        out |= data[pos + j].astype(np.uint64) << U64(8 * j)
    return out


def xxh64_bytes_array(data: np.ndarray, starts: np.ndarray,
                      lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over n variable-length byte strings (all lengths).

    Strings are processed in parallel position-wise: the 32-byte block loop
    iterates max(n_blocks) rounds over a shrinking active set; the ≤31-byte
    tail is three masked 8-byte steps + one 4-byte + three 1-byte steps.
    Bit-identical to :func:`xxh64` on every element.
    """
    n = len(starts)
    starts = starts.astype(np.int64, copy=False)
    lengths = lengths.astype(np.int64, copy=False)
    h = np.empty(n, dtype=np.uint64)
    nblocks = lengths >> 5
    big = np.flatnonzero(nblocks > 0)
    if len(big):
        m = len(big)
        acc = [np.full(m, (seed + int(_XP1) + int(_XP2)) & _MASK64, dtype=np.uint64),
               np.full(m, (seed + int(_XP2)) & _MASK64, dtype=np.uint64),
               np.full(m, seed & _MASK64, dtype=np.uint64),
               np.full(m, (seed - int(_XP1)) & _MASK64, dtype=np.uint64)]
        pos = starts[big].copy()
        remaining = nblocks[big].copy()
        act = np.arange(m)
        while len(act):
            p = pos[act]
            for j in range(4):
                lane = _gather_u64(data, p + 8 * j)
                acc[j][act] = _vrotl64(acc[j][act] + lane * _XP2, 31) * _XP1
            pos[act] += 32
            remaining[act] -= 1
            act = act[remaining[act] > 0]
        hh = (_vrotl64(acc[0], 1) + _vrotl64(acc[1], 7)
              + _vrotl64(acc[2], 12) + _vrotl64(acc[3], 18))
        for a in acc:
            hh = (hh ^ (_vrotl64(a * _XP2, 31) * _XP1)) * _XP1 + _XP4
        h[big] = hh
    small = nblocks == 0
    h[small] = U64((seed + int(_XP5)) & _MASK64)
    h += lengths.astype(np.uint64)
    tail_start = starts + (nblocks << 5)
    tail_len = lengths & 31
    # up to three 8-byte tail steps
    n8 = tail_len >> 3
    for k in range(3):
        i = np.flatnonzero(n8 > k)
        if len(i) == 0:
            break
        lane = _gather_u64(data, tail_start[i] + 8 * k)
        h[i] = _xxh_step8(h[i], lane)
    # one optional 4-byte step
    pos4 = tail_start + (n8 << 3)
    has4 = (tail_len & 7) >= 4
    i = np.flatnonzero(has4)
    if len(i):
        h[i] = _xxh_step4(h[i], _gather_u32(data, pos4[i]))
    # up to three 1-byte steps
    posb = pos4 + (has4.astype(np.int64) << 2)
    rem = tail_len & 3
    for t in range(3):
        i = np.flatnonzero(rem > t)
        if len(i) == 0:
            break
        h[i] = _xxh_step1(h[i], data[posb[i] + t].astype(np.uint64))
    return _xxh_avalanche(h)


def encode_element(x) -> bytes:
    """Normalize a scalar element to its identity bytes (reference rules).

    Identity is TYPED, exactly like the reference's Add overloads: a plain
    Python int follows the C# literal rule (int32 image when the value
    fits, else int64/uint64), while a NUMPY scalar follows its dtype width
    — np.int64(5) hashes the 8-byte image even though 5 fits in int32
    (round-4 session-9 review: the old value-range rule made np.int64(5)
    and np.array([5], np.int64) hash DIFFERENTLY, so a scalar add/query
    could never match a batch add of the same value). To probe a sketch
    built from an int64 batch, query with np.int64(v) (or a batch call).
    """
    if isinstance(x, bytes):
        return x
    if isinstance(x, str):
        return encode_str(x)
    if isinstance(x, (bool, np.bool_)):
        raise TypeError("bool elements are not supported")
    if isinstance(x, (int, np.integer)):
        if isinstance(x, (np.int32, np.uint32)):
            return struct.pack("<I", int(np.uint32(x)))
        if isinstance(x, (np.int8, np.int16, np.uint8, np.uint16)):
            # the batch kernels widen narrow ints via the int32 image
            return encode_int32(int(x))
        if isinstance(x, np.uint64):
            return encode_uint64(int(x))
        if isinstance(x, np.int64):
            return encode_int64(int(x))
        v = int(x)
        if -(2**31) <= v < 2**31:
            return encode_int32(v)
        return encode_int64(v) if v < 2**63 else encode_uint64(v)
    if isinstance(x, (float, np.floating)):
        if isinstance(x, np.float32):
            return encode_float32(float(x))
        return encode_float64(float(x))
    raise TypeError(f"unsupported element type: {type(x)}")



def wordfnv64_fixed(values: np.ndarray) -> np.ndarray:
    """Vectorized wordfnv over fixed-width 4/8-byte values: the byte image
    is a single (zero-padded) little-endian word, folded then length-mixed —
    bit-identical to the scalar :func:`wordfnv64` on the same bytes."""
    values = np.ascontiguousarray(values)
    width = values.dtype.itemsize
    if width == 4:
        w = values.view(np.uint32).astype(np.uint64)
    elif width == 8:
        w = values.view(np.uint64)
    else:
        raise TypeError(
            f"unsupported dtype for wordfnv64_fixed: {values.dtype}")
    h = (_FNV_OFFSET ^ w) * _FNV_PRIME
    return (h ^ U64(width)) * _FNV_PRIME



def _xxh128_dotnet_scalar(data: bytes) -> int:
    from .xxh3 import xxh128_dotnet

    return xxh128_dotnet(data)


def _polars_scalar_unsupported(data: bytes) -> int:
    raise ValueError(
        "the 'polars' hash backend is a batch string-path accelerator "
        "(hash_arrow_binary); it has no scalar byte-image rule — use "
        "add_arrow/add_values, or pick fnv1a_mix/xxhash64 for scalar adds")


HASH_FUNCTIONS = {
    "fnv1a": fnv1a64,
    "fnv1a_mix": fnv1a64_mix,
    "wordfnv_mix": wordfnv64_mix,
    "murmur3": murmur3_128_x64_low64,
    "xxhash64": xxh64,
    # the reference DEFAULT: BitConverter.ToUInt64(XxHash128.Hash(x))
    # (CardinalityEstimator.cs:212-213) — bit-exact numpy port in xxh3.py
    "xxhash128": _xxh128_dotnet_scalar,
    "splitmix64": lambda data: splitmix64_scalar(int.from_bytes(data[:8].ljust(8, b"\0"), "little")),
    # registered so a configured-but-unsupported path raises an actionable
    # error instead of a bare KeyError mid-pipeline (round-3 review fix)
    "polars": _polars_scalar_unsupported,
}


def hash_scalar(data: bytes, hash_name: str = DEFAULT_HASH) -> int:
    return HASH_FUNCTIONS[hash_name](data)


def hash_fixed_batch(values: np.ndarray, hash_name: str = DEFAULT_HASH) -> np.ndarray:
    """Vectorized hash of a fixed-width numeric array under `hash_name`.

    fnv1a_mix (default) preserves the reference's byte-identity rule with a
    well-avalanched finalizer; splitmix64 is a faster mixer whose identity
    rule is the 64-bit integer value itself.
    """
    values = np.ascontiguousarray(values)
    dt = values.dtype
    if dt == np.bool_:
        raise TypeError("bool elements are not supported")  # reference rule
    if dt.kind in "iu" and dt.itemsize < 4:
        # narrow ints hash via their widened 4-byte image — the reference
        # encodes small ints through the int32 rule (round-3 review fix:
        # int8/int16 columns crashed the fixed-width kernels)
        values = values.astype(np.int32 if dt.kind == "i" else np.uint32)
    elif dt.kind == "f" and dt.itemsize < 4:
        values = values.astype(np.float32)
    if hash_name == "fnv1a":
        return fnv1a64_fixed(values)
    if hash_name == "fnv1a_mix":
        return splitmix64_inplace(fnv1a64_fixed(values))
    if hash_name == "xxhash64":
        return xxh64_fixed(values)
    if hash_name == "wordfnv_mix":
        return splitmix64_inplace(wordfnv64_fixed(values))
    if hash_name == "xxhash128":
        from .xxh3 import xxh128_dotnet_fixed

        return xxh128_dotnet_fixed(values)
    if hash_name in ("splitmix64", "polars"):
        # "polars" numeric identity rule: the 64-bit integer value (fast mixer)
        return splitmix64(values.astype(np.uint64, copy=False))
    if hash_name == "murmur3":
        return murmur3_128_x64_low64_fixed(values)
    raise ValueError(f"unknown hash function: {hash_name}")
