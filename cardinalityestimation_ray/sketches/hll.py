"""HyperLogLog sketch with direct/sparse/dense modes and v3.1 wire format.

Reimplements (from scratch, vectorized over numpy batches) the semantics of the
reference estimator:

- direct (exact) counting up to 100 elements, then sparse registers, then dense
  (/root/reference/CardinalityEstimation/CardinalityEstimator.cs:755-788,
  HllConstants.cs:42, sparse cap m/15-10 at CardinalityEstimator.cs:290);
- estimate = harmonic mean + Heule bias correction + LinearCounting selection
  (CardinalityEstimator.cs:542-600);
- merge = register max, direct-set union with drop rules; commutative and
  associative (CardinalityEstimator.cs:615-685);
- versioned little-endian wire format v3.1 with the reference's bounds
  validation (CardinalityEstimatorSerializer.cs:125-348).

The add path is batch-first: `add_hashes(np.uint64[])` runs a constant number
of numpy passes per batch (hash→index/rank extraction, bitmap scatter,
per-register max) — no per-element Python in the hot loop.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pyarrow as pa

from . import hashing
from .base import Sketch
from .bias import correct_bias
from .constants import (
    DIRECT_COUNTER_MAX_ELEMENTS,
    INVERSE_POWERS_OF_TWO,
    get_alpha_m,
    get_sub_algorithm_selection_threshold,
    sparse_max_elements,
    std_error,
    validate_bits,
)

WIRE_FORMAT_MAJOR = 3
WIRE_FORMAT_MINOR = 1

_U64 = np.uint64


def get_sigma(hash_value: int, bits_to_count: int) -> int:
    """Rank statistic: leading zeros of the low ``bits_to_count`` bits, + 1.

    Parity with the reference GetSigma (CardinalityEstimator.cs:801-814),
    golden vectors in CardinalityEstimatorTests.cs:60-70.
    """
    if hash_value == 0:
        return bits_to_count + 1
    masked = hash_value & ((1 << bits_to_count) - 1)
    return bits_to_count - masked.bit_length() + 1


class HyperLogLog(Sketch):
    """Mergeable HyperLogLog cardinality sketch (batch-vectorized)."""

    kind = "hll"

    __slots__ = (
        "b",
        "bits_for_hll",
        "m",
        "alpha_m",
        "threshold",
        "sparse_max",
        "hash_name",
        "direct",
        "is_sparse",
        "sparse",
        "dense",
        "count_additions",
        "_scratch",
    )

    def __init__(self, b: int = 14, use_direct_counting: bool = True,
                 hash_name: str = hashing.DEFAULT_HASH):
        validate_bits(b)
        self.b = b
        self.bits_for_hll = 64 - b
        self.m = 1 << b
        self.alpha_m = get_alpha_m(self.m)
        self.threshold = get_sub_algorithm_selection_threshold(b)
        self.sparse_max = sparse_max_elements(self.m)
        self.hash_name = hash_name
        self.direct: set[int] | None = set() if use_direct_counting else None
        self.is_sparse = True
        self.sparse: dict[int, int] | None = {}
        self.dense: np.ndarray | None = None
        self.count_additions = 0
        self._scratch: np.ndarray | None = None
        if self.sparse_max <= 0:
            self._switch_to_dense()

    # ------------------------------------------------------------------
    # properties

    @property
    def std_error(self) -> float:
        return std_error(self.b)

    def __repr__(self) -> str:
        mode = "direct" if self.direct is not None else ("sparse" if self.is_sparse else "dense")
        return f"HyperLogLog(b={self.b}, mode={mode}, adds={self.count_additions})"

    # ------------------------------------------------------------------
    # add path

    def add_hashes(self, h: np.ndarray) -> None:
        """Add a batch of pre-hashed 64-bit elements (the vectorized kernel)."""
        h = np.ascontiguousarray(h, dtype=np.uint64)
        n = len(h)
        self.count_additions += n
        if n == 0:
            return
        idx = (h >> _U64(64 - self.b)).astype(np.int64)
        mask = _U64((1 << self.bits_for_hll) - 1)
        masked = h & mask
        # rank = leading zeros within low bits_for_hll bits, + 1
        #      = bits_for_hll - bit_length(masked) + 1  (bit_length(0) = 0)
        if self.bits_for_hll <= 53:
            bl = hashing.bit_length_u64_small(masked)
        else:
            bl = hashing.bit_length_u64(masked)
        sigma = (self.bits_for_hll + 1 - bl).astype(np.uint8)
        self._registers_add(idx, sigma)
        if self.direct is not None:
            # cheap exactness-preserving shortcut: the number of occupied
            # registers lower-bounds the number of distinct elements ever
            # added, so when it exceeds the direct cap the set must drop —
            # without sorting/deduplicating the batch. Only genuinely small
            # batches pay np.unique.
            occupied = (len(self.sparse) if self.is_sparse
                        else int(np.count_nonzero(self.dense)))
            if occupied > DIRECT_COUNTER_MAX_ELEMENTS:
                self.direct = None
            else:
                uh = np.unique(h)
                if len(uh) > DIRECT_COUNTER_MAX_ELEMENTS:
                    self.direct = None
                else:
                    self.direct.update(int(x) for x in uh)
                    if len(self.direct) > DIRECT_COUNTER_MAX_ELEMENTS:
                        self.direct = None

    def add_hash(self, h: int) -> None:
        self.add_hashes(np.asarray([h], dtype=np.uint64))

    def add(self, element) -> None:
        """Scalar convenience add; identity bytes follow the reference rules."""
        data = hashing.encode_element(element)
        self.add_hash(hashing.hash_scalar(data, self.hash_name))

    def add_values(self, values: np.ndarray) -> None:
        """Vectorized add of a fixed-width numeric numpy array."""
        self.add_hashes(hashing.hash_fixed_batch(values, self.hash_name))

    # add_arrow: inherited from Sketch (one copy of the
    # string-vs-numeric dispatch lives on the base class)

    # ------------------------------------------------------------------
    # register update kernels

    def _registers_add(self, idx: np.ndarray, sigma: np.ndarray) -> None:
        if self.is_sparse:
            self._sparse_add(idx, sigma)
        else:
            self._dense_add(idx, sigma)

    def _sparse_add(self, idx: np.ndarray, sigma: np.ndarray) -> None:
        # O(n + m) union count (no sort): if the merged register set would
        # overflow the sparse cap, promote and scatter straight into dense —
        # same final state as the reference's incremental promotion.
        seen = np.zeros(self.m, dtype=bool)
        seen[idx] = True
        if self.sparse:
            keys = np.fromiter(self.sparse.keys(), dtype=np.int64,
                               count=len(self.sparse))
            seen[keys] = True
        union = int(np.count_nonzero(seen))
        if union > self.sparse_max:
            self._switch_to_dense()
            self._dense_add(idx, sigma)
            return
        # fits: per-index max via a scratch dense bank, then a bounded
        # (<= sparse_max entries) dict merge
        tmp = np.zeros(self.m, dtype=np.uint8)
        self._scatter_max(tmp, idx, sigma)
        sp = self.sparse
        for i in np.flatnonzero(tmp).tolist():
            s = int(tmp[i])
            if s > sp.get(i, 0):
                sp[i] = s

    def _scatter_max(self, out: np.ndarray, idx: np.ndarray, sigma: np.ndarray) -> None:
        """out[idx] = max(out[idx], sigma) with duplicate indices."""
        n = len(idx)
        if n < self.m:
            # ufunc.at costs ~O(n); the bitmap path below costs ~O(64m) —
            # only worth it when the batch outnumbers the register bank
            np.maximum.at(out, idx, sigma)
            return
        # large batch: bitmap scatter (duplicate-safe fancy assignment), then
        # one packbits + bit-length pass per register — O(n + 64m), no ufunc.at
        if self._scratch is None:
            self._scratch = np.zeros(self.m * 64, dtype=bool)
        present = self._scratch
        present[:] = False
        present[(idx << 6) | sigma] = True
        packed = np.packbits(present.reshape(self.m, 64), axis=1, bitorder="little")
        masks = packed.view(np.uint64).ravel()
        batch_max = hashing.bit_length_u64(masks)  # = max sigma + 1, 0 if none
        np.maximum(out, np.maximum(batch_max, 1) - 1, out=out)

    def _dense_add(self, idx: np.ndarray, sigma: np.ndarray) -> None:
        self._scatter_max(self.dense, idx, sigma)

    def _switch_to_dense(self) -> None:
        if not self.is_sparse:
            return
        dense = np.zeros(self.m, dtype=np.uint8)
        if self.sparse:
            keys = np.fromiter(self.sparse.keys(), dtype=np.int64, count=len(self.sparse))
            vals = np.fromiter(self.sparse.values(), dtype=np.uint8, count=len(self.sparse))
            dense[keys] = vals
        self.dense = dense
        self.sparse = None
        self.is_sparse = False

    def reserve_dense(self) -> "HyperLogLog":
        """Performance hint: allocate the dense register bank up front.

        Skips the sparse phase's per-chunk dict merge when the caller knows
        the incoming stream is at least register-bank-sized (the sketch would
        promote almost immediately anyway). Pure storage change — the
        ``direct`` exact-count set, estimates, merge semantics, and the wire
        format (direct blobs still serialize tiny) are unaffected.
        """
        self._switch_to_dense()
        return self

    # ------------------------------------------------------------------
    # estimate

    def estimate(self) -> int:
        """Cardinality estimate (exact while the direct counter is alive)."""
        if self.direct is not None:
            return len(self.direct)
        m = self.m
        if self.is_sparse:
            if self.sparse:
                vals = np.fromiter(self.sparse.values(), dtype=np.uint8,
                                   count=len(self.sparse))
                z_inverse = float(INVERSE_POWERS_OF_TWO[vals].sum())
            else:
                z_inverse = 0.0
            v = float(m - len(self.sparse))
            z_inverse += m - len(self.sparse)
        else:
            z_inverse = float(INVERSE_POWERS_OF_TWO[self.dense].sum())
            v = float(np.count_nonzero(self.dense == 0))
        e = self.alpha_m * m * m / z_inverse
        if e <= 5.0 * m:
            e = correct_bias(e, self.b)
        if v > 0:
            h = m * math.log(m / v)
        else:
            h = e
        if h <= self.threshold:
            return int(round(h))
        return int(round(e))

    # ------------------------------------------------------------------
    # merge

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        """In-place union merge; commutative and associative on final state."""
        if other.m != self.m:
            raise ValueError(
                "Cannot merge estimators with different accuracy/map sizes")
        if other.hash_name != self.hash_name:
            raise ValueError("Cannot merge estimators with different hash functions")
        self.count_additions += other.count_additions
        if self.is_sparse and other.is_sparse:
            sp = self.sparse
            for i, s in other.sparse.items():
                prev = sp.get(i, 0)
                if s > prev:
                    sp[i] = s
            if len(sp) > self.sparse_max:
                self._switch_to_dense()
        else:
            self._switch_to_dense()
            if other.is_sparse:
                if other.sparse:
                    keys = np.fromiter(other.sparse.keys(), dtype=np.int64,
                                       count=len(other.sparse))
                    vals = np.fromiter(other.sparse.values(), dtype=np.uint8,
                                       count=len(other.sparse))
                    np.maximum.at(self.dense, keys, vals)
            else:
                np.maximum(self.dense, other.dense, out=self.dense)
        if other.direct is not None:
            if self.direct is not None:
                self.direct |= other.direct
                if len(self.direct) > DIRECT_COUNTER_MAX_ELEMENTS:
                    self.direct = None
        else:
            self.direct = None
        return self

    @staticmethod
    def union_estimate(a: "HyperLogLog", b: "HyperLogLog") -> int:
        """|A ∪ B| estimate (lossless: register max is exactly the union sketch)."""
        return a.copy().merge(b).estimate()

    @staticmethod
    def intersection_estimate(a: "HyperLogLog", b: "HyperLogLog") -> int:
        """|A ∩ B| by inclusion–exclusion (|A| + |B| − |A ∪ B|).

        HLL cannot sketch intersections directly (SURVEY.md §2.7); the
        absolute error is on the order of the union's error, so small
        intersections of large sets are unreliable — documented limitation,
        clamped at 0.
        """
        return max(0, a.estimate() + b.estimate()
                   - HyperLogLog.union_estimate(a, b))

    @staticmethod
    def jaccard_estimate(a: "HyperLogLog", b: "HyperLogLog") -> float:
        """|A ∩ B| / |A ∪ B| via inclusion–exclusion (same caveat)."""
        union = HyperLogLog.union_estimate(a, b)
        if union == 0:
            return 1.0
        inter = max(0, a.estimate() + b.estimate() - union)
        return inter / union

    @staticmethod
    def merge_many(sketches) -> "HyperLogLog | None":
        """Merge an iterable of sketches (None entries tolerated) into a new one."""
        result: HyperLogLog | None = None
        for sk in sketches:
            if sk is None:
                continue
            if result is None:
                result = sk.copy()
            else:
                result.merge(sk)
        return result

    # ------------------------------------------------------------------
    # copy / equality

    def copy(self) -> "HyperLogLog":
        out = HyperLogLog.__new__(HyperLogLog)
        out.b = self.b
        out.bits_for_hll = self.bits_for_hll
        out.m = self.m
        out.alpha_m = self.alpha_m
        out.threshold = self.threshold
        out.sparse_max = self.sparse_max
        out.hash_name = self.hash_name
        out.direct = set(self.direct) if self.direct is not None else None
        out.is_sparse = self.is_sparse
        out.sparse = dict(self.sparse) if self.sparse is not None else None
        out.dense = self.dense.copy() if self.dense is not None else None
        out.count_additions = self.count_additions
        out._scratch = None
        return out

    def __eq__(self, other) -> bool:
        if not isinstance(other, HyperLogLog):
            return NotImplemented
        # hash_name participates in equality like the sibling sketches
        # (round-4 session-9 review: a v3 roundtrip relabels a custom-hash
        # sketch as the default — documented wire behavior — and == was
        # the one comparison that could not see it while merge() raised)
        if (self.b != other.b or self.hash_name != other.hash_name
                or self.is_sparse != other.is_sparse
                or self.count_additions != other.count_additions
                or (self.direct is None) != (other.direct is None)):
            return False
        if self.direct is not None and self.direct != other.direct:
            return False
        if self.is_sparse:
            a = {k: v for k, v in self.sparse.items() if v}
            b = {k: v for k, v in other.sparse.items() if v}
            return a == b
        return bool(np.array_equal(self.dense, other.dense))

    def __hash__(self):  # pragma: no cover - sketches are mutable
        raise TypeError("HyperLogLog is unhashable")

    def registers(self) -> np.ndarray:
        """Dense register image (for cross-parallelism equality tests)."""
        if self.is_sparse:
            dense = np.zeros(self.m, dtype=np.uint8)
            for k, v in self.sparse.items():
                dense[k] = v
            return dense
        return self.dense.copy()

    # ------------------------------------------------------------------
    # wire format (reference v3.1 layout)

    def to_bytes(self) -> bytes:
        """Serialize in the reference v3.1 little-endian layout.

        [u16 major][u16 minor][i32 b][u8 flags: bit1=isSparse, bit0=hasDirect]
        [payload][u64 countAdditions]; payload is direct -> i32 n + n*u64,
        sparse -> i32 n + n*(u16 idx, u8 rank), dense -> i32 m + m bytes.
        Entries are written sorted so blobs are deterministic.
        """
        parts = [struct.pack("<HHiB", WIRE_FORMAT_MAJOR, WIRE_FORMAT_MINOR,
                             self.b,
                             ((1 if self.is_sparse else 0) << 1)
                             | (1 if self.direct is not None else 0))]
        if self.direct is not None:
            parts.append(struct.pack("<i", len(self.direct)))
            for h in sorted(self.direct):
                parts.append(struct.pack("<Q", h))
        elif self.is_sparse:
            parts.append(struct.pack("<i", len(self.sparse)))
            for k in sorted(self.sparse):
                parts.append(struct.pack("<HB", k, self.sparse[k]))
        else:
            parts.append(struct.pack("<i", self.m))
            parts.append(self.dense.tobytes())
        parts.append(struct.pack("<Q", self.count_additions))
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes, hash_name: str | None = None) -> "HyperLogLog":
        """Deserialize with the reference's version gating and bounds checks.

        Hash contract (v3): the layout is byte-pinned to the reference's
        v3.1 wire format, which carries NO hash identifier — the hash is
        supplied by the CALLER (``hash_name``), defaulting to the library
        default, exactly as the C# reference does
        (CardinalityEstimator.cs:668+). Unlike theta/bloom/count-min (whose
        THE2/BLM2/CMS2 formats embed the hash name), a custom-hash HLL blob
        rebuilt without ``hash_name`` is therefore silently labeled with the
        default hash. This is safe for merge-only rebuilds (registers are
        the data; ``merge`` raises on a label mismatch and every pipeline
        stage threads its ``hash_name`` through), but callers who ADD to a
        rebuilt custom-hash sketch must pass ``hash_name`` explicitly.
        """
        view = memoryview(blob)
        pos = 0

        def take(fmt: str):
            nonlocal pos
            size = struct.calcsize(fmt)
            if pos + size > len(view):
                raise ValueError("truncated serialized sketch")
            out = struct.unpack_from(fmt, view, pos)
            pos += size
            return out

        major, minor = take("<HH")
        if major > WIRE_FORMAT_MAJOR:
            raise ValueError(
                f"cannot read data format version {major}.{minor}; "
                f"max supported major version is {WIRE_FORMAT_MAJOR}")
        if major >= 3:
            pass  # hash supplied by caller (defaults to library default)
        elif major >= 2:
            (hash_id,) = take("<B")
            if hash_name is None:
                hash_name = "murmur3" if hash_id == 1 else "fnv1a"
        else:
            hash_name = "fnv1a"
        (b,) = take("<i")
        if not (4 <= b <= 16):
            raise ValueError(
                f"invalid serialized data: bitsPerIndex must be in [4, 16], got {b}")
        m = 1 << b
        (flags,) = take("<B")
        is_sparse = bool(flags & 2)
        has_direct = bool(flags & 1)
        direct: set[int] | None = None
        sparse: dict[int, int] | None = {} if is_sparse else None
        dense: np.ndarray | None = None
        if has_direct:
            (count,) = take("<i")
            if count < 0 or count > DIRECT_COUNTER_MAX_ELEMENTS:
                raise ValueError(
                    f"invalid serialized data: directCount length must be in "
                    f"[0, {DIRECT_COUNTER_MAX_ELEMENTS}], got {count}")
            direct = {take("<Q")[0] for _ in range(count)}
        elif is_sparse:
            (count,) = take("<i")
            if count < 0 or count > m:
                raise ValueError(
                    f"invalid serialized data: sparse lookup length must be in "
                    f"[0, {m}], got {count}")
            max_rank = 64 - b + 1
            for _ in range(count):
                k, v = take("<HB")
                if k >= m:
                    raise ValueError(
                        f"invalid serialized data: sparse register index {k} "
                        f">= m={m}")
                if v > max_rank:
                    raise ValueError(
                        f"invalid serialized data: sparse rank {v} > "
                        f"{max_rank} for bitsPerIndex={b}")
                sparse[k] = v
        else:
            (count,) = take("<i")
            if count != m:
                raise ValueError(
                    f"invalid serialized data: dense lookup length must equal "
                    f"m={m} for bitsPerIndex={b}, got {count}")
            if pos + count > len(view):
                raise ValueError(
                    f"truncated serialized data: expected {count} bytes for "
                    f"dense lookup")
            dense = np.frombuffer(view, dtype=np.uint8, count=count, offset=pos).copy()
            pos += count
            max_rank = 64 - b + 1
            if len(dense) and int(dense.max()) > max_rank:
                raise ValueError(
                    f"invalid serialized data: dense register value "
                    f"{int(dense.max())} > {max_rank} for bitsPerIndex={b}")
        count_additions = 0
        # reference rule: CountAdditions present for format >= 2.1
        # (CardinalityEstimatorSerializer.cs:328-333) — tuple compare so a
        # hypothetical 3.0 blob keeps its counter.
        if (major, minor) >= (2, 1):
            (count_additions,) = take("<Q")
        return cls.from_state(
            b=b,
            direct=direct,
            is_sparse=is_sparse,
            sparse=sparse,
            dense=dense,
            count_additions=count_additions,
            hash_name=hash_name or hashing.DEFAULT_HASH,
        )

    @classmethod
    def from_state(cls, *, b: int, direct: set[int] | None, is_sparse: bool,
                   sparse: dict[int, int] | None, dense: np.ndarray | None,
                   count_additions: int, hash_name: str = hashing.DEFAULT_HASH) -> "HyperLogLog":
        """Rebuild from a state snapshot (reference state-ctor semantics,
        CardinalityEstimator.cs:272-312): when a direct set is present the HLL
        registers are rebuilt from the direct hashes, so direct-mode blobs ship
        only the exact set."""
        validate_bits(b)
        out = cls.__new__(cls)
        out.b = b
        out.bits_for_hll = 64 - b
        out.m = 1 << b
        out.alpha_m = get_alpha_m(out.m)
        out.threshold = get_sub_algorithm_selection_threshold(b)
        out.sparse_max = sparse_max_elements(out.m)
        out.hash_name = hash_name
        out.count_additions = count_additions
        out._scratch = None
        out.direct = set(direct) if direct is not None else None
        out.is_sparse = is_sparse
        out.sparse = dict(sparse) if sparse is not None else None
        out.dense = np.asarray(dense, dtype=np.uint8).copy() if dense is not None else None
        if out.sparse_max <= 0:
            out._switch_to_dense()
        if out.direct is not None:
            # rebuild registers from the exact hash set
            out.is_sparse = True
            out.sparse = {}
            out.dense = None
            if out.sparse_max <= 0:
                out._switch_to_dense()
            if out.direct:
                hashes = np.fromiter(out.direct, dtype=np.uint64, count=len(out.direct))
                idx = (hashes >> _U64(64 - b)).astype(np.int64)
                mask = _U64((1 << out.bits_for_hll) - 1)
                sigma = (out.bits_for_hll + 1
                         - hashing.bit_length_u64(hashes & mask)).astype(np.uint8)
                out._registers_add(idx, sigma)
        return out
