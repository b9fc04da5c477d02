"""Mergeable uniform reservoir sample via the bottom-k-by-random-tag trick.

Each occurrence gets an i.i.d. uniform 64-bit tag; keeping the k smallest
(tag, value) pairs yields a uniform k-subset of ALL occurrences, and the
merge of two reservoirs is just bottom-k of their union — associative and
commutative like every other sketch here, so it plugs into the same
partial/merge-tree scaffold (classic distributed reservoir sampling;
Vitter 1985 lineage, bottom-k formulation).

Tag-stream independence matters: if every per-batch/per-partition partial
drew tags from the SAME seeded stream, elements at equal intra-batch
positions would share tags and the merged "uniform" sample would be
position-correlated across partitions (round-1 ADVICE finding).  The
default ``seed=None`` therefore draws fresh per-instance entropy from
``os.urandom``; pass an explicit int seed only when single-process
reproducibility is required and no two partials share it (the distributed
stages mix a per-instance nonce in regardless via :func:`_instance_seed`).
"""

from __future__ import annotations

import itertools
import os
import struct

import numpy as np

from .base import Sketch

_MAGIC = b"RSV1"

_instance_counter = itertools.count()


def _instance_seed(seed: int | None) -> np.random.SeedSequence:
    """Per-instance seed: explicit ``seed`` alone is reproducible; ``None``
    mixes urandom entropy + a process-local counter so every instance —
    including partials built from one shared spec across actors — gets an
    independent tag stream."""
    if seed is not None:
        return np.random.SeedSequence(seed)
    return np.random.SeedSequence(
        [int.from_bytes(os.urandom(8), "little"),
         os.getpid(), next(_instance_counter)])


class ReservoirSample(Sketch):
    kind = "reservoir"

    __slots__ = ("k", "seed", "tags", "values", "n", "_rng")

    def __init__(self, k: int = 1024, seed: int | None = None):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = k
        self.seed = seed
        self.tags = np.empty(0, dtype=np.uint64)
        self.values = np.empty(0, dtype=np.float64)
        self.n = 0
        self._rng = np.random.Generator(np.random.PCG64(_instance_seed(seed)))

    def _keep_bottom_k(self, tags: np.ndarray, values: np.ndarray) -> None:
        if len(tags) > self.k:
            idx = np.argpartition(tags, self.k - 1)[:self.k]
            tags = tags[idx]
            values = values[idx]
        self.tags = tags
        self.values = values

    def add_values(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        if len(values) == 0:
            return
        self.n += len(values)
        new_tags = self._rng.integers(0, 2**64, size=len(values),
                                      dtype=np.uint64)
        self._keep_bottom_k(np.concatenate([self.tags, new_tags]),
                            np.concatenate([self.values, values]))

    def sample(self) -> np.ndarray:
        """The current uniform sample (<= k values, unordered)."""
        return self.values.copy()

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        if other.k != self.k:
            raise ValueError("cannot merge reservoirs with different k")
        self.n += other.n
        self._keep_bottom_k(np.concatenate([self.tags, other.tags]),
                            np.concatenate([self.values, other.values]))
        return self

    def copy(self) -> "ReservoirSample":
        out = ReservoirSample(self.k, None)  # fresh tag stream for the copy
        out.seed = self.seed
        out.tags = self.tags.copy()
        out.values = self.values.copy()
        out.n = self.n
        return out

    def to_bytes(self) -> bytes:
        header = _MAGIC + struct.pack("<IQQ", self.k, self.n, len(self.tags))
        return header + self.tags.tobytes() + self.values.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ReservoirSample":
        if blob[:4] != _MAGIC:
            raise ValueError("invalid reservoir blob: bad magic")
        try:
            k, n, cnt = struct.unpack_from("<IQQ", blob, 4)
        except struct.error as e:
            raise ValueError(f"truncated reservoir blob: {e}") from None
        if k < 1 or cnt > k:
            raise ValueError(f"invalid reservoir blob: k={k} cnt={cnt}")
        off = 4 + struct.calcsize("<IQQ")
        if len(blob) - off != cnt * 16:
            raise ValueError(
                f"invalid reservoir blob: expected {cnt * 16} payload bytes, "
                f"got {len(blob) - off}")
        out = cls(k)
        out.tags = np.frombuffer(blob, dtype=np.uint64, count=cnt,
                                 offset=off).copy()
        out.values = np.frombuffer(blob, dtype=np.float64, count=cnt,
                                   offset=off + cnt * 8).copy()
        out.n = n
        return out


class WeightedReservoirSample(Sketch):
    """Weighted uniform sample WITHOUT replacement — Efraimidis & Spirakis
    A-ES ("Weighted random sampling with a reservoir", IPL 2006): each
    occurrence draws u ~ U(0,1) and gets key -log(u)/w; keeping the k
    SMALLEST keys yields a sample where inclusion probability follows the
    weights. Merge = bottom-k of the union (same scaffold as the unweighted
    bottom-k sketch). Weight 0 rows are never sampled.
    """

    kind = "weighted_reservoir"

    __slots__ = ("k", "seed", "keys", "values", "weights", "n", "total_weight",
                 "_rng")

    def __init__(self, k: int = 1024, seed: int | None = None):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = k
        self.seed = seed
        self.keys = np.empty(0, dtype=np.float64)
        self.values = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0
        self.total_weight = 0.0
        self._rng = np.random.Generator(np.random.PCG64(_instance_seed(seed)))

    def _keep_bottom_k(self, keys, values, weights) -> None:
        if len(keys) > self.k:
            idx = np.argpartition(keys, self.k - 1)[:self.k]
            keys, values, weights = keys[idx], values[idx], weights[idx]
        self.keys, self.values, self.weights = keys, values, weights

    def add_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        weights = np.asarray(weights, dtype=np.float64)
        if len(values) != len(weights):
            raise ValueError("values and weights must align")
        if not np.all(weights >= 0):  # catches negatives AND NaN
            raise ValueError("weights must be >= 0 and non-NaN")
        pos = weights > 0
        self.n += len(values)
        self.total_weight += float(weights.sum())
        values, weights = values[pos], weights[pos]
        if len(values) == 0:
            return
        u = self._rng.random(len(values))
        np.clip(u, 1e-300, None, out=u)
        keys = -np.log(u) / weights
        self._keep_bottom_k(np.concatenate([self.keys, keys]),
                            np.concatenate([self.values, values]),
                            np.concatenate([self.weights, weights]))

    def add_values(self, values: np.ndarray) -> None:
        """Unweighted add (weight 1 per occurrence)."""
        values = np.asarray(values, dtype=np.float64)
        self.add_weighted(values, np.ones(len(values)))

    def sample(self) -> np.ndarray:
        return self.values.copy()

    def sample_weights(self) -> np.ndarray:
        return self.weights.copy()

    def merge(self, other: "WeightedReservoirSample") -> "WeightedReservoirSample":
        if other.k != self.k:
            raise ValueError("cannot merge weighted reservoirs with different k")
        self.n += other.n
        self.total_weight += other.total_weight
        self._keep_bottom_k(np.concatenate([self.keys, other.keys]),
                            np.concatenate([self.values, other.values]),
                            np.concatenate([self.weights, other.weights]))
        return self

    def copy(self) -> "WeightedReservoirSample":
        out = WeightedReservoirSample(self.k, None)
        out.seed = self.seed
        out.keys = self.keys.copy()
        out.values = self.values.copy()
        out.weights = self.weights.copy()
        out.n = self.n
        out.total_weight = self.total_weight
        return out

    def to_bytes(self) -> bytes:
        header = b"WRS1" + struct.pack("<IQdQ", self.k, self.n,
                                       self.total_weight, len(self.keys))
        return (header + self.keys.tobytes() + self.values.tobytes()
                + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "WeightedReservoirSample":
        if blob[:4] != b"WRS1":
            raise ValueError("invalid weighted-reservoir blob: bad magic")
        try:
            k, n, tw, cnt = struct.unpack_from("<IQdQ", blob, 4)
        except struct.error as e:
            raise ValueError(f"truncated weighted-reservoir blob: {e}") from None
        if k < 1 or cnt > k:
            raise ValueError(f"invalid weighted-reservoir blob: k={k} cnt={cnt}")
        off = 4 + struct.calcsize("<IQdQ")
        if len(blob) - off != cnt * 24:
            raise ValueError(
                f"invalid weighted-reservoir blob: expected {cnt * 24} payload "
                f"bytes, got {len(blob) - off}")
        out = cls(k)
        out.keys = np.frombuffer(blob, dtype=np.float64, count=cnt,
                                 offset=off).copy()
        out.values = np.frombuffer(blob, dtype=np.float64, count=cnt,
                                   offset=off + cnt * 8).copy()
        out.weights = np.frombuffer(blob, dtype=np.float64, count=cnt,
                                    offset=off + cnt * 16).copy()
        out.n = n
        out.total_weight = tw
        return out
