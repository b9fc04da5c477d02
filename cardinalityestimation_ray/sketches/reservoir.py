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
