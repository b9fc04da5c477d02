"""t-digest (Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", 2019), merging variant, batch-vectorized.

Listed by the reference only as future roadmap (ROADMAP.md:169-172); built
from the published paper. Centroids are compressed with the k1 scale
function k(q) = (delta / 2pi) * asin(2q - 1), which bounds each cluster to
one unit of k so rank error is O(q(1-q)/delta) — tightest at the tails.

Compression here is the *vectorized uniform k-partition*: sort the combined
centroids, assign each to cluster floor(k(q_mid)), and segment-reduce — a
deterministic O(n log n) batch step with the same error bound as the
sequential greedy merge. Merge = concatenate + compress (weakly ordered:
results differ per merge order within the published bound, so tests assert
bounds, not exact values — SURVEY.md §7.4).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch

_MAGIC = b"TDG1"


class TDigest(Sketch):
    kind = "tdigest"

    __slots__ = ("delta", "means", "weights", "total_weight", "_min", "_max",
                 "_buf_means", "_buf_weights")

    def __init__(self, delta: int = 200):
        if delta < 10:
            raise ValueError(f"delta (compression) must be >= 10, got {delta}")
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.total_weight = 0.0
        self._min = math.inf
        self._max = -math.inf
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []

    # ------------------------------------------------------------------

    def add_values(self, values: np.ndarray,
                   weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(values)
        values = values[keep]
        if weights is None:
            w = np.ones(len(values))
        else:
            # apply the same NaN mask so means stay aligned with weights
            w = np.asarray(weights, dtype=np.float64)[keep]
            if len(w) and (np.isnan(w).any() or (w < 0).any()):
                raise ValueError("t-digest weights must be >= 0 and non-NaN")
            # zero-weight items carry no mass; keeping them could form a
            # weight-0 compression cluster whose mean is 0/0 = NaN and
            # silently poison every later quantile (round-3 review fix)
            nz = w > 0
            if not nz.all():
                values = values[nz]
                w = w[nz]
        if len(values) == 0:
            return
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        self.total_weight += float(w.sum())
        self._buf_means.append(values)
        self._buf_weights.append(w)
        # amortized compaction: buffer up to ~8x centroid budget
        if sum(len(b) for b in self._buf_means) > 8 * self.delta:
            self._compress()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * math.pi)) * np.arcsin(2.0 * q - 1.0)

    def _compress(self) -> None:
        if not self._buf_means and len(self.means) <= 2 * self.delta:
            return
        means = np.concatenate([self.means] + self._buf_means)
        weights = np.concatenate([self.weights] + self._buf_weights)
        self._buf_means = []
        self._buf_weights = []
        if len(means) == 0:
            return
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = weights.sum()
        cumw = np.cumsum(weights)
        q_mid = (cumw - weights / 2.0) / total
        cluster = np.floor(self._k(q_mid) + self.delta / 4.0).astype(np.int64)
        # segment-reduce per cluster
        bounds = np.r_[0, np.flatnonzero(np.diff(cluster)) + 1]
        seg_w = np.add.reduceat(weights, bounds)
        seg_wm = np.add.reduceat(weights * means, bounds)
        self.means = seg_wm / seg_w
        self.weights = seg_w
        self.total_weight = float(total)

    # ------------------------------------------------------------------

    def quantile(self, q: float) -> float:
        """Estimate the value at quantile q in [0, 1]."""
        self._compress()
        if len(self.means) == 0:
            return math.nan
        if q <= 0:
            return self._min
        if q >= 1:
            return self._max
        target = q * self.total_weight
        cumw = np.cumsum(self.weights)
        centers = cumw - self.weights / 2.0
        i = int(np.searchsorted(centers, target))
        if i == 0:
            lo_x, lo_c = self._min, 0.0
            hi_x, hi_c = self.means[0], centers[0]
        elif i >= len(self.means):
            lo_x, lo_c = self.means[-1], centers[-1]
            hi_x, hi_c = self._max, self.total_weight
        else:
            lo_x, lo_c = self.means[i - 1], centers[i - 1]
            hi_x, hi_c = self.means[i], centers[i]
        if hi_c == lo_c:
            return float(min(max(lo_x, self._min), self._max))
        frac = (target - lo_c) / (hi_c - lo_c)
        # clamp: the interpolation can overshoot min/max by one ulp when
        # |hi_x - lo_x| underflows relative to the endpoints
        return float(min(max(lo_x + frac * (hi_x - lo_x), self._min), self._max))

    def quantiles(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(float(q)) for q in qs])

    def cdf(self, x: float) -> float:
        """Approximate rank of x as a fraction of total weight."""
        self._compress()
        if len(self.means) == 0:
            return math.nan
        if x <= self._min:
            return 0.0
        if x >= self._max:
            return 1.0
        cumw = np.cumsum(self.weights)
        centers = cumw - self.weights / 2.0
        i = int(np.searchsorted(self.means, x))
        if i == 0:
            lo_x, lo_c = self._min, 0.0
            hi_x, hi_c = self.means[0], centers[0]
        elif i >= len(self.means):
            lo_x, lo_c = self.means[-1], centers[-1]
            hi_x, hi_c = self._max, self.total_weight
        else:
            lo_x, lo_c = self.means[i - 1], centers[i - 1]
            hi_x, hi_c = self.means[i], centers[i]
        if hi_x == lo_x:
            return float(hi_c / self.total_weight)
        frac = (x - lo_x) / (hi_x - lo_x)
        return float((lo_c + frac * (hi_c - lo_c)) / self.total_weight)

    @property
    def n_centroids(self) -> int:
        self._compress()
        return len(self.means)

    # ------------------------------------------------------------------

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("cannot merge t-digests with different compression")
        other._compress()
        if len(other.means):
            self._buf_means.append(other.means.copy())
            self._buf_weights.append(other.weights.copy())
        self.total_weight += other.total_weight
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def copy(self) -> "TDigest":
        self._compress()
        out = TDigest(self.delta)
        out.means = self.means.copy()
        out.weights = self.weights.copy()
        out.total_weight = self.total_weight
        out._min = self._min
        out._max = self._max
        return out

    # ------------------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._compress()
        header = _MAGIC + struct.pack("<IQdd", self.delta, len(self.means),
                                      self._min, self._max)
        return header + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        if blob[:4] != _MAGIC:
            raise ValueError("invalid t-digest blob: bad magic")
        try:
            delta, n, mn, mx = struct.unpack_from("<IQdd", blob, 4)
        except struct.error as e:
            raise ValueError(f"truncated t-digest blob: {e}") from None
        if delta < 10:
            raise ValueError(f"invalid t-digest blob: delta {delta}")
        off = 4 + struct.calcsize("<IQdd")
        expected = 2 * n * 8
        if len(blob) - off != expected:
            raise ValueError(
                f"invalid t-digest blob: expected {expected} payload bytes, "
                f"got {len(blob) - off}")
        out = cls(delta)
        out.means = np.frombuffer(blob, dtype=np.float64, count=n, offset=off).copy()
        out.weights = np.frombuffer(blob, dtype=np.float64, count=n,
                                    offset=off + n * 8).copy()
        out.total_weight = float(out.weights.sum())
        out._min = mn
        out._max = mx
        return out
