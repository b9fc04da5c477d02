"""Shared-accumulator sketch actor — the reference's
ConcurrentCardinalityEstimator re-expressed for Ray.

The reference wraps one estimator in a ReaderWriterLockSlim so many threads
can feed it (/root/reference/CardinalityEstimation/
ConcurrentCardinalityEstimator.cs:354-542, 816-913). In Ray, the
share-nothing partial-sketch pattern makes that unnecessary for throughput
(each map task owns a private sketch; SURVEY.md §2.5) — but a shared live
accumulator is still useful for PROGRESS: a long scan can push partials to
one named actor and readers can poll a running estimate mid-job. The actor's
single-threaded mailbox plays the role of the lock; merge commutativity
makes concurrent pushes safe in any order.
"""

from __future__ import annotations

import numpy as np

from ..sketches.base import Sketch


class SharedSketch:
    """Actor body: ``ray.remote(SharedSketch).remote(kind, params)`` or use
    :func:`create_shared_sketch`."""

    def __init__(self, kind: str, params: dict | None = None):
        self.kind = kind
        self.params = dict(params or {})
        self.sketch: Sketch = Sketch.REGISTRY[kind](**self.params)

    def add_values(self, values: np.ndarray) -> int:
        self.sketch.add_values(values)
        return len(values)

    def merge_blob(self, blob: bytes) -> None:
        # Thread the accumulator's own hash label into the rebuild: the HLL
        # v3 wire format carries no hash name (reference parity — see
        # hll.from_bytes), so a bare from_bytes would label the pushed
        # partial with the DEFAULT hash and merge() would reject every
        # legitimate push into a custom-hash accumulator. Consequence: for
        # HLL the accumulator TRUSTS that pushes were built under its hash
        # (the wire cannot say otherwise — same contract as the reference's
        # deserializer); kinds whose blobs DO embed the name
        # (THE2/BLM2/CMS2) still raise on a real mismatch.
        cls = Sketch.REGISTRY[self.kind]
        hname = getattr(self.sketch, "hash_name", None)
        other = cls.from_bytes(blob) if hname is None else \
            cls.from_bytes(blob, hash_name=hname)
        self.sketch.merge(other)

    def estimate(self):
        est = getattr(self.sketch, "estimate", None)
        return est() if est is not None else None

    def count_additions(self) -> int | None:
        return getattr(self.sketch, "count_additions", None)

    def to_bytes(self) -> bytes:
        return self.sketch.to_bytes()

    def reset(self) -> None:
        self.sketch = Sketch.REGISTRY[self.kind](**self.params)


def create_shared_sketch(kind: str, params: dict | None = None, *,
                         name: str | None = None):
    """Create the shared accumulator actor (optionally named for discovery
    from any task via ``ray.get_actor(name)``)."""
    import ray

    cls = ray.remote(SharedSketch)
    if name:
        return cls.options(name=name).remote(kind, params)
    return cls.remote(kind, params)
