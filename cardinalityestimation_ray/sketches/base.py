"""Sketch ABC + registry.

Every sketch kind plugs into the same Ray Data scaffold (partial sketch per
batch inside ``map_batches`` → associative merge in a tiny reduce stage) via
this interface, mirroring the reference's user-extension surface
(/root/reference/CardinalityEstimation/ICardinalityEstimator.cs:32-58 and the
pluggable hash delegates at CardinalityEstimator.cs:39-46).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import pyarrow as pa


class Sketch(ABC):
    """A mergeable, serializable sketch over a stream of elements."""

    __slots__ = ()

    #: registry of sketch kinds: name -> class
    REGISTRY: dict[str, type["Sketch"]] = {}

    kind: str = "abstract"

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if getattr(cls, "kind", None) and cls.kind != "abstract":
            Sketch.REGISTRY[cls.kind] = cls

    # --- update -------------------------------------------------------
    @abstractmethod
    def add_values(self, values: np.ndarray) -> None:
        """Vectorized add of a numpy array of elements."""

    @staticmethod
    def _drop_nulls(arr: pa.Array) -> pa.Array:
        """SQL semantics: nulls are not elements (shared by every kind —
        without this, numpy conversion silently turns nulls into counted
        NaNs)."""
        return arr.drop_null() if arr.null_count else arr

    def add_arrow(self, arr: pa.Array | pa.ChunkedArray) -> None:
        """Add an Arrow array — the ONE copy of the string-vs-numeric
        dispatch (round-4 session-9 review: four sketches carried identical
        bodies). String/binary columns hash via the zero-copy buffer path
        with the sketch's own ``hash_name`` (requires ``add_hashes``);
        numeric columns go through ``add_values`` via numpy conversion.
        Nulls are skipped (SQL semantics) in both paths."""
        if isinstance(arr, pa.ChunkedArray):
            for chunk in arr.chunks:
                self.add_arrow(chunk)
            return
        arr = self._drop_nulls(arr)
        t = arr.type
        if pa.types.is_string(t) or pa.types.is_binary(t) or \
                pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            from . import hashing

            self.add_hashes(hashing.hash_arrow_binary(
                arr, getattr(self, "hash_name", hashing.DEFAULT_HASH)))
        else:
            self.add_values(arr.to_numpy(zero_copy_only=False))

    # --- merge / query ------------------------------------------------
    @abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """In-place associative, commutative union merge."""

    # --- wire ---------------------------------------------------------
    @abstractmethod
    def to_bytes(self) -> bytes: ...

    @classmethod
    @abstractmethod
    def from_bytes(cls, blob: bytes) -> "Sketch": ...


def sketch_from_bytes(kind: str, blob: bytes) -> Sketch:
    return Sketch.REGISTRY[kind].from_bytes(blob)
