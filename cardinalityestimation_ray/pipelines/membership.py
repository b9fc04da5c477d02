"""Membership pipelines: distributed Bloom filter build + broadcast probe.

Two roles at scale:
1. Build a corpus-wide token/doc filter (partial per batch, OR-merge tree).
2. Broadcast the built filter (``ray.put`` once) into a ``map_batches``
   filter stage — the semi/anti-join pattern without any shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.bloom import BloomFilter
from ..stages.sketch_stages import GenericSketchPartials, tree_merge_partials


def build_token_bloom(tokens_ds, *, num_bits: int = 1 << 22, num_hashes: int = 7,
                      token_column: str = "tokens") -> tuple[BloomFilter, int]:
    """Distributed Bloom build over the exploded token column."""
    partials = tokens_ds.map_batches(
        GenericSketchPartials(
            "bloom", {"num_bits": num_bits, "num_hashes": num_hashes},
            token_column, explode_list=True),
        batch_format="pyarrow",
    )
    bf, total = tree_merge_partials(partials, "bloom")
    if bf is None:
        bf = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
    return bf, total


def probe_token_membership(tokens_ds, probe_tokens: np.ndarray,
                           **build_kwargs) -> pd.DataFrame:
    """Bloom membership verdicts for probe token ids.

    ``member=False`` is certain (zero false negatives); ``member=True`` is
    probabilistic with the configured FPR.
    """
    bf, total = build_token_bloom(tokens_ds, **build_kwargs)
    probes = np.asarray(probe_tokens, dtype=np.int32)
    return pd.DataFrame({
        "token": probes,
        "member": bf.contains_values(probes),
        "fill_ratio": bf.fill_ratio,
    })


def bloom_semi_join(ds, filter_blob_ref, column: str, *, negate: bool = False):
    """Filter ``ds`` to rows whose ``column`` value is (not) in the broadcast
    Bloom filter. ``filter_blob_ref`` is a ``ray.put`` ObjectRef of
    ``BloomFilter.to_bytes()`` — shipped to each task once, not per batch.
    """
    import ray

    class Probe:
        def __init__(self):
            blob = ray.get(filter_blob_ref)
            self.bf = BloomFilter.from_bytes(blob)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[column]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mask = self.bf.contains_values(col.to_numpy(zero_copy_only=False))
            if negate:
                mask = ~mask
            return batch.filter(pa.array(mask))

    return ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 8))
