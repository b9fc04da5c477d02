"""Joins.

The reference has no joins (SURVEY.md §2.7); a corpus engine still needs
two: broadcast semi-join (``membership.bloom_semi_join`` — no shuffle) and a
partitioned hash join for two large sides. ``bucketed_inner_join`` is the
portable explicit pattern from the Ray guide: both sides get a deterministic
``bucket = hash(key) % B`` column, co-grouped per bucket, joined pairwise
with pandas inside ``map_groups``. Salt hot keys by raising B.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..stages.partitioning import add_hash_bucket


def bucketed_inner_join(ds_left, ds_right, key: str, *,
                        num_buckets: int = 32,
                        suffixes: tuple = ("_l", "_r")):
    """Inner join of two Datasets on ``key`` via explicit hash buckets.

    Returns a Dataset. Both sides are tagged, unioned (schema-aligned with
    nulls), co-grouped by bucket, and merged per bucket — each bucket's data
    is the only thing co-located, so memory per task is corpus/B.
    """
    left = add_hash_bucket(ds_left, key, num_buckets)
    right = add_hash_bucket(ds_right, key, num_buckets)

    left_cols = [c for c in ds_left.schema().names]
    right_cols = [c for c in ds_right.schema().names]

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("__side", pa.array([side] * len(batch),
                                                          type=pa.int8()))
        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lo = group[group["__side"] == 0][left_cols]
        hi = group[group["__side"] == 1][right_cols]
        if len(lo) == 0 or len(hi) == 0:
            merged = pd.merge(lo.head(0), hi.head(0), on=key,
                              suffixes=suffixes)
            return merged
        return pd.merge(lo, hi, on=key, suffixes=suffixes)

    return both.groupby("bucket").map_groups(join_bucket,
                                             batch_format="pandas")
