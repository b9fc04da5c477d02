"""Grouped ranking: exact top-k rows per group.

The windowed `row_number() OVER (PARTITION BY g ORDER BY v DESC)` pattern,
Ray-Data-first: a per-batch COMBINER keeps each group's local top-k with one
segmented lexsort (any global top-k row survives its own batch's top-k, so
the prune is lossless), then groups hash-bucket and each bucket runs the
SAME vectorized pass once — the shuffle carries at most k rows per group
per batch, never the full table, and no per-group Python dispatch ever
happens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _desc_key(values: np.ndarray) -> np.ndarray:
    """Dtype-safe descending sort key: negate the DENSE RANK, not the
    value — ``-values`` wraps for unsigned dtypes (0 would rank as the
    largest) and overflows at INT64_MIN, and fails outright for datetimes
    (round-3 review fix).

    NULL values (NaN / NaT / None in object columns) rank AFTER every real
    value — SQL ``ORDER BY v DESC`` defaults to NULLS LAST, while
    ``np.unique`` sorts NaN/NaT last so the bare negated rank would have
    ranked them FIRST and a null-value row would have beaten every real
    top-k candidate (round-4 adversarial-sweep fix; session-9 review:
    object-dtype None crashed np.unique's sort outright)."""
    null = None
    if values.dtype.kind == "f":
        null = np.isnan(values)
    elif values.dtype.kind in "mM":
        null = np.isnat(values)
    elif values.dtype.kind == "O":
        # Arrow nulls in string columns surface as None (or pandas NA/NaN)
        # in object arrays, and np.unique cannot compare them with str —
        # substitute a sentinel for ranking, then force NULLS LAST below
        null = np.asarray(pd.isna(values))
        if null.any():
            values = values.copy()
            values[null] = ""
    _, inverse = np.unique(values, return_inverse=True)
    key = -inverse.astype(np.int64)
    if null is not None and null.any():
        key[null] = np.iinfo(np.int64).max
    return key


def _segmented_topk_indices(group_codes: np.ndarray, values: np.ndarray,
                            ties: np.ndarray, k: int) -> np.ndarray:
    """Row indices of the per-group top-k (value desc, tie asc), vectorized:
    one lexsort + a rank-within-segment subtraction."""
    order = np.lexsort((ties, _desc_key(values), group_codes))
    g = group_codes[order]
    starts = np.r_[0, np.flatnonzero(np.diff(g)) + 1]
    seg_id = np.cumsum(np.r_[False, np.diff(g) != 0])
    rank = np.arange(len(g)) - starts[seg_id]
    return order[rank < k]


def topk_per_group(ds, group_col: str, value_col: str, k: int, *,
                   tie_col: str, num_buckets: int = 64):
    """Exact top-k rows per group, deterministic under ties (value
    descending, then ``tie_col`` ascending — pass a unique id).

    Returns a Dataset of the kept rows (original columns).
    """
    from ..stages.partitioning import add_hash_bucket

    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = batch[group_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # null group keys are EXCLUDED (SQL GROUP BY semantics, matching the
        # keyed sketch / session-window stages; round-3 review fix — the
        # old path ran NaN.astype(int64) on them, an undefined code)
        if keys.null_count:
            valid = pc.is_valid(keys)
            batch = batch.filter(valid)
            keys = keys.filter(valid)
        if len(batch) == 0:
            return batch
        codes = keys.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        values = batch[value_col].to_numpy(zero_copy_only=False)
        ties = batch[tie_col].to_numpy(zero_copy_only=False)
        keep = _segmented_topk_indices(codes, values, ties, k)
        return batch.take(pa.array(np.sort(keep)))

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return group.drop(columns=["bucket"])
        codes, _ = pd.factorize(group[group_col])
        keep = _segmented_topk_indices(
            codes.astype(np.int64),
            group[value_col].to_numpy(),
            group[tie_col].to_numpy(), k)
        return group.iloc[np.sort(keep)].drop(columns=["bucket"])

    pruned = ds.map_batches(local_topk, batch_format="pyarrow")
    bucketed = add_hash_bucket(pruned, group_col, num_buckets)
    return bucketed.groupby("bucket").map_groups(
        bucket_topk, batch_format="pandas")
