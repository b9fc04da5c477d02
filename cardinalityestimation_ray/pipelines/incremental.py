"""Incremental sketch maintenance — the mergeability payoff.

Sketches are unions, so corpus appends (a new day of crawl shards) update
results WITHOUT rescanning history: load the prior keyed sketch table,
sketch only the new data, merge, write back atomically. Combined with the
per-partition checkpoint store this gives end-to-end incremental +
resumable distinct counting (reference EP3 serialize/merge lifecycle,
SURVEY.md §3, as an operational loop)."""

from __future__ import annotations

import os

import pandas as pd

from ..sketches import hashing
from ..sources.io import read_sketch_results, write_sketch_results
from ..stages.sketch_stages import HllTokenPartials, tree_merge_keyed_partials


def incremental_distinct_update(results_path: str, new_tokens_ds, *,
                                key_column: str = "source", b: int = 14,
                                hash_name: str = hashing.DEFAULT_HASH,
                                value_column: str = "tokens",
                                explode_list: bool = True) -> pd.DataFrame:
    """Merge new data into a persisted keyed sketch table.

    ``value_column``/``explode_list`` select what is counted: the default
    explodes the tokens list (distinct tokens per key); pass a scalar
    column with ``explode_list=False`` for e.g. distinct doc_ids per key.

    Returns the updated summary (key, estimate, n_added). The write is
    atomic (tmp + rename), so a crashed update leaves the previous table
    intact and rerunning is safe (the new data's partials are recomputed,
    not double-merged).
    """
    prior = (read_sketch_results(results_path, key_name=key_column,
                                 hash_name=hash_name)
             if os.path.exists(results_path) else {})
    if explode_list:
        stage = HllTokenPartials(b=b, token_column=value_column,
                                 key_column=key_column, hash_name=hash_name)
    else:
        from ..stages.sketch_stages import HllColumnPartials

        stage = HllColumnPartials(value_column, b=b, key_column=key_column,
                                  hash_name=hash_name)
    partials = new_tokens_ds.map_batches(stage, batch_format="pyarrow")
    fresh = tree_merge_keyed_partials(partials, key_column,
                                      hash_name=hash_name)
    merged: dict = {}
    for k in set(prior) | set(fresh):
        if k in prior and k in fresh:
            sk = prior[k][0].merge(fresh[k][0])
            merged[k] = (sk, prior[k][1] + fresh[k][1])
        else:
            merged[k] = prior.get(k) or fresh[k]
    write_sketch_results(merged, results_path, kind="hll",
                         key_name=key_column)
    keys = sorted(merged)
    if not keys:  # typed empty (pandas would default to float64)
        return pd.DataFrame({
            key_column: pd.Series([], dtype="object"),
            "distinct_tokens": pd.Series([], dtype="int64"),
            "total_tokens": pd.Series([], dtype="int64"),
        })
    return pd.DataFrame({
        key_column: keys,
        "distinct_tokens": [merged[k][0].estimate() for k in keys],
        "total_tokens": [merged[k][1] for k in keys],
    })
