"""Exact grouped scalar statistics over the tokens corpus (Sum/Min/Max/Count
ride-alongs — the reference's CountAdditions exact-counter generalized,
CardinalityEstimator.cs:321)."""

from __future__ import annotations

import pandas as pd


def ntok_stats_by_source(tokens_ds) -> pd.DataFrame:
    """Per-source exact n_tok statistics (count/sum/min/max)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    out = tokens_ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tok", alias_name="total_tokens"),
        Min("n_tok", alias_name="min_tokens"),
        Max("n_tok", alias_name="max_tokens"),
    )
    df = out.to_pandas()
    if len(df) == 0:  # empty input: Ray returns a column-less frame
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "total_tokens": pd.Series([], dtype="int64"),
            "min_tokens": pd.Series([], dtype="int64"),
            "max_tokens": pd.Series([], dtype="int64"),
        })
    return df.sort_values("source").reset_index(drop=True)
