"""Windowed aggregates over the events stream table.

Ray Data is a batch engine with no event-time watermarks; windows are
expressed as (SURVEY.md §2.7 / ray guide "streaming-shaped workloads"):

- tumbling windows: a vectorized bucket column + grouped aggregate — the
  shuffle moves per-batch pre-aggregated (key, bucket) partials only;
- session windows: ``groupby(key).map_groups`` over ts-sorted groups
  (ordering assumption: all events of one key fit one group — they are
  co-partitioned by the groupby; skewed users would need a two-level
  day-split first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window_agg(events_ds, *, window_minutes: int = 60,
                        key_column: str = "event_type",
                        ts_column: str = "ts",
                        value_column: str = "value") -> pd.DataFrame:
    """Per (key, tumbling window): exact count and sum.

    Vectorized bucketing inside map_batches (epoch-floor arithmetic), then a
    pre-aggregated combiner so the groupby shuffles one row per
    (key, window) per batch.
    """
    from ray.data.aggregate import Sum

    window_us = np.int64(window_minutes * 60 * 1_000_000)

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch[ts_column]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (micros // window_us) * window_us
        tbl = pa.table({
            key_column: batch[key_column],
            "window_start": pa.array(bucket).cast(pa.timestamp("us")),
            value_column: batch[value_column],
        })
        # combiner: aggregate within the batch before the shuffle
        return tbl.group_by([key_column, "window_start"]).aggregate(
            [(value_column, "sum"), ([], "count_all")]
        ).rename_columns([key_column, "window_start", "value_sum", "n_events"])

    partial = events_ds.map_batches(bucketize, batch_format="pyarrow")
    out = partial.groupby([key_column, "window_start"]).aggregate(
        Sum("value_sum", alias_name="value_sum"),
        Sum("n_events", alias_name="n_events"),
    )
    df = out.to_pandas()
    if len(df) == 0:  # empty input: Ray returns a column-less frame
        return _empty_window_frame(key_column)
    return df.sort_values([key_column, "window_start"]).reset_index(drop=True)


def _empty_window_frame(key_column: str) -> pd.DataFrame:
    return pd.DataFrame({
        key_column: pd.Series([], dtype="object"),
        "window_start": pd.Series([], dtype="datetime64[us]"),
        "value_sum": pd.Series([], dtype="float64"),
        "n_events": pd.Series([], dtype="int64"),
    })


def sliding_window_agg(events_ds, *, window_minutes: int = 60,
                       slide_minutes: int = 15,
                       key_column: str = "event_type",
                       ts_column: str = "ts",
                       value_column: str = "value") -> pd.DataFrame:
    """Per (key, sliding window) exact count/sum; window length must be a
    multiple of the slide. Each event is replicated into its
    window/slide containing windows inside map_batches (vectorized repeat),
    then the tumbling combiner + grouped sum runs unchanged."""
    from ray.data.aggregate import Sum

    if window_minutes % slide_minutes:
        raise ValueError("window_minutes must be a multiple of slide_minutes")
    k = window_minutes // slide_minutes
    slide_us = np.int64(slide_minutes * 60 * 1_000_000)

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_column]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (micros // slide_us) * slide_us
        n = len(micros)
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype=np.int64) * slide_us, n))
        keys = batch[key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = batch[value_column]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        tbl = pa.table({
            key_column: keys.take(idx),
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            value_column: vals.take(idx),
        })
        return tbl.group_by([key_column, "window_start"]).aggregate(
            [(value_column, "sum"), ([], "count_all")]
        ).rename_columns([key_column, "window_start", "value_sum", "n_events"])

    partial = events_ds.map_batches(explode, batch_format="pyarrow")
    out = partial.groupby([key_column, "window_start"]).aggregate(
        Sum("value_sum", alias_name="value_sum"),
        Sum("n_events", alias_name="n_events"),
    )
    df = out.to_pandas()
    if len(df) == 0:
        return _empty_window_frame(key_column)
    return df.sort_values([key_column, "window_start"]).reset_index(drop=True)


def session_window_stats(events_ds, *, gap_minutes: int = 30,
                         key_column: str = "user_id",
                         ts_column: str = "ts") -> pd.DataFrame:
    """Per key: number of session windows (gap > gap_minutes starts a new
    session) and the longest session length in events.

    Ordering assumption: each key's events are co-located by the groupby and
    sorted inside the group — correct for any key whose events fit one group.
    """
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        ts = group[ts_column].astype("int64").sort_values().to_numpy()
        if len(ts) == 0:
            return pd.DataFrame({key_column: [], "n_sessions": [],
                                 "max_session_events": []})
        new_session = np.r_[True, np.diff(ts) > gap_us]
        session_ids = np.cumsum(new_session)
        counts = np.bincount(session_ids)[1:]
        return pd.DataFrame({
            key_column: [group[key_column].iloc[0]],
            "n_sessions": [int(session_ids[-1])],
            "max_session_events": [int(counts.max())],
        })

    out = events_ds.groupby(key_column).map_groups(
        per_key, batch_format="pandas")
    df = out.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({
            key_column: pd.Series([], dtype="object"),
            "n_sessions": pd.Series([], dtype="int64"),
            "max_session_events": pd.Series([], dtype="int64"),
        })
    return df.sort_values(key_column).reset_index(drop=True)
