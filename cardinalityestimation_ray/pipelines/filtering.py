"""Quantile-threshold filtering: keep rows whose numeric column lands
inside a globally-computed quantile band — the standard "drop the shortest
X% / longest Y% of documents" pretraining-corpus filter.

Two streaming passes, like :func:`..pipelines.frequency.heavy_hitters`:

1. exact global quantiles via the distributed VALUE-COUNT aggregate
   (:func:`..pipelines.quantiles.exact_quantiles_by_key`) — only the
   distinct-value table reaches the driver, never rows;
2. a stateless ``map_batches`` filter against the two broadcast scalar
   thresholds (closure capture — bytes, not a shuffle).

Thresholds use SQL ``quantile_disc`` semantics (smallest value whose
cumulative count reaches ``ceil(q*n)``), so the band edges are actual data
values and the result is oracle-checkable with zero tolerance.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .quantiles import exact_quantiles_by_key


def column_quantile_band(ds, column: str, *, q_low: float | None = None,
                         q_high: float | None = None) -> tuple:
    """Compute the (low, high) ``quantile_disc`` thresholds for a column.

    Either bound may be None (unbounded). Returns (low, high) as Python
    scalars of the column's type, or (None, None) on an empty dataset.
    """
    qs = [q for q in (q_low, q_high) if q is not None]
    if not qs:
        return (None, None)
    res = exact_quantiles_by_key(ds, column, qs=qs)
    if res["n"].iloc[0] == 0:
        return (None, None)
    by_q = dict(zip(res["q"], res["value"]))
    low = by_q[q_low] if q_low is not None else None
    high = by_q[q_high] if q_high is not None else None
    return (low, high)


def filter_by_column_quantile(ds, column: str, *, q_low: float | None = None,
                              q_high: float | None = None):
    """Keep rows with ``quantile_disc(q_low) <= ds[column] <=
    quantile_disc(q_high)`` (either bound optional).

    ``ds`` is consumed twice (quantile pass + filter pass); pass a
    re-readable dataset (a parquet read — the normal case) rather than a
    materialized one you mutate. Returns a lazy filtered Dataset.
    """
    low, high = column_quantile_band(ds, column, q_low=q_low, q_high=q_high)

    def keep(batch: pa.Table) -> pa.Table:
        col = batch[column]
        mask = None
        if low is not None:
            mask = pc.greater_equal(col, pa.scalar(low))
        if high is not None:
            hi = pc.less_equal(col, pa.scalar(high))
            mask = hi if mask is None else pc.and_kleene(mask, hi)
        if mask is None:
            return batch
        # null values never pass a band filter (SQL WHERE semantics)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(keep, batch_format="pyarrow")
