"""Quantile pipelines: t-digest and KLL over a numeric column, global or
per key. Approximate (published rank-error bounds); estimates are asserted
against exact quantiles in tests, and rows-only checked by the driver."""

from __future__ import annotations

import pandas as pd

from ..stages.sketch_stages import (
    GenericSketchPartials,
    tree_merge_keyed_partials_generic,
    tree_merge_partials,
)

_DEFAULT_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def column_quantiles(ds, column: str, *, kind: str = "tdigest",
                     params: dict | None = None,
                     qs=_DEFAULT_QS) -> pd.DataFrame:
    """Global approximate quantiles of ``column`` via t-digest (default) or KLL."""
    if params is None:
        params = {"delta": 200} if kind == "tdigest" else {"k": 200}
    partials = ds.map_batches(
        GenericSketchPartials(kind, params, column), batch_format="pyarrow")
    sk, total = tree_merge_partials(partials, kind)
    if sk is None:
        return pd.DataFrame({"q": list(qs), "value": [float("nan")] * len(qs)})
    return pd.DataFrame({
        "q": list(qs),
        "value": [sk.quantile(float(q)) for q in qs],
        "n": [total] * len(qs),
    })


def column_quantiles_by_key(ds, column: str, key_column: str, *,
                            kind: str = "tdigest", params: dict | None = None,
                            qs=_DEFAULT_QS) -> pd.DataFrame:
    """Per-key approximate quantiles (low-cardinality keys; combiner tree)."""
    if params is None:
        params = {"delta": 200} if kind == "tdigest" else {"k": 200}
    partials = ds.map_batches(
        GenericSketchPartials(kind, params, column, key_column=key_column),
        batch_format="pyarrow")
    merged = tree_merge_keyed_partials_generic(partials, key_column, kind)
    rows = []
    for key in sorted(merged):
        sk, n = merged[key]
        for q in qs:
            rows.append({key_column: key, "q": q,
                         "value": sk.quantile(float(q)), "n": n})
    return pd.DataFrame(rows)
