"""Distributed uniform sampling via the mergeable bottom-k reservoir sketch.

The reservoir is just another mergeable sketch (sketches/reservoir.py), so
the global sample falls out of the same partial/combiner-tree scaffold the
HLL pipelines use: per-batch partial reservoirs -> two-level merge_block
tree -> one k-row sample on the driver. No shuffle, no corpus
materialization; every moved row is one of the <= k survivors of its block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sketches.reservoir import ReservoirSample
from ..stages.sketch_stages import GenericSketchPartials, tree_merge_partials


def reservoir_sample_column(ds, column: str, *, k: int = 1024,
                            explode_list: bool = False
                            ) -> tuple[ReservoirSample, int]:
    """Uniform k-sample of a numeric column (optionally exploding a list
    column). Returns (merged reservoir, total rows seen)."""
    partials = ds.map_batches(
        GenericSketchPartials("reservoir", {"k": k}, column,
                              explode_list=explode_list),
        batch_format="pyarrow",
    )
    rs, total = tree_merge_partials(partials, "reservoir")
    if rs is None:
        rs = ReservoirSample(k=k)
    return rs, total


def reservoir_sample_summary(ds, column: str, *, k: int = 1024,
                             explode_list: bool = False) -> pd.DataFrame:
    """Driver-facing summary row: population size, sample size, and sample
    bounds (the sample itself is random; the summary shape is stable)."""
    rs, total = reservoir_sample_column(ds, column, k=k,
                                       explode_list=explode_list)
    samp = rs.sample()
    return pd.DataFrame({
        "n_total": [int(total)],
        "n_sample": [int(len(samp))],
        "k": [int(k)],
        "sample_min": [float(samp.min()) if len(samp) else float("nan")],
        "sample_max": [float(samp.max()) if len(samp) else float("nan")],
    })
