"""Quantile-band filter: thresholds match quantile_disc, nulls dropped,
one-sided bands, empty input."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.filtering import (
    column_quantile_band,
    filter_by_column_quantile,
)


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _disc(values: np.ndarray, q: float):
    values = np.sort(values)
    rank = max(1, int(np.ceil(q * len(values))))
    return values[rank - 1]


def test_band_matches_quantile_disc(_ray):
    import ray.data

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=2000)
    ds = ray.data.from_pandas(pd.DataFrame({"id": np.arange(len(vals)),
                                            "v": vals}))
    low, high = column_quantile_band(ds, "v", q_low=0.1, q_high=0.9)
    assert low == _disc(vals, 0.1)
    assert high == _disc(vals, 0.9)

    kept = filter_by_column_quantile(ds, "v", q_low=0.1, q_high=0.9
                                     ).to_pandas()
    want = vals[(vals >= low) & (vals <= high)]
    assert len(kept) == len(want)
    assert sorted(kept["v"]) == sorted(want)


def test_one_sided_and_unbounded(_ray):
    import ray.data

    vals = np.arange(100)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    low_only = filter_by_column_quantile(ds, "v", q_low=0.5).to_pandas()
    assert low_only["v"].min() == _disc(vals, 0.5)
    assert len(low_only) == 51  # values 49..99 (disc(0.5) = 49)

    unbounded = filter_by_column_quantile(ds, "v").to_pandas()
    assert len(unbounded) == 100


def test_nulls_never_pass(_ray):
    import pyarrow as pa
    import ray.data

    tbl = pa.table({"v": pa.array([1, None, 2, None, 3], type=pa.int64())})
    ds = ray.data.from_arrow(tbl)
    kept = filter_by_column_quantile(ds, "v", q_low=0.0).to_pandas()
    assert kept["v"].notna().all()
    assert len(kept) == 3


def test_nulls_do_not_inflate_thresholds(_ray):
    # review fix: Arrow's group_by kept nulls as a value group, so rank
    # ceil(q*n) counted null rows and NaN could be picked as the threshold
    import pyarrow as pa
    import ray.data

    tbl = pa.table({"v": pa.array([1, None, 2, None, 3], type=pa.int64())})
    ds = ray.data.from_arrow(tbl)
    low, high = column_quantile_band(ds, "v", q_low=0.5, q_high=0.9)
    assert (low, high) == (2, 3)  # quantile_disc over {1,2,3}, nulls ignored
    kept = filter_by_column_quantile(ds, "v", q_low=0.5,
                                     q_high=0.9).to_pandas()
    assert sorted(kept["v"]) == [2, 3]


def test_empty_dataset(_ray):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], type=pa.int64())}))
    kept = filter_by_column_quantile(ds, "v", q_low=0.2).to_pandas()
    assert len(kept) == 0


def test_percentile_ranks_match_cume_dist(_ray):
    import pyarrow as pa
    import ray.data

    from cardinalityestimation_ray.pipelines.quantiles import (
        percentile_ranks,
    )

    vals = [5, 1, 3, 3, 9, 1, 7]
    ds = ray.data.from_arrow(pa.table({
        "id": list(range(len(vals))),
        "v": pa.array(vals, pa.int64()),
    }))
    got = (percentile_ranks(ds, "v", id_column="id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    n = len(vals)
    want = [sum(1 for w in vals if w <= v) / n for v in vals]
    assert got["cume_dist"].tolist() == want

    with_null = ray.data.from_arrow(pa.table({
        "id": [0, 1, 2], "v": pa.array([1, None, 2], pa.int64())}))
    out = percentile_ranks(with_null, "v", id_column="id").to_pandas()
    assert sorted(out["id"]) == [0, 2]
    assert out["cume_dist"].max() == 1.0
