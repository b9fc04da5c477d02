"""Round-3 additions: exact value-count quantiles (quantile_disc parity)
and windowed distinct-id sketch aggregation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray_session


def _quantile_disc(values: np.ndarray, q: float):
    """SQL quantile_disc / percentile_disc: smallest value whose cumulative
    count reaches ceil(q*n) (at least 1)."""
    s = np.sort(values)
    rank = max(1, int(np.ceil(q * len(s))))
    return s[rank - 1]


def test_exact_quantiles_global_matches_disc_rule(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.quantiles import (
        exact_quantiles_by_key,
    )

    rng = np.random.default_rng(2)
    vals = rng.integers(0, 50, size=5000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    qs = (0.01, 0.1, 0.5, 0.9, 0.99, 1.0)
    got = exact_quantiles_by_key(ds, "x", qs=qs)
    for q, v, n in zip(got["q"], got["value"], got["n"]):
        assert n == len(vals)
        assert v == _quantile_disc(vals, q)


def test_exact_quantiles_by_key_matches_disc_rule(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.quantiles import (
        exact_quantiles_by_key,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=3000),
        "x": rng.integers(0, 30, size=3000).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    qs = (0.25, 0.5, 0.75)
    got = exact_quantiles_by_key(ds, "x", "k", qs=qs)
    assert list(got.columns) == ["k", "q", "value", "n"]
    for k, sub in df.groupby("k"):
        mine = got[got["k"] == k]
        assert (mine["n"] == len(sub)).all()
        for q, v in zip(mine["q"], mine["value"]):
            assert v == _quantile_disc(sub["x"].to_numpy(), q)


def test_exact_quantiles_empty_and_single(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.quantiles import (
        exact_quantiles_by_key,
    )

    empty = ray.data.from_pandas(
        pd.DataFrame({"x": pd.Series([], dtype="int64")}))
    got = exact_quantiles_by_key(empty, "x", qs=(0.5,))
    assert len(got) == 1 and np.isnan(got["value"].iloc[0])
    one = ray.data.from_pandas(pd.DataFrame({"x": [7]}))
    got = exact_quantiles_by_key(one, "x", qs=(0.0, 0.5, 1.0))
    assert (got["value"] == 7).all() and (got["n"] == 1).all()


def test_windowed_distinct_users_exact_regime(_ray):
    """Theta below cap -> exact; compare against pandas groupby nunique."""
    import ray.data

    from cardinalityestimation_ray.pipelines.windows import (
        tumbling_distinct_agg,
    )

    rng = np.random.default_rng(4)
    n = 4000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_type": rng.choice(["view", "click"], size=n),
        "ts": base + rng.integers(0, 6 * 3600, size=n).astype("timedelta64[s]"),
        "user_id": rng.integers(0, 200, size=n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    got = tumbling_distinct_agg(ds, window_minutes=60)
    win = df["ts"].values.astype("datetime64[h]").astype("datetime64[us]")
    expect = (df.assign(window_start=win)
              .groupby(["event_type", "window_start"])["user_id"]
              .nunique().reset_index(name="distinct_ids")
              .sort_values(["event_type", "window_start"])
              .reset_index(drop=True))
    got = got.copy()
    got["window_start"] = got["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got, expect, check_dtype=False)


def test_windowed_distinct_users_empty(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.windows import (
        tumbling_distinct_agg,
    )

    ds = ray.data.from_pandas(pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "user_id": pd.Series([], dtype="int64"),
    }))
    got = tumbling_distinct_agg(ds, window_minutes=60)
    assert len(got) == 0
    assert list(got.columns) == ["event_type", "window_start", "distinct_ids"]


def test_windowed_distinct_users_hll_kind(_ray):
    """The UDAF surface is sketch-generic: HLL estimates land within the
    published bound for the same windows."""
    import ray.data

    from cardinalityestimation_ray.pipelines.windows import (
        tumbling_distinct_agg,
    )

    rng = np.random.default_rng(5)
    n = 3000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_type": np.repeat("view", n),
        "ts": base + rng.integers(0, 2 * 3600, size=n).astype("timedelta64[s]"),
        "user_id": rng.integers(0, 100_000, size=n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    got = tumbling_distinct_agg(ds, window_minutes=60, kind="hll",
                                params={"b": 14})
    win = df["ts"].values.astype("datetime64[h]").astype("datetime64[us]")
    expect = (df.assign(window_start=win)
              .groupby("window_start")["user_id"].nunique())
    got = got.set_index(got["window_start"].astype("datetime64[us]"))
    for w, exact in expect.items():
        est = int(got.loc[w, "distinct_ids"])
        assert abs(est - exact) <= max(3, 3 * 1.04 / np.sqrt(2 ** 14) * exact)


def test_kll_exact_regime_equals_quantile_disc():
    """With n <= k (no compaction, all weight-1 values) KLL's rank rule —
    first cumulative weight >= q*n — equals SQL quantile_disc / the
    rank-ceil(q*n) order statistic exactly. This is the property the
    ntok_quantiles_by_source oracle twin relies on."""
    import duckdb

    from cardinalityestimation_ray.sketches.kll import KLLSketch

    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        vals = rng.integers(0, 25, n).astype(np.float64)
        sk = KLLSketch(k=256)
        # sharded adds + merge, like the combiner tree
        mid = n // 2
        other = KLLSketch(k=256)
        sk.add_values(vals[:mid])
        other.add_values(vals[mid:])
        sk.merge(other)
        s = np.sort(vals)
        for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
            got = sk.quantile(q)
            rank = max(int(np.ceil(q * n)), 1)
            assert got == s[rank - 1]
            want = duckdb.sql(
                f"SELECT quantile_disc(x, {q}) FROM (SELECT "
                f"unnest({list(vals)}) AS x)").fetchone()[0]
            assert got == want
