"""Event-sequence operators: pandas-window parity across block layouts,
tied timestamps, null values/keys, single-event users."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.sequences import (
    event_transition_counts,
    rolling_mean_by_key,
)


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _events(n=400, n_users=7, seed=0, with_nulls=False):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n), unit="m"),  # many ties
        "user_id": rng.integers(0, n_users, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.uniform(0, 100, n),
    })
    if with_nulls:
        df.loc[df.index % 5 == 0, "value"] = np.nan
    return df


def _ds(df, n_blocks=3):
    import ray.data

    return ray.data.from_pandas(df).repartition(n_blocks)


def test_transitions_match_pandas(_ray):
    df = _events()
    got = event_transition_counts(_ds(df))
    s = df.sort_values(["user_id", "ts", "event_id"])
    s["prev"] = s.groupby("user_id")["event_type"].shift()
    want = (s.dropna(subset=["prev"])
            .groupby(["prev", "event_type"]).size())
    got_map = {(a, b): c for a, b, c in
               zip(got["from_type"], got["to_type"], got["cnt"])}
    assert got_map == dict(want.items())


def test_rolling_mean_matches_pandas(_ray):
    df = _events(with_nulls=True)
    got = (rolling_mean_by_key(_ds(df), window=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    want = (s.groupby("user_id")["value"]
            .transform(lambda v: v.rolling(4, min_periods=1).mean()))
    want_by_id = dict(zip(s["event_id"], want))
    for eid, rm in zip(got["event_id"], got["rolling_mean"]):
        w = want_by_id[eid]
        if np.isnan(w):
            assert np.isnan(rm)
        else:
            assert rm == pytest.approx(w, rel=1e-12)


def test_single_event_users_and_empty(_ray):
    df = pd.DataFrame({
        "event_id": [1, 2],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
        "user_id": [1, 2],
        "event_type": ["a", "b"],
        "value": [1.0, 2.0],
    })
    assert len(event_transition_counts(_ds(df, 1))) == 0
    rm = rolling_mean_by_key(_ds(df, 1), window=4).to_pandas()
    assert sorted(rm["rolling_mean"]) == [1.0, 2.0]

    empty = df.iloc[:0]
    assert len(event_transition_counts(_ds(empty, 1))) == 0


def test_null_event_types_dropped_before_pairing(_ray):
    # review fix: [a, NULL, b] must yield the a->b transition (null-type
    # rows drop BEFORE pairing, same as the oracle's WHERE filter) —
    # pandas' groupby used to silently drop (a, NULL) pairs instead
    import pyarrow as pa
    import ray.data

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["a", None, "b"]),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    got = event_transition_counts(ray.data.from_arrow(tbl))
    assert len(got) == 1
    assert (got.iloc[0]["from_type"], got.iloc[0]["to_type"],
            got.iloc[0]["cnt"]) == ("a", "b", 1)


def test_null_keys_dropped(_ray):
    import pyarrow as pa
    import ray.data

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "user_id": pa.array([7, None, 7], pa.int64()),
        "event_type": pa.array(["a", "b", "c"]),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    got = event_transition_counts(ray.data.from_arrow(tbl))
    assert got["cnt"].sum() == 1  # only a->c within user 7
    assert got.iloc[0]["from_type"] == "a" and got.iloc[0]["to_type"] == "c"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 6), st.integers(1, 4), st.integers(10, 60),
       st.integers(0, 10))
def test_rolling_mean_property(_ray, window, n_users, n_events, seed):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n_events),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 8, n_events), unit="m"),
        "user_id": rng.integers(0, n_users, n_events),
        "value": np.where(rng.random(n_events) < 0.2, np.nan,
                          rng.uniform(-50, 50, n_events)),
    })
    got = (rolling_mean_by_key(_ds(df, 2), window=window).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    want = (s.groupby("user_id")["value"]
            .transform(lambda v: v.rolling(window, min_periods=1).mean()))
    want_by_id = dict(zip(s["event_id"], want))
    assert len(got) == n_events
    for eid, rm in zip(got["event_id"], got["rolling_mean"]):
        w = want_by_id[eid]
        if np.isnan(w):
            assert np.isnan(rm), (eid, rm, w)
        else:
            assert rm == pytest.approx(w, rel=1e-12), (eid, rm, w)
