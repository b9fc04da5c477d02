"""Reproducible float64 summation: the superaccumulator must equal
``math.fsum`` bit-exactly (correctly-rounded true sum) and be invariant
to ANY partitioning/ordering of the input — the property that makes the
embedding aggregates bit-identical across block layouts and parallelism
levels (observed drift: embedding_norm_stats hashed differently at 8 vs
32 CPUs before this primitive)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.functions.detsum import (
    N_LIMBS,
    accumulate_limbs,
    blob_to_limbs,
    detsum_aggregate,
    limbs_to_blobs,
    limbs_to_float,
    normalize_limbs,
    reproducible_sum,
)


def _nasty_arrays():
    rng = np.random.default_rng(7)
    yield rng.normal(size=1000)
    # wildly mixed magnitudes incl. subnormals: naive sums lose everything
    yield rng.normal(size=500) * 10.0 ** rng.integers(-320, 300, 500)
    yield np.array([1e308, -1e308, 1.0, 5e-324, -5e-324, 0.0, -0.0])
    yield np.array([2.0 ** -1074] * 3)  # smallest subnormal, odd count
    yield np.array([])
    yield np.full(100_000, 0.1)


@pytest.mark.parametrize("idx", range(6))
def test_equals_fsum_bitexact(idx):
    x = list(_nasty_arrays())[idx]
    assert reproducible_sum(x) == math.fsum(x)


@pytest.mark.parametrize("idx", range(6))
def test_partition_and_order_invariant(idx):
    x = list(_nasty_arrays())[idx]
    if not x.size:
        return
    rng = np.random.default_rng(idx)
    want = math.fsum(x)
    for _ in range(5):
        xs = x[rng.permutation(x.size)]
        parts = np.array_split(xs, int(rng.integers(1, 9)))
        acc = np.zeros((1, N_LIMBS), dtype=np.int64)
        for p in parts:
            acc = normalize_limbs(acc + accumulate_limbs(p))
        assert limbs_to_float(acc) == want  # bit-exact, not approx


def test_keyed_accumulation():
    rng = np.random.default_rng(3)
    x = rng.normal(size=5000) * 10.0 ** rng.integers(-30, 30, 5000)
    keys = rng.integers(0, 7, 5000)
    limbs = accumulate_limbs(x, keys, 7)
    for k in range(7):
        assert limbs_to_float(limbs[k]) == math.fsum(x[keys == k])


def test_carry_headroom():
    # a million equal values exercises multi-limb carries
    x = np.full(1_000_000, 1.0 + 2.0 ** -50)
    assert reproducible_sum(x) == math.fsum(x)


def test_addat_fallback_path_matches():
    # key space > max(2^22, 8*n) routes through the np.add.at fallback;
    # it must agree bit-exactly with the bincount path and math.fsum
    rng = np.random.default_rng(21)
    n_keys = (1 << 22) // N_LIMBS + 50  # size just over the 2^22 threshold
    x = rng.normal(size=200) * 10.0 ** rng.integers(-50, 50, 200)
    keys = rng.integers(0, n_keys, 200)
    limbs = accumulate_limbs(x, keys, n_keys)
    for k in np.unique(keys):
        assert limbs_to_float(limbs[k]) == math.fsum(x[keys == k])


def test_nonfinite_raises():
    with pytest.raises(ValueError):
        reproducible_sum(np.array([1.0, np.inf]))
    with pytest.raises(ValueError):
        reproducible_sum(np.array([np.nan]))


def test_blob_roundtrip_and_packing():
    rng = np.random.default_rng(1)
    limbs = accumulate_limbs(rng.normal(size=100), rng.integers(0, 6, 100), 6)
    blobs = limbs_to_blobs(limbs)
    assert len(blobs) == 6
    got = np.stack([blob_to_limbs(b)[0] for b in blobs])
    np.testing.assert_array_equal(got, limbs)
    packed = limbs_to_blobs(limbs, rows_per_blob=3)
    assert len(packed) == 2
    np.testing.assert_array_equal(blob_to_limbs(packed[1]), limbs[3:])
    with pytest.raises(ValueError):
        blob_to_limbs(b"\x00" * 12)


def test_detsum_aggregate_on_ray(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    x = rng.normal(size=4000) * 10.0 ** rng.integers(-100, 100, 4000)
    keys = rng.integers(0, 5, 4000)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        uniq, codes = np.unique(batch["k"].to_numpy(), return_inverse=True)
        limbs = accumulate_limbs(batch["v"].to_numpy(), codes, len(uniq))
        return pd.DataFrame({"k": uniq, "limbs": limbs_to_blobs(limbs)})

    results = []
    for n_blocks in (1, 7, 64):
        ds = (ray.data.from_pandas(pd.DataFrame({"v": x, "k": keys}))
              .repartition(n_blocks)
              .map_batches(partials, batch_format="pandas")
              .groupby("k")
              .aggregate(detsum_aggregate("limbs", alias_name="s")))
        df = ds.to_pandas().sort_values("k").reset_index(drop=True)
        results.append(df)
    for df in results[1:]:
        # bit-identical across block layouts, not merely close
        assert df["s"].tolist() == results[0]["s"].tolist()
    for k in range(5):
        assert results[0]["s"][k] == math.fsum(x[keys == k])


def test_embedding_stats_bit_identical_across_layouts(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.embeddings import (
        label_centroids,
        norm_stats_by_label,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "embedding": [list(map(float, v))
                      for v in rng.normal(size=(600, 16))],
        "label": rng.integers(0, 4, 600),
    })
    frames_n, frames_c = [], []
    for n_blocks in (1, 5, 48):
        ds = ray.data.from_pandas(df).repartition(n_blocks)
        frames_n.append(norm_stats_by_label(ds))
        frames_c.append(label_centroids(ds))
    for f in frames_n[1:]:
        pd.testing.assert_frame_equal(f, frames_n[0])  # exact, rtol=0
        assert f["avg_norm"].tolist() == frames_n[0]["avg_norm"].tolist()
    for f in frames_c[1:]:
        assert f["centroid"].tolist() == frames_c[0]["centroid"].tolist()


def test_window_sums_bit_identical_across_layouts(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.windows import (
        sliding_window_agg,
        tumbling_window_agg,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], 2000),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86_400, 2000), unit="s"),
        # mixed magnitudes: a naive float Sum would drift across layouts
        "value": rng.normal(size=2000) * 10.0 ** rng.integers(-6, 7, 2000),
    })
    frames_t, frames_s = [], []
    for n_blocks in (1, 6, 50):
        ds = ray.data.from_pandas(df).repartition(n_blocks)
        frames_t.append(tumbling_window_agg(ds, window_minutes=60))
        frames_s.append(sliding_window_agg(ds, window_minutes=60,
                                           slide_minutes=30))
    for f in frames_t[1:]:
        assert f["value_sum"].tolist() == frames_t[0]["value_sum"].tolist()
    for f in frames_s[1:]:
        assert f["value_sum"].tolist() == frames_s[0]["value_sum"].tolist()
    # and it's the correctly-rounded true sum, not just a stable one
    g = df.assign(w=df["ts"].dt.floor("60min"))
    want = {(k, w): math.fsum(v)
            for (k, w), v in g.groupby(["event_type", "w"])["value"]}
    got = frames_t[0]
    for _, row in got.iterrows():
        assert row["value_sum"] == want[(row["event_type"],
                                         row["window_start"])]
