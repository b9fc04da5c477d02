"""PMI collocations + histogram: parity with Python references across
block layouts, min-count pruning, degenerate inputs."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.association import (
    bigram_counts,
    pmi_top_pairs,
)
from cardinalityestimation_ray.pipelines.stats import column_histogram


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _docs_ds(texts, n_blocks=1):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts}))
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


TEXTS = [
    "new york new york city",
    "york new york is big",
    "the city is big the city",
    "new day new day",
]


def _ref_bigrams(texts):
    c = Counter()
    for x in texts:
        toks = x.split()
        c.update(zip(toks, toks[1:]))
    return c


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_bigram_counts(_ray, n_blocks):
    got = bigram_counts(_docs_ds(TEXTS, n_blocks))
    want = _ref_bigrams(TEXTS)
    assert {(a, b): c for a, b, c in
            zip(got["a"], got["b"], got["cnt"])} == want


def test_pmi_matches_reference(_ray):
    got = pmi_top_pairs(_docs_ds(TEXTS), k=5, min_count=2)
    uni = Counter(t for x in TEXTS for t in x.split())
    bg = _ref_bigrams(TEXTS)
    n_uni, n_bg = sum(uni.values()), sum(bg.values())
    scored = sorted(
        ((math.floor(math.log((c / n_bg) / ((uni[a] / n_uni)
                                            * (uni[b] / n_uni))) * 1e9),
          a, b, c) for (a, b), c in bg.items() if c >= 2),
        key=lambda r: (-r[0], r[1], r[2]))[:5]
    want = sorted((a, b) for _, a, b, _ in scored)
    assert list(zip(got["a"], got["b"])) == want
    for _, row in got.iterrows():
        ref = math.log((row["c_ab"] / n_bg)
                       / ((row["c_a"] / n_uni) * (row["c_b"] / n_uni)))
        assert row["pmi"] == pytest.approx(ref)


def test_min_count_prunes(_ray):
    got = pmi_top_pairs(_docs_ds(TEXTS), k=50, min_count=3)
    assert (got["c_ab"] >= 3).all()


def test_empty(_ray):
    got = pmi_top_pairs(_docs_ds(["", "  "]), k=5)
    assert len(got) == 0


def test_histogram_matches_numpy(_ray):
    import ray.data

    rng = np.random.default_rng(3)
    v = rng.uniform(-10, 110, 5000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": v})).repartition(4)
    got = column_histogram(ds, "v", lo=0.0, hi=100.0, n_bins=10)
    bins = np.clip(np.floor((v - 0.0) / 10.0), 0, 9).astype(int)
    want = np.bincount(bins, minlength=10)
    assert got["cnt"].sum() == 5000
    for b, c in zip(got["bin"], got["cnt"]):
        assert want[b] == c
    np.testing.assert_allclose(got["bin_lo"], got["bin"] * 10.0)


def test_histogram_null_and_empty(_ray):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array([1.0, None, 99.0], pa.float64())}))
    got = column_histogram(ds, "v", lo=0.0, hi=100.0, n_bins=4)
    assert got["cnt"].sum() == 2

    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert len(column_histogram(empty, "v", lo=0, hi=1, n_bins=2)) == 0

    with pytest.raises(ValueError):
        column_histogram(ds, "v", lo=0.0, hi=0.0, n_bins=4)
    with pytest.raises(ValueError):
        column_histogram(ds, "v", lo=0.0, hi=1.0, n_bins=0)


def test_histogram_nan_values_dropped(_ray):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array([1.0, float("nan"), 50.0], pa.float64())}))
    got = column_histogram(ds, "v", lo=0.0, hi=100.0, n_bins=4)
    assert got["cnt"].sum() == 2


def test_grouped_histogram_matches_numpy(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.stats import (
        column_histogram_by_key,
    )

    rng = np.random.default_rng(9)
    v = rng.uniform(-5, 105, 3000)
    k = rng.choice(["a", "b", "c"], 3000)
    ds = ray.data.from_pandas(pd.DataFrame({"k": k, "v": v})).repartition(4)
    got = column_histogram_by_key(ds, "v", "k", lo=0.0, hi=100.0, n_bins=5)
    assert got["cnt"].sum() == 3000
    bins = np.clip(np.floor(v / 20.0), 0, 4).astype(int)
    for key in "abc":
        want = np.bincount(bins[k == key], minlength=5)
        sub = got[got["k"] == key]
        for b, c in zip(sub["bin"], sub["cnt"]):
            assert want[b] == c
        assert sub["cnt"].sum() == want.sum()
