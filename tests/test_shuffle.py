"""Deterministic shuffle: permutation validity, seed sensitivity,
reproducibility across block layouts, shard balance, contract errors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.shuffle import (
    KNUTH_A,
    deterministic_shuffle,
    shuffle_key,
)


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _ds(ids, n_blocks=1):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _reference(ids, seed, n_shards):
    keys = ((np.asarray(ids, np.int64) + seed) * KNUTH_A) % (1 << 31)
    order = np.lexsort((ids, keys))
    pos = np.empty(len(ids), np.int64)
    pos[order] = np.arange(len(ids))
    return pos, pos % n_shards


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_matches_reference_and_is_permutation(_ray, n_blocks):
    ids = np.arange(0, 3000, 3)  # sparse id space
    got = (deterministic_shuffle(_ds(ids, n_blocks), seed=13, n_shards=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want_pos, want_shard = _reference(ids, 13, 4)
    assert got["shuffle_pos"].tolist() == want_pos.tolist()
    assert got["shard"].tolist() == want_shard.tolist()
    assert sorted(got["shuffle_pos"]) == list(range(len(ids)))


def test_seed_changes_permutation_but_not_set(_ray):
    ids = np.arange(500)
    a = (deterministic_shuffle(_ds(ids), seed=1).to_pandas()
         .sort_values("doc_id")["shuffle_pos"].to_numpy())
    b = (deterministic_shuffle(_ds(ids), seed=2).to_pandas()
         .sort_values("doc_id")["shuffle_pos"].to_numpy())
    assert sorted(a) == sorted(b) == list(range(500))
    assert not np.array_equal(a, b)


def test_shard_balance(_ray):
    got = deterministic_shuffle(_ds(np.arange(1000)), seed=0,
                                n_shards=8).to_pandas()
    counts = got["shard"].value_counts()
    assert counts.min() == counts.max() == 125


def test_id_range_contract():
    with pytest.raises(ValueError, match="2\\^31"):
        shuffle_key(np.array([1 << 31]), 0)
    with pytest.raises(ValueError, match="2\\^31"):
        shuffle_key(np.array([-1]), 0)
    with pytest.raises(ValueError, match="2\\^31"):
        shuffle_key(np.array([(1 << 31) - 1]), 1)  # id + seed overflows


def test_bad_n_shards(_ray):
    with pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(_ds(np.arange(4)), n_shards=0)


def test_empty_and_null_ids(_ray):
    import pyarrow as pa
    import ray.data

    empty = deterministic_shuffle(
        ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    ).to_pandas()
    assert len(empty) == 0

    with_nulls = deterministic_shuffle(
        ray.data.from_arrow(pa.table({"doc_id": pa.array([1, None, 2],
                                                         pa.int64())}))
    ).to_pandas()
    assert sorted(with_nulls["doc_id"]) == [1, 2]
    assert sorted(with_nulls["shuffle_pos"]) == [0, 1]


def test_duplicate_ids_raise(_ray):
    """Duplicate ids would make shuffle_pos nondeterministic between the
    copies; the rank pass must detect them (equal ids co-locate in one
    prefix-sum bucket) and raise instead of silently picking an order."""
    import ray

    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match="duplicate|more than once"):
        deterministic_shuffle(_ds(np.array([1, 2, 3, 2]))).to_pandas()
