"""Merge semantics (FIXTURES.md F3): k-way split == single sketch at register
level, commutativity/associativity, direct-count drop rules, mixed
representations, incompatible-b rejection.

Reference: CardinalityEstimator.cs:615-730 and the merge test families in
CardinalityEstimatorTests.cs:175-189,384-453."""

import numpy as np
import pytest

from cardinalityestimation_ray.sketches.constants import std_error
from cardinalityestimation_ray.sketches.hll import HyperLogLog


def _stream(n, seed=42):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**62, size=n, dtype=np.int64)


@pytest.mark.parametrize("k", [2, 8, 60])
def test_kway_split_register_identical(k):
    vals = _stream(60_000)
    single = HyperLogLog(b=14)
    single.add_values(vals)
    rng = np.random.default_rng(k)
    assign = rng.integers(0, k, size=len(vals))
    parts = []
    for i in range(k):
        p = HyperLogLog(b=14)
        p.add_values(vals[assign == i])
        parts.append(p)
    merged = HyperLogLog.merge_many(parts)
    assert np.array_equal(merged.registers(), single.registers())
    assert merged.count_additions == single.count_additions
    assert merged.estimate() == single.estimate()
    n_unique = len(np.unique(vals))
    assert abs(merged.estimate() / n_unique - 1) <= 10 * std_error(14)


def test_merge_commutative_and_associative():
    a0, b0, c0 = (HyperLogLog(b=12) for _ in range(3))
    a0.add_values(_stream(500, seed=1))
    b0.add_values(_stream(800, seed=2))
    c0.add_values(_stream(50, seed=3))
    ab = a0.copy().merge(b0)
    ba = b0.copy().merge(a0)
    assert ab == ba
    abc1 = ab.copy().merge(c0)
    bc = b0.copy().merge(c0)
    abc2 = a0.copy().merge(bc)
    assert abc1 == abc2


def test_merge_direct_union_stays_exact():
    a = HyperLogLog(b=14)
    a.add_values(np.arange(40, dtype=np.int64))
    b = HyperLogLog(b=14)
    b.add_values(np.arange(20, 80, dtype=np.int64))
    merged = a.copy().merge(b)
    assert merged.direct is not None
    assert merged.estimate() == 80  # exact union


def test_merge_direct_overflow_drops_direct():
    # CardinalityEstimator.cs:668-684: union >100 drops the direct set
    a = HyperLogLog(b=14)
    a.add_values(np.arange(70, dtype=np.int64))
    b = HyperLogLog(b=14)
    b.add_values(np.arange(70, 140, dtype=np.int64))
    merged = a.copy().merge(b)
    assert merged.direct is None
    assert abs(merged.estimate() / 140 - 1) <= 10 * std_error(14)


def test_merge_one_side_without_direct_drops_direct():
    a = HyperLogLog(b=14)
    a.add_values(np.arange(10, dtype=np.int64))
    b = HyperLogLog(b=14, use_direct_counting=False)
    b.add_values(np.arange(5, 15, dtype=np.int64))
    merged = a.copy().merge(b)
    assert merged.direct is None
    other_way = b.copy().merge(a)
    assert other_way.direct is None
    assert np.array_equal(merged.registers(), other_way.registers())


def test_merge_mixed_representations():
    sparse = HyperLogLog(b=14, use_direct_counting=False)
    sparse.add_values(_stream(200, seed=5))
    assert sparse.is_sparse
    dense = HyperLogLog(b=14, use_direct_counting=False)
    dense.add_values(_stream(50_000, seed=6))
    assert not dense.is_sparse

    # sparse x sparse stays sparse below the cap
    s2 = HyperLogLog(b=14, use_direct_counting=False)
    s2.add_values(_stream(150, seed=7))
    ss = sparse.copy().merge(s2)
    assert ss.is_sparse

    # sparse x dense -> dense; order must not matter
    sd = sparse.copy().merge(dense)
    ds = dense.copy().merge(sparse)
    assert not sd.is_sparse and not ds.is_sparse
    assert np.array_equal(sd.registers(), ds.registers())

    # dense x dense
    dd = dense.copy().merge(sd)
    assert not dd.is_sparse


def test_sparse_merge_promotes_on_overflow():
    a = HyperLogLog(b=8, use_direct_counting=False)  # sparse_max = 256//15-10 = 7
    b = HyperLogLog(b=8, use_direct_counting=False)
    a.add_values(np.arange(4, dtype=np.int64))
    b.add_values(np.arange(100, 108, dtype=np.int64))
    assert not b.is_sparse or b.is_sparse  # representation depends on spread
    merged = a.copy().merge(b)
    single = HyperLogLog(b=8, use_direct_counting=False)
    single.add_values(np.r_[np.arange(4), np.arange(100, 108)].astype(np.int64))
    assert np.array_equal(merged.registers(), single.registers())


def test_merge_incompatible_b_raises():
    a = HyperLogLog(b=12)
    b = HyperLogLog(b=14)
    with pytest.raises(ValueError):
        a.merge(b)


def test_merge_incompatible_hash_raises():
    a = HyperLogLog(b=12, hash_name="fnv1a")
    b = HyperLogLog(b=12, hash_name="splitmix64")
    with pytest.raises(ValueError):
        a.merge(b)


def test_merge_many_tolerates_none_and_copies():
    a = HyperLogLog(b=12)
    a.add_values(np.arange(10, dtype=np.int64))
    b = HyperLogLog(b=12)
    b.add_values(np.arange(5, 20, dtype=np.int64))
    a_before = a.copy()
    merged = HyperLogLog.merge_many([None, a, None, b])
    assert merged.estimate() == 20
    assert a == a_before  # inputs not mutated (copy-ctor parity,
    #                        CardinalityEstimatorTests.cs:270-280)
    assert HyperLogLog.merge_many([None, None]) is None


def test_count_additions_sums_on_merge():
    a = HyperLogLog(b=12)
    a.add_values(np.arange(100, dtype=np.int64))
    b = HyperLogLog(b=12)
    b.add_values(np.arange(50, dtype=np.int64))
    merged = a.copy().merge(b)
    assert merged.count_additions == 150


def test_copy_preserves_everything():
    hll = HyperLogLog(b=10)
    hll.add_values(_stream(5000, seed=9))
    cp = hll.copy()
    assert cp == hll
    assert cp.count_additions == hll.count_additions
    cp.add_values(_stream(100, seed=10))
    assert cp != hll  # deep copy: mutation does not leak back


def test_reserve_dense_is_pure_storage_hint():
    """reserve_dense() (keyed-partial fast path) must not change any
    observable state: registers, direct exactness, wire blobs, merges."""
    import numpy as np

    from cardinalityestimation_ray.sketches import HyperLogLog

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2 ** 63, size=50_000, dtype=np.int64).astype(np.uint64)
    plain = HyperLogLog(b=14)
    plain.add_hashes(h)
    hinted = HyperLogLog(b=14).reserve_dense()
    hinted.add_hashes(h)
    assert plain == hinted
    assert plain.estimate() == hinted.estimate()

    # direct-count exactness survives the dense bank (incl. duplicates)
    small = rng.integers(0, 2 ** 63, size=50, dtype=np.int64).astype(np.uint64)
    c = HyperLogLog(b=14).reserve_dense()
    c.add_hashes(small)
    c.add_hashes(small)
    assert c.estimate() == len(np.unique(small))
    assert HyperLogLog.from_bytes(c.to_bytes()).estimate() == c.estimate()

    # sparse x dense merges agree with a single-sketch build
    m1 = HyperLogLog(b=14)
    m1.add_hashes(small)
    m1.merge(hinted)
    m2 = HyperLogLog(b=14)
    m2.add_hashes(small)
    m2.add_hashes(h)
    assert m1 == m2
