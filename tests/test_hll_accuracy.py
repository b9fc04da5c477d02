"""Statistical accuracy harness (FIXTURES.md F2), mirroring the reference's
RunTest technique (CardinalityEstimatorTests.cs:465-524): known-cardinality
streams, assert |est/n - 1| <= 10 x the configured standard error; exact
(zero-error) below 100 elements with direct counting."""

import numpy as np
import pytest

from cardinalityestimation_ray.sketches.constants import std_error
from cardinalityestimation_ray.sketches.hll import HyperLogLog


def _random_blobs_hashes(n: int, seed: int) -> np.ndarray:
    """n distinct elements as pre-hashed uint64 (the reference uses random
    20-byte blobs; a seeded uniform uint64 stream is the same population for
    a well-mixed hash)."""
    rng = np.random.default_rng(seed)
    out = rng.integers(0, 2**64, size=int(n * 1.1) + 16, dtype=np.uint64)
    uniq = np.unique(out)  # sorted; permute before slicing to avoid range bias
    return rng.permutation(uniq)[:n]


def test_exact_under_100_members():
    # CardinalityEstimatorTests.cs:144-151 — error must be 0 for 1..99
    for n in range(1, 100, 7):
        hll = HyperLogLog(b=14)
        hll.add_values(np.arange(n, dtype=np.int64))
        assert hll.estimate() == n
    hll = HyperLogLog(b=14)
    hll.add_values(np.arange(99, dtype=np.int64))
    assert hll.estimate() == 99
    assert hll.direct is not None


def test_small_range_without_direct_count():
    # CardinalityEstimatorTests.cs:153-162
    for n in (1, 10, 50, 99):
        for b in (12, 14):
            hll = HyperLogLog(b=b, use_direct_counting=False)
            assert hll.direct is None
            hll.add_hashes(_random_blobs_hashes(n, seed=n * 31 + b))
            gate = 10 * std_error(b)
            assert abs(hll.estimate() / n - 1) <= gate


@pytest.mark.parametrize("b", [4, 12, 14, 16])
@pytest.mark.parametrize("n", [100, 1000, 10_000])
def test_cardinality_ladder(b, n):
    hll = HyperLogLog(b=b)
    hll.add_hashes(_random_blobs_hashes(n, seed=n + b))
    gate = 10 * std_error(b)
    assert abs(hll.estimate() / n - 1) <= gate


@pytest.mark.parametrize("n", [10**5, 10**6])
def test_large_cardinalities(n):
    # CardinalityEstimatorTests.cs:329-340 regime (10^7+ exercised in bench)
    b = 14
    hll = HyperLogLog(b=b)
    hll.add_hashes(_random_blobs_hashes(n, seed=n))
    assert abs(hll.estimate() / n - 1) <= 10 * std_error(b)


@pytest.mark.slow
def test_ten_million():
    n = 10**7
    hll = HyperLogLog(b=14)
    hll.add_hashes(_random_blobs_hashes(n, seed=1))
    assert abs(hll.estimate() / n - 1) <= 10 * std_error(14)


def test_sequential_integers():
    # CardinalityEstimatorTests.cs:342-353 — structured (non-random) inputs
    for n in (10_000, 100_000):
        hll = HyperLogLog(b=14)
        hll.add_values(np.arange(n, dtype=np.int64))
        assert abs(hll.estimate() / n - 1) <= 10 * std_error(14)


def test_sequential_int32_vs_int64_distinct_identities():
    # int32(5) encodes to 4 bytes, int64(5) to 8 -> different identities
    a = HyperLogLog(b=14)
    a.add_values(np.arange(50, dtype=np.int32))
    b = HyperLogLog(b=14)
    b.add_values(np.arange(50, dtype=np.int64))
    assert a.estimate() == b.estimate() == 50
    merged = a.copy().merge(b)
    assert merged.estimate() == 100


def test_duplicates_not_double_counted():
    hll = HyperLogLog(b=14)
    vals = np.arange(500, dtype=np.int64)
    for _ in range(5):
        hll.add_values(vals)
    assert hll.count_additions == 2500
    assert abs(hll.estimate() / 500 - 1) <= 10 * std_error(14)


def test_string_and_bytes_elements():
    hll = HyperLogLog(b=12)
    hll.add("hello")
    hll.add("hello")
    hll.add(b"hello")  # same identity bytes as the UTF-8 string
    hll.add("world")
    assert hll.estimate() == 2


def test_type_overload_matrix():
    """The reference's memory-type overload matrices translated: the same
    logical elements added through every input path must produce identical
    register state (numpy array, Arrow array, Arrow large types, scalars,
    pre-hashed)."""
    import pyarrow as pa

    from cardinalityestimation_ray.sketches import hashing

    vals = np.arange(200, dtype=np.int32)

    via_numpy = HyperLogLog(b=12)
    via_numpy.add_values(vals)

    via_arrow = HyperLogLog(b=12)
    via_arrow.add_arrow(pa.array(vals, type=pa.int32()))

    via_chunked = HyperLogLog(b=12)
    via_chunked.add_arrow(pa.chunked_array([vals[:100], vals[100:]],
                                           type=pa.int32()))

    via_hashes = HyperLogLog(b=12)
    via_hashes.add_hashes(hashing.hash_fixed_batch(vals))

    assert via_numpy == via_arrow == via_chunked == via_hashes

    # string paths: str scalar == utf8 arrow == bytes scalar
    s1 = HyperLogLog(b=12)
    for word in ("alpha", "beta", "gamma"):
        s1.add(word)
    s2 = HyperLogLog(b=12)
    s2.add_arrow(pa.array(["alpha", "beta", "gamma"]))
    s3 = HyperLogLog(b=12)
    for word in (b"alpha", b"beta", b"gamma"):
        s3.add(word)
    assert s1 == s2 == s3


@pytest.mark.slow
@pytest.mark.parametrize("n", [10**8, 10**9])
def test_extreme_cardinalities(n):
    """10^8 and 10^9 regime (the reference skips its 2^32 test for runtime;
    splitmix64 is a 64-bit bijection, so counter hashes are exactly-n
    distinct well-mixed elements — this exercises the large-range HLL path
    far beyond the LinearCounting threshold)."""
    from cardinalityestimation_ray.sketches.hashing import splitmix64

    hll = HyperLogLog(b=14, use_direct_counting=False)
    chunk = 4_000_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        hll.add_hashes(splitmix64(np.arange(lo, hi, dtype=np.uint64)))
    assert abs(hll.estimate() / n - 1) <= 10 * std_error(14)
