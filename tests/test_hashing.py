"""Golden-vector and vectorized-vs-scalar equivalence tests for hashing.

Golden vectors from the reference test suite (FIXTURES.md F4):
- FNV-1a:   CardinalityEstimation.Test/Hash/Fnv1ATests.cs:35-41
- Murmur3:  CardinalityEstimation.Test/Hash/Murmur3Tests.cs:35-41
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from cardinalityestimation_ray.sketches import hashing


def test_fnv1a_golden_vectors():
    assert hashing.fnv1a64(b"") == 14695981039346656037
    assert hashing.fnv1a64(bytes([1, 2, 3, 4, 5])) == 1109817072422714760
    assert hashing.fnv1a64(bytes([255] * 4)) == 11047178588169845073


def test_murmur3_golden_vectors():
    assert hashing.murmur3_128_x64_low64(b"") == 0
    assert hashing.murmur3_128_x64_low64(bytes([1, 2, 3, 4, 5])) == 18344466521425217038
    assert hashing.murmur3_128_x64_low64(bytes([255] * 4)) == 4889297221962843713


@pytest.mark.parametrize("dtype,fmt", [
    (np.int32, "<i"), (np.uint32, "<I"), (np.int64, "<q"), (np.uint64, "<Q"),
])
def test_fnv1a_vectorized_matches_scalar_ints(dtype, fmt):
    rng = np.random.default_rng(7)
    info = np.iinfo(dtype)
    vals = rng.integers(info.min, info.max, size=257, dtype=dtype)
    vals[:4] = [0, 1, info.min, info.max]
    vec = hashing.fnv1a64_fixed(vals)
    for v, h in zip(vals, vec):
        assert hashing.fnv1a64(struct.pack(fmt, int(v))) == int(h)


@pytest.mark.parametrize("dtype,fmt", [(np.float32, "<f"), (np.float64, "<d")])
def test_fnv1a_vectorized_matches_scalar_floats(dtype, fmt):
    rng = np.random.default_rng(8)
    vals = rng.normal(size=64).astype(dtype)
    vec = hashing.fnv1a64_fixed(vals)
    for v, h in zip(vals, vec):
        assert hashing.fnv1a64(struct.pack(fmt, float(v))) == int(h)


def test_fnv1a_arrow_binary_matches_scalar():
    strings = ["", "a", "doc-000000000042", "x" * 300, "héllo wörld", "tail"]
    arr = pa.array(strings, type=pa.string())
    vec = hashing.hash_arrow_binary(arr, "fnv1a")
    for s, h in zip(strings, vec):
        assert hashing.fnv1a64(s.encode("utf-8")) == int(h)
    # sliced arrays (non-zero offset) must hash identically
    sl = arr.slice(2, 3)
    vec_sl = hashing.hash_arrow_binary(sl, "fnv1a")
    assert list(vec_sl) == list(vec[2:5])
    # large_string path
    larr = pa.array(strings, type=pa.large_string())
    assert list(hashing.hash_arrow_binary(larr, "fnv1a")) == list(vec)
    # the bare default is the LIBRARY default hash (round-4 session-9
    # review: a raw-fnv1a default silently mismatched every sketch built
    # with default settings)
    assert hashing.DEFAULT_HASH == "fnv1a_mix"
    dflt = hashing.hash_arrow_binary(arr)
    assert list(dflt) == list(hashing.hash_arrow_binary(arr, "fnv1a_mix"))
    assert list(dflt) != list(vec)


def test_int_identity_rule_matches_bytes():
    """Reference invariant: Add(123) == Add(LE bytes of 123)
    (CardinalityEstimatorTests.cs:750-770)."""
    h_int = hashing.fnv1a64_fixed(np.asarray([123], dtype=np.int32))[0]
    h_bytes = hashing.fnv1a64(struct.pack("<i", 123))
    assert int(h_int) == h_bytes


def test_bit_length_u64():
    vals = np.array([0, 1, 2, 3, 8, (1 << 50) - 1, 1 << 51, (1 << 63), (1 << 64) - 1],
                    dtype=np.uint64)
    expect = [0, 1, 2, 2, 4, 50, 52, 64, 64]
    assert list(hashing.bit_length_u64(vals)) == expect
    small = vals[vals < (1 << 53)]
    assert list(hashing.bit_length_u64_small(small)) == [0, 1, 2, 2, 4, 50, 52]


def test_splitmix64_deterministic_and_dispersed():
    x = np.arange(10_000, dtype=np.uint64)
    h = hashing.splitmix64(x)
    assert len(np.unique(h)) == len(h)
    assert np.array_equal(h, hashing.splitmix64(x))


def test_polars_hash_backend():
    """polars-native string hash: deterministic, well-dispersed, usable as an
    HLL hash (stable within a polars version)."""
    import pyarrow as pa

    from cardinalityestimation_ray.sketches.hll import HyperLogLog

    strings = [f"doc-{i}" for i in range(5000)]
    arr = pa.array(strings)
    h1 = hashing.hash_arrow_binary(arr, "polars")
    h2 = hashing.hash_arrow_binary(arr, "polars")
    assert np.array_equal(h1, h2)
    assert len(np.unique(h1)) == len(strings)

    a = HyperLogLog(b=12, hash_name="polars")
    a.add_arrow(arr.slice(0, 3000))
    b = HyperLogLog(b=12, hash_name="polars")
    b.add_arrow(arr.slice(3000))
    merged = a.merge(b)
    single = HyperLogLog(b=12, hash_name="polars")
    single.add_arrow(arr)
    assert merged == single
    assert abs(merged.estimate() / 5000 - 1) < 10 * single.std_error


def test_wordfnv_vectorized_matches_scalar():
    """wordfnv_mix (word-wise numpy fast path): vectorized == scalar on edge
    cases (empty, exact word multiples, tail bytes, trailing NULs, unicode)."""
    strings = ["", "a", "12345678", "123456789", "x" * 70, "abc\0", "abc",
               "héllo wörld", "q" * 8, "q" * 16, "q" * 17]
    arr = pa.array(strings)
    vec = hashing.hash_arrow_binary(arr, "wordfnv_mix")
    for s, h in zip(strings, vec):
        assert hashing.wordfnv64_mix(s.encode()) == int(h), repr(s)
    # trailing NUL must stay distinct (length is mixed in)
    assert vec[5] != vec[6]
    # sliced (offset) arrays hash identically
    assert list(hashing.hash_arrow_binary(arr.slice(2, 4), "wordfnv_mix")) == \
        list(vec[2:6])


class TestNullSemantics:
    """Nulls in Arrow columns are skipped by every sketch ingest path
    (SQL COUNT(DISTINCT) semantics) — ADVICE round-1 fix."""

    def test_hll_add_arrow_skips_nulls(self):
        import pyarrow as pa
        from cardinalityestimation_ray.sketches.hll import HyperLogLog

        vals = pa.array(["a", None, "b", None, "a", ""], type=pa.string())
        h = HyperLogLog(b=14)
        h.add_arrow(vals)
        # distinct non-null: {"a", "b", ""} -> exact via direct mode
        assert h.estimate() == 3
        assert h.count_additions == 4  # nulls not counted as additions

    def test_hll_null_not_same_as_empty_string(self):
        import pyarrow as pa
        from cardinalityestimation_ray.sketches.hll import HyperLogLog

        only_nulls = pa.array([None, None], type=pa.string())
        h = HyperLogLog(b=14)
        h.add_arrow(only_nulls)
        assert h.estimate() == 0

    def test_bloom_and_cms_skip_nulls(self):
        import pyarrow as pa
        from cardinalityestimation_ray.sketches.bloom import BloomFilter
        from cardinalityestimation_ray.sketches.countmin import CountMinSketch

        vals = pa.array([None, "x"], type=pa.string())
        bf = BloomFilter(num_bits=1 << 12, num_hashes=5)
        bf.add_arrow(vals)
        assert bf.contains("x")
        assert not bf.contains("")  # the null did not smuggle in ""

        cms = CountMinSketch(depth=4, width=256)
        cms.add_arrow(vals)
        assert cms.query("x") >= 1
        assert cms.query("") == 0

    def test_hll_numeric_nulls_skipped(self):
        import pyarrow as pa
        from cardinalityestimation_ray.sketches.hll import HyperLogLog

        vals = pa.array([1, None, 2, 2], type=pa.int32())
        h = HyperLogLog(b=14)
        h.add_arrow(vals)
        assert h.estimate() == 2
        assert h.count_additions == 3


class TestXXH64:
    """XXH64 fills the reference's default-hash role
    (CardinalityEstimator.cs:212-213 defaults to the xxHash family; hash is
    pluggable per GetHashCodeDelegate). Golden vectors are the published
    XXH64 reference values."""

    GOLDEN = [
        (b"", 0, 0xEF46DB3751D8E999),
        (b"a", 0, 0xD24EC4F1A98C6E5B),
        (b"abc", 0, 0x44BC2CF5AD770999),
        (b"xxhash", 20141025, 13067679811253438005),
        (b"Nobody inspects the spammish repetition", 0, 0xFBCEA83C8A378BF1),
    ]

    def test_golden_vectors(self):
        from cardinalityestimation_ray.sketches.hashing import xxh64

        for data, seed, want in self.GOLDEN:
            assert xxh64(data, seed) == want, data

    def test_vectorized_bytes_equals_scalar_all_lengths(self):
        import numpy as np

        from cardinalityestimation_ray.sketches.hashing import (
            xxh64, xxh64_bytes_array)

        rng = np.random.default_rng(3)
        blobs = [bytes(rng.integers(0, 256, size=ln, dtype=np.uint8))
                 for ln in list(range(0, 40)) + [63, 64, 65, 100, 200, 1000]]
        data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        lengths = np.array([len(b) for b in blobs], dtype=np.int64)
        starts = np.r_[0, np.cumsum(lengths)[:-1]]
        vec = xxh64_bytes_array(data, starts, lengths)
        for i, b in enumerate(blobs):
            assert int(vec[i]) == xxh64(b), (i, len(b))

    def test_fixed_width_byte_identity(self):
        """Add(123) == Add(LE bytes of 123) under xxhash64 — the reference's
        element-identity invariant (CardinalityEstimatorTests.cs:750-770)."""
        import struct

        import numpy as np

        from cardinalityestimation_ray.sketches.hashing import (
            xxh64, xxh64_fixed)

        vals32 = np.array([0, 1, 123, -1, 2**31 - 1], dtype=np.int32)
        out32 = xxh64_fixed(vals32)
        for i, v in enumerate(vals32):
            assert int(out32[i]) == xxh64(struct.pack("<i", int(v)))

        vals64 = np.array([0, 123, -5, 2**63 - 1], dtype=np.int64)
        out64 = xxh64_fixed(vals64)
        for i, v in enumerate(vals64):
            assert int(out64[i]) == xxh64(struct.pack("<q", int(v)))

        f64 = np.array([0.0, 1.5, -2.25], dtype=np.float64)
        outf = xxh64_fixed(f64)
        for i, v in enumerate(f64):
            assert int(outf[i]) == xxh64(struct.pack("<d", float(v)))

    def test_registered_in_dispatch(self):
        import pyarrow as pa

        import numpy as np

        from cardinalityestimation_ray.sketches import hashing
        from cardinalityestimation_ray.sketches.hll import HyperLogLog

        assert hashing.hash_scalar(b"abc", "xxhash64") == 0x44BC2CF5AD770999
        arr = pa.array(["abc", "", "a"])
        out = hashing.hash_arrow_binary(arr, "xxhash64")
        assert int(out[0]) == 0x44BC2CF5AD770999
        assert int(out[1]) == 0xEF46DB3751D8E999

        # end-to-end: HLL under xxhash64, exact regime + estimate regime
        h = HyperLogLog(b=14, hash_name="xxhash64")
        h.add_values(np.arange(50, dtype=np.int64))
        assert h.estimate() == 50
        h2 = HyperLogLog(b=14, hash_name="xxhash64")
        h2.add_values(np.arange(200_000, dtype=np.int64))
        assert abs(h2.estimate() / 200_000 - 1) < 3 * 1.04 / 2**7


def test_murmur3_fixed_vectorized_bit_exact():
    """Vectorized murmur3 fixed-width path == scalar reference-parity
    implementation on every supported dtype's byte image."""
    import struct

    import numpy as np

    from cardinalityestimation_ray.sketches.hashing import (
        hash_fixed_batch,
        murmur3_128_x64_low64,
        murmur3_128_x64_low64_fixed,
    )

    rng = np.random.default_rng(9)
    vals32 = rng.integers(-2**31, 2**31, size=100).astype(np.int32)
    out = murmur3_128_x64_low64_fixed(vals32)
    for i, v in enumerate(vals32):
        assert int(out[i]) == murmur3_128_x64_low64(struct.pack("<i", int(v)))
    vals64 = rng.integers(-2**62, 2**62, size=100).astype(np.int64)
    out = hash_fixed_batch(vals64, "murmur3")
    for i, v in enumerate(vals64):
        assert int(out[i]) == murmur3_128_x64_low64(struct.pack("<q", int(v)))
