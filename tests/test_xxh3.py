"""XXH3-128 bit-parity with the reference's DEFAULT hash.

The reference's default hash (``CardinalityEstimator.cs:212-213``) is
``BitConverter.ToUInt64(System.IO.Hashing.XxHash128.Hash(x))``. Golden
vectors below were generated with the official xxHash v0.8.2 reference
implementation (the public single-header library vendored by pyarrow,
``arrow/vendored/xxhash/xxhash.h``) — .NET's XxHash128 implements the same
published algorithm, so these pin default-config interop.

Inputs are the deterministic pattern ``bytes((i*131 + 7) % 256)`` (pinned
by construction, no fixture files needed) plus reference element
encodings (UTF-8 strings, little-endian int32/int64/float64).
"""

import struct

import numpy as np
import pytest

from cardinalityestimation_ray.sketches import hashing
from cardinalityestimation_ray.sketches.xxh3 import (
    xxh3_128,
    xxh128_dotnet,
    xxh128_dotnet_bytes_array,
    xxh128_dotnet_fixed,
)


def _pat(ln: int) -> bytes:
    return bytes((i * 131 + 7) % 256 for i in range(ln))


# official-implementation golden vectors: len -> (high64, low64, dotnet64)
_PATTERN_VECTORS = {
    0: (0x99AA06D3014798D8, 0x6001C324468D497F, 0xD8984701D306AA99),
    1: (0x495B62073EF70CA4, 0x4C5CCA45D0F4811F, 0xA40CF73E07625B49),
    2: (0xF1B5EEC902A1EB5E, 0x29C60963CBFA4E6E, 0x5EEBA102C9EEB5F1),
    3: (0x390CDC5B4A895DD7, 0x6E3E2670E61106AC, 0xD75D894A5BDC0C39),
    4: (0xAA6E2F274640A3F4, 0x3D668AF6F2A44D77, 0xF4A34046272F6EAA),
    5: (0xD9DA89DA8D7E169A, 0x62853C5F1A6EDA6E, 0x9A167E8DDA89DAD9),
    7: (0x9C62F06059404F49, 0x1B174AD8D9A81F6B, 0x494F405960F0629C),
    8: (0x6A86A3BDA6AF4E3D, 0x61DDBE7F31A6100D, 0x3D4EAFA6BDA3866A),
    9: (0x664C7CA18AFD6255, 0x8C7B67FD458A936B, 0x5562FD8AA17C4C66),
    12: (0xDAB57051AFE30B1D, 0xCDEBA3D6707F8F04, 0x1D0BE3AF5170B5DA),
    16: (0x7F9A218B0425449A, 0xE2CE54A7C19C730D, 0x9A4425048B219A7F),
    17: (0x66FC23F6439DBD77, 0x8D96EF110FCDEBB4, 0x77BD9D43F623FC66),
    31: (0xD8201BC2FEDEFE5C, 0xCEE425163875B69B, 0x5CFEDEFEC21B20D8),
    32: (0x49A11EE743D6D342, 0xFD357CF6CB2DDA18, 0x42D3D643E71EA149),
    48: (0x970D51B0610C09A8, 0x852DBBCCEBD42B1A, 0xA8090C61B0510D97),
    64: (0xE0FAF20E0E0FE0DD, 0xBA7E015A54F14BE1, 0xDDE00F0E0EF2FAE0),
    96: (0xFB78AC185EF55443, 0x8B8720F565DCF40C, 0x4354F55E18AC78FB),
    100: (0x76B536586DE98B82, 0x580B061A98A5A9B4, 0x828BE96D5836B576),
    128: (0xAEC730751478556C, 0xFF361DEC1385710A, 0x6C5578147530C7AE),
    129: (0x98CD36CCBB557926, 0x4545B3A09738E31A, 0x267955BBCC36CD98),
    160: (0x832AF93ACBF14D0B, 0x10963BC4F63E0DE8, 0x0B4DF1CB3AF92A83),
    200: (0x26D28D07860728F6, 0xA4773493FBBE3543, 0xF6280786078DD226),
    240: (0x5293E17BF553903D, 0x3F2C53E72293711F, 0x3D9053F57BE19352),
    241: (0xB53840FE3FEDF161, 0x956CAE592C67279E, 0x61F1ED3FFE4038B5),
    300: (0x87A2EFB2F7036289, 0xA4E69646CCCE75CE, 0x896203F7B2EFA287),
    511: (0xB3324BE14E173E72, 0x5A17DA924907228A, 0x723E174EE14B32B3),
    1024: (0xF69630613F24324D, 0x70BD377D9574F4BB, 0x4D32243F613096F6),
    1025: (0x621AF7B8277EFFA4, 0x66C4487C41E127A7, 0xA4FF7E27B8F71A62),
    2048: (0x56B77F207158A2BA, 0x8B46CAA67DAB3A30, 0xBAA25871207FB756),
    4096: (0x3E0FF38FA88A55EA, 0x9DDD66C14AF0DAFF, 0xEA558AA88FF30F3E),
}

# reference element encodings: (bytes, high64, low64, dotnet64)
_ELEMENT_VECTORS = [
    (b"hello world",
     0xDF8D09E93F874900, 0xA99B8775CC15B6C7, 0x0049873FE9098DDF),
    ("café ünïcode ☂".encode(),
     0x0FF83A7AB8CF1209, 0x5FD7B8FF9ECB78DA, 0x0912CFB87A3AF80F),
    (struct.pack("<i", 123),
     0xEC969E1D235BC70F, 0x6139AD898AB78759, 0x0FC75B231D9E96EC),
    (struct.pack("<q", 1 << 40),
     0xA09CB35CBB4B31C0, 0xA88B3B65FB4C532B, 0xC0314BBB5CB39CA0),
    (struct.pack("<d", 3.141592653589793),
     0xE15372E0FD2D1F8B, 0xB8D1CC4895BE659F, 0x8B1F2DFDE07253E1),
]


class TestGoldenVectors:
    @pytest.mark.parametrize("ln", sorted(_PATTERN_VECTORS))
    def test_scalar_pattern(self, ln):
        hi, lo, dn = _PATTERN_VECTORS[ln]
        assert xxh3_128(_pat(ln)) == (hi, lo)
        assert xxh128_dotnet(_pat(ln)) == dn

    @pytest.mark.parametrize("data,hi,lo,dn", _ELEMENT_VECTORS)
    def test_scalar_elements(self, data, hi, lo, dn):
        assert xxh3_128(data) == (hi, lo)
        assert xxh128_dotnet(data) == dn

    def test_vectorized_bytes_array_all_classes(self):
        cases = [_pat(ln) for ln in sorted(_PATTERN_VECTORS)]
        flat = b"".join(cases)
        data = np.frombuffer(flat, dtype=np.uint8)
        lens = np.array([len(c) for c in cases], dtype=np.int64)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        got = xxh128_dotnet_bytes_array(data, starts, lens)
        exp = np.array([_PATTERN_VECTORS[ln][2]
                        for ln in sorted(_PATTERN_VECTORS)], dtype=np.uint64)
        assert np.array_equal(got, exp)

    def test_vectorized_fixed_width(self):
        got32 = xxh128_dotnet_fixed(np.array([123], dtype=np.int32))
        assert int(got32[0]) == 0x0FC75B231D9E96EC
        got64 = xxh128_dotnet_fixed(np.array([1 << 40], dtype=np.int64))
        assert int(got64[0]) == 0xC0314BBB5CB39CA0
        gotf = xxh128_dotnet_fixed(
            np.array([3.141592653589793], dtype=np.float64))
        assert int(gotf[0]) == 0x8B1F2DFDE07253E1


class TestVectorizedMatchesScalar:
    def test_random_lengths(self):
        rng = np.random.default_rng(0)
        cases = [bytes(rng.integers(0, 256, size=ln, dtype=np.uint8))
                 for ln in list(range(0, 300, 7)) + [511, 777, 1500]]
        flat = b"".join(cases)
        data = np.frombuffer(flat, dtype=np.uint8)
        lens = np.array([len(c) for c in cases], dtype=np.int64)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        got = xxh128_dotnet_bytes_array(data, starts, lens)
        exp = np.array([xxh128_dotnet(c) for c in cases], dtype=np.uint64)
        assert np.array_equal(got, exp)


class TestDispatchIntegration:
    def test_hash_scalar_registered(self):
        assert hashing.hash_scalar(b"hello world", "xxhash128") \
            == 0x0049873FE9098DDF

    def test_hash_fixed_batch(self):
        vals = np.array([123, -7, 0, 2**31 - 1], dtype=np.int32)
        got = hashing.hash_fixed_batch(vals, "xxhash128")
        exp = np.array([hashing.hash_scalar(struct.pack("<i", int(v)),
                                            "xxhash128") for v in vals],
                       dtype=np.uint64)
        assert np.array_equal(got, exp)

    def test_hash_arrow_binary(self):
        import pyarrow as pa

        strs = ["hello world", "a", "", "café ünïcode ☂",
                "a longer string exceeding sixteen bytes for the mid path"]
        arr = pa.array(strs, type=pa.string())
        got = hashing.hash_arrow_binary(arr, "xxhash128")
        exp = np.array([hashing.hash_scalar(s.encode(), "xxhash128")
                        for s in strs], dtype=np.uint64)
        assert np.array_equal(got, exp)

    def test_element_encoding_matches_reference_add(self):
        # Add(123) hashes the little-endian int32 image (reference rule)
        assert hashing.hash_scalar(hashing.encode_element(123), "xxhash128") \
            == 0x0FC75B231D9E96EC
        assert hashing.hash_scalar(hashing.encode_element("hello world"),
                                   "xxhash128") == 0x0049873FE9098DDF


class TestCrossLibraryMerge:
    """Default-config interop: a v3 blob whose registers were produced from
    the C#-default hash values (simulated via the pinned dotnet vectors /
    direct hash injection) merges bit-identically with sketches built here
    under hash_name='xxhash128'."""

    def test_v3_blob_roundtrip_and_merge(self):
        from cardinalityestimation_ray.sketches.hll import HyperLogLog

        words = [f"word{i}" for i in range(5000)]
        import pyarrow as pa

        ours = HyperLogLog(b=14, hash_name="xxhash128",
                           use_direct_counting=False)
        ours.add_arrow(pa.array(words))

        # simulate the C# library: registers built from the default-hash
        # values directly (the .NET side computes the same dotnet composite)
        theirs = HyperLogLog(b=14, hash_name="xxhash128",
                             use_direct_counting=False)
        hashes = np.array([xxh128_dotnet(w.encode()) for w in words],
                          dtype=np.uint64)
        theirs.add_hashes(hashes)
        assert ours == theirs  # identical registers, not just estimates

        blob = theirs.to_bytes()
        back = HyperLogLog.from_bytes(blob, "xxhash128")
        merged = ours.copy()
        merged.merge(back)
        # idempotent: identical register content (add-counts differ, as the
        # reference's CountAdditions would after a merge)
        assert np.array_equal(merged.registers(), ours.registers())
        assert merged.estimate() == ours.estimate()

    def test_direct_count_hash_values_match(self):
        """Direct-count mode stores RAW hash values — exactly what a C# v3
        direct blob carries — so equal hash sets prove wire-level parity."""
        from cardinalityestimation_ray.sketches.hll import HyperLogLog

        import pyarrow as pa

        sk = HyperLogLog(b=14, hash_name="xxhash128")
        sk.add_arrow(pa.array(["hello world"]))
        sk.add(123)
        assert sk.direct == {0x0049873FE9098DDF, 0x0FC75B231D9E96EC}
