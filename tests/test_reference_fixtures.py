"""Cross-implementation interop: deserialize the reference's own golden
serialized fixtures and reproduce its pinned estimates.

The nine binary fixtures under tests/fixtures/reference/ are byte-for-byte
copies of /root/reference/CardinalityEstimation.Test/resx/*.bin (MIT), the
reference's regression corpus covering {direct, sparse, dense} x wire format
{v1.0, v2.0, v2.1}.  Expected counts are pinned by the reference's own tests
(CardinalityEstimatorSerializerTests.cs:179-278):

  v1.0: direct=50, sparse=151, dense=5005
  v2.0: direct=50, sparse=151, dense=5009
  v2.1: direct=50, sparse=151, dense=5009 with CountAdditions 50/150/5000

Reading these blobs with exact count parity proves the wire format
(CardinalityEstimatorSerializer.cs:192-348), the state rebuild-from-direct
rule (CardinalityEstimator.cs:297-307), and the estimation math
(CardinalityEstimator.cs:542-600) all match the reference bit-for-bit.
"""
from __future__ import annotations

import pathlib

import pytest

from cardinalityestimation_ray.sketches.hll import HyperLogLog

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "reference"

# (filename, expected_count, expected_count_additions or None for pre-2.1)
CASES = [
    ("serializeddirect_v1.0.bin", 50, None),
    ("serializedsparse_v1.0.bin", 151, None),
    ("serializeddense_v1.0.bin", 5005, None),
    ("serializeddirect_v2_0.bin", 50, None),
    ("serializedsparse_v2_0.bin", 151, None),
    ("serializeddense_v2_0.bin", 5009, None),
    ("serializeddirect_v2_1.bin", 50, 50),
    ("serializedsparse_v2_1.bin", 151, 150),
    ("serializeddense_v2_1.bin", 5009, 5000),
]


@pytest.mark.parametrize("fname,expected,adds", CASES, ids=[c[0] for c in CASES])
def test_reference_fixture_roundtrip(fname, expected, adds):
    blob = (FIXTURES / fname).read_bytes()
    hll = HyperLogLog.from_bytes(blob)
    assert hll.estimate() == expected
    if adds is not None:
        assert hll.count_additions == adds
    else:
        # pre-2.1 formats carry no CountAdditions field
        assert hll.count_additions == 0


@pytest.mark.parametrize("fname,expected,adds", CASES, ids=[c[0] for c in CASES])
def test_reference_fixture_reserialize_stable(fname, expected, adds):
    """Deserialize -> serialize (our v3.1 writer) -> deserialize is
    STATE-lossless. The hash LABEL is the documented exception: the v3
    wire carries no hash id, so the re-read sketch is labeled with the
    default hash — exactly what the reference's own v3 deserializer does
    (CardinalityEstimatorSerializer.cs), and its Equals (which compares
    hashFunction, like ours since round-4 session 9) would also see the
    relabel. Compare state with the label aligned, and pin the relabel."""
    blob = (FIXTURES / fname).read_bytes()
    hll = HyperLogLog.from_bytes(blob)
    again = HyperLogLog.from_bytes(hll.to_bytes())
    assert again.estimate() == expected
    from cardinalityestimation_ray.sketches import hashing
    assert again.hash_name == hashing.DEFAULT_HASH  # v3 wire relabel
    again.hash_name = hll.hash_name
    assert again == hll


def test_v3_0_blob_keeps_count_additions():
    """Version predicate is (major, minor) >= (2, 1), not minor >= 1
    (CardinalityEstimatorSerializer.cs:328-333): a synthetic 3.0 blob must
    retain its trailing CountAdditions."""
    import struct

    hll = HyperLogLog(b=12)
    import numpy as np

    hll.add_values(np.arange(500, dtype=np.int64))
    blob = bytearray(hll.to_bytes())
    major, minor = struct.unpack_from("<HH", blob, 0)
    assert (major, minor) == (3, 1)
    struct.pack_into("<HH", blob, 0, 3, 0)  # rewrite header to v3.0
    back = HyperLogLog.from_bytes(bytes(blob))
    assert back.count_additions == 500
    assert back.estimate() == hll.estimate()


def test_reference_fixtures_merge_across_formats():
    """Fixtures of the same mode from different format versions describe the
    same underlying element sets; merging dense v1.0 with dense v2.1 must not
    change the estimate (register max is idempotent)."""
    a = HyperLogLog.from_bytes((FIXTURES / "serializeddense_v2_1.bin").read_bytes())
    b = HyperLogLog.from_bytes((FIXTURES / "serializeddense_v2_0.bin").read_bytes())
    est_before = a.estimate()
    a.merge(b)
    assert a.estimate() == est_before
