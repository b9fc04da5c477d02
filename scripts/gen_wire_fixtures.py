"""Generate golden serialized sketch fixtures (tests/fixtures/*.bin).

Mirrors the reference's fixture strategy (9 binary resx files covering
{direct, sparse, dense} x format versions,
CardinalityEstimatorSerializerTests.cs:179-278): deterministic inputs,
committed blobs, a test that deserializing them reproduces the exact state —
so any accidental wire-format change breaks loudly.

Run: python scripts/gen_wire_fixtures.py  (idempotent)
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cardinalityestimation_ray.sketches.bloom import BloomFilter  # noqa: E402
from cardinalityestimation_ray.sketches.countmin import CountMinSketch  # noqa: E402
from cardinalityestimation_ray.sketches.hll import HyperLogLog  # noqa: E402
from cardinalityestimation_ray.sketches.kll import KLLSketch  # noqa: E402
from cardinalityestimation_ray.sketches.tdigest import TDigest  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def hll_fixture(n: int) -> bytes:
    sk = HyperLogLog(b=14)
    sk.add_values(np.arange(n, dtype=np.int64))
    return sk.to_bytes()


def v2_fixture() -> bytes:
    """Hand-built v2.1 blob (legacy format: hash-id byte, fnv1a)."""
    payload = struct.pack("<HH", 2, 1) + struct.pack("<B", 0)
    payload += struct.pack("<i", 14) + struct.pack("<B", 3)
    payload += struct.pack("<i", 2) + struct.pack("<QQ", 111, 222)
    payload += struct.pack("<Q", 5)
    return payload


def v1_fixture() -> bytes:
    """Hand-built v1.0 blob (no hash id, no count_additions, fnv forced)."""
    payload = struct.pack("<HH", 1, 0)
    payload += struct.pack("<i", 14) + struct.pack("<B", 3)
    payload += struct.pack("<i", 1) + struct.pack("<Q", 4242)
    return payload


def main() -> None:
    OUT.mkdir(exist_ok=True)
    fixtures = {
        "hll_direct_50.bin": hll_fixture(50),          # direct mode
        "hll_sparse_151.bin": hll_fixture(151),        # sparse mode
        "hll_dense_5005.bin": hll_fixture(5005),       # dense-ish (still sparse
        #                                                at b=14 until ~1082 regs;
        #                                                5005 values -> dense)
        "hll_v2_direct.bin": v2_fixture(),
        "hll_v1_direct.bin": v1_fixture(),
    }
    cms = CountMinSketch(depth=3, width=1 << 10)
    cms.add_values(np.arange(1000, dtype=np.int64))
    fixtures["cms_1000.bin"] = cms.to_bytes()
    bf = BloomFilter(num_bits=1 << 12, num_hashes=5)
    bf.add_values(np.arange(200, dtype=np.int64))
    fixtures["bloom_200.bin"] = bf.to_bytes()
    td = TDigest(delta=100)
    td.add_values(np.linspace(0, 1, 10_000))
    fixtures["tdigest_10k.bin"] = td.to_bytes()
    kll = KLLSketch(k=128)
    kll.add_values(np.linspace(0, 1, 10_000))
    fixtures["kll_10k.bin"] = kll.to_bytes()

    for name, blob in fixtures.items():
        (OUT / name).write_bytes(blob)
        print(f"{name}: {len(blob)} bytes")


if __name__ == "__main__":
    main()
