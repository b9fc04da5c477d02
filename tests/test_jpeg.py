"""Baseline JPEG codec (stages/jpeg.py)."""

import numpy as np
import pytest

from cardinalityestimation_ray.stages.jpeg import decode_jpeg, encode_jpeg


class TestRoundtrip:
    def test_uniform_even_values_exact(self):
        """Uniform blocks are DC-only; for EVEN pixel values the luma DC
        quantizer (16, on DC = 8*(v-128)) divides evenly, so the decode is
        closed-form EXACT — the same invariant the driver oracle uses."""
        for v in range(0, 256, 2):
            img = np.full((8, 8), v, dtype=np.uint8)
            assert (decode_jpeg(encode_jpeg(img)) == img).all(), v

    def test_uniform_odd_values_within_one(self):
        for v in range(1, 256, 2):
            img = np.full((8, 8), v, dtype=np.uint8)
            err = np.abs(decode_jpeg(encode_jpeg(img)).astype(int) - v).max()
            assert err <= 1, v

    def test_smooth_gradient_small_error(self):
        x = np.linspace(0, 255, 32)
        grad = np.add.outer(x, x) / 2
        img = np.stack([grad, grad[::-1], grad.T], -1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 4 and err.max() < 20

    def test_non_multiple_of_8_shapes(self):
        rng = np.random.default_rng(2)
        for shape in [(1, 1), (7, 9), (24, 17, 3), (9, 16)]:
            img = rng.integers(0, 256, size=shape).astype(np.uint8)
            out = decode_jpeg(encode_jpeg(img))
            assert out.shape == img.shape

    def test_dc_chains_across_blocks(self):
        """Multi-block images exercise DC prediction; a step image decodes
        with each region near its level."""
        img = np.zeros((16, 32), dtype=np.uint8)
        img[:, 16:] = 200
        out = decode_jpeg(encode_jpeg(img)).astype(int)
        assert abs(out[:, :8].mean() - 0) < 6
        assert abs(out[:, 24:].mean() - 200) < 6


class TestAdversarial:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x01")

    def test_truncated_scan(self):
        good = encode_jpeg(np.full((16, 16), 77, dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(good[: len(good) // 2])

    def test_progressive_rejected(self):
        good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        i = bytes(good).find(b"\xFF\xC0")
        good[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
        with pytest.raises(ValueError, match="SOF2"):
            decode_jpeg(bytes(good))

    def test_subsampling_rejected(self):
        good = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
        i = bytes(good).find(b"\xFF\xC0")
        # first component's sampling byte: SOF payload = len(2) P(1) H(2)
        # W(2) Nf(1) then [id, sampling, tq]
        good[i + 2 + 2 + 1 + 2 + 2 + 1 + 1] = 0x22
        with pytest.raises(ValueError, match="subsampling"):
            decode_jpeg(bytes(good))

    def test_bad_payload_types(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4), dtype=np.float32))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((0, 4), dtype=np.uint8))


def test_decode_stage_accepts_jpeg(ray_session):
    import pyarrow as pa
    import ray.data

    from cardinalityestimation_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(9)
    rows = []
    for i in range(4):
        img = np.full((16, 16, 3), int(rng.integers(0, 128)) * 2,
                      dtype=np.uint8)
        rows.append({"media_id": i, "payload": encode_jpeg(img),
                     "width": 16, "height": 16})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(ImageDecodeStage(decoder="jpeg", out_size=16),
                         batch_size=2, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 4
