"""FLAC codec (stages/flac.py) — RFC 9639 subset, lossless."""

import numpy as np
import pytest

from cardinalityestimation_ray.stages.flac import decode_flac, encode_flac


class TestLosslessRoundtrip:
    @pytest.mark.parametrize("name,make", [
        ("const", lambda rng: np.full(5000, -1234, dtype=np.int16)),
        ("sine", lambda rng: (8000 * np.sin(
            2 * np.pi * np.arange(10000) / 200)).astype(np.int16)),
        ("noise", lambda rng: rng.integers(-32768, 32768,
                                           size=4097).astype(np.int16)),
        ("ramp", lambda rng: np.arange(-2000, 2096, dtype=np.int16)),
        ("single", lambda rng: np.array([5], dtype=np.int16)),
        ("extremes", lambda rng: np.tile(np.array([-32768, 32767],
                                                  dtype=np.int16), 2500)),
    ])
    def test_bit_exact(self, name, make):
        sig = make(np.random.default_rng(0))
        dec, rate = decode_flac(encode_flac(sig, 16000))
        assert rate == 16000
        assert len(dec) == len(sig)
        assert (dec == sig).all(), name

    def test_actually_compresses_smooth_signals(self):
        sig = (8000 * np.sin(2 * np.pi * np.arange(20000) / 400)) \
            .astype(np.int16)
        blob = encode_flac(sig, 16000)
        assert len(blob) < 0.4 * 2 * len(sig)  # real entropy coding at work

    def test_multi_frame_boundaries(self):
        # 3 full 4096 frames + partial tail; values straddle frame edges
        sig = (np.arange(13000) % 251 - 125).astype(np.int16)
        dec, _ = decode_flac(encode_flac(sig, 8000))
        assert (dec == sig).all()


class TestAdversarial:
    def test_bad_magic_and_truncation(self):
        good = encode_flac(np.arange(100, dtype=np.int16), 8000)
        with pytest.raises(ValueError):
            decode_flac(b"fLaX" + good[4:])
        with pytest.raises(ValueError):
            decode_flac(good[:30])
        with pytest.raises(ValueError):
            decode_flac(good[:-3])  # truncated final frame

    def test_corrupt_frame_body_fails_crc(self):
        sig = (np.sin(np.arange(5000)) * 1000).astype(np.int16)
        good = bytearray(encode_flac(sig, 8000))
        good[len(good) // 2] ^= 0xFF
        with pytest.raises(ValueError):
            decode_flac(bytes(good))

    def test_encoder_validation(self):
        with pytest.raises(ValueError):
            encode_flac(np.zeros(0, dtype=np.int16), 8000)
        with pytest.raises(ValueError):
            encode_flac(np.zeros(10, dtype=np.int32), 8000)
        with pytest.raises(ValueError):
            encode_flac(np.zeros(10, dtype=np.int16), 0)


def test_audio_stage_accepts_flac(ray_session):
    import pyarrow as pa
    import ray.data

    from cardinalityestimation_ray.stages.multimodal import (
        AudioFrameSampleStage,
    )

    rows = []
    for i in range(4):
        sig = np.full(1600, 200 * (i + 1), dtype=np.int16)
        rows.append({"media_id": i, "payload": encode_flac(sig, 16000)})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(AudioFrameSampleStage(decoder="flac", n_frames=8),
                         batch_size=2, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    e = np.stack(out.sort_values("media_id")["frame_energy"])
    expect = (np.arange(1, 5) * 200 / 32768.0)[:, None]
    assert np.allclose(e, np.broadcast_to(expect, e.shape), atol=1e-6)


def test_unknown_total_samples_decodes_to_eof():
    """STREAMINFO total_samples == 0 legally means UNKNOWN (streaming
    encoders writing to a pipe emit it); the decoder must decode frames to
    EOF, not silently return zero samples."""
    sig = (np.sin(np.linspace(0, 20, 2000)) * 1000).astype(np.int16)
    data = bytearray(encode_flac(sig, 8000))
    # zero the 36-bit total_samples field: low nibble of STREAMINFO byte 17
    # plus bytes 18..21 (STREAMINFO payload starts at offset 8)
    data[8 + 17] &= 0xF0
    for i in range(18, 22):
        data[8 + i] = 0
    dec, rate = decode_flac(bytes(data))
    assert rate == 8000
    assert np.array_equal(dec, sig)
