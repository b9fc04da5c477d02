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


# ---------------------------------------------------------------------------
# LPC subframes + stereo decorrelation (round-5: real-world FLAC coverage)


class TestLPC:
    @pytest.mark.parametrize("order", [1, 2, 8, 12, 32])
    def test_lpc_lossless_roundtrip(self, order):
        from cardinalityestimation_ray.stages.flac import encode_flac

        t = np.arange(9000)
        sig = (12000 * np.sin(t / 23.7) * np.exp(-t / 8000)
               + 3000 * np.sin(t / 301.0)).astype(np.int16)
        dec, rate = decode_flac(encode_flac(sig, 16000, lpc_order=order))
        assert rate == 16000
        assert np.array_equal(dec, sig)

    def test_lpc_stream_contains_lpc_subframes(self):
        # structural check: an LPC-encoded non-constant stream must differ
        # from the FIXED encoding of the same signal (distinct subframe
        # types), and both decode to the same samples
        sig = (5000 * np.sin(np.arange(5000) / 11.0)).astype(np.int16)
        fixed = encode_flac(sig, 8000)
        lpc = encode_flac(sig, 8000, lpc_order=8)
        assert fixed != lpc
        assert np.array_equal(decode_flac(fixed)[0], decode_flac(lpc)[0])

    def test_lpc_white_noise_escape_paths(self):
        rng = np.random.default_rng(3)
        sig = rng.integers(-32768, 32768, 5000).astype(np.int16)
        dec, _ = decode_flac(encode_flac(sig, 22050, lpc_order=8))
        assert np.array_equal(dec, sig)

    def test_lpc_predictor_actually_fits(self):
        from cardinalityestimation_ray.stages.flac import (
            _lpc_analyze,
            _lpc_residual,
        )

        # a pure slow sine is almost perfectly order-2 predictable: the
        # quantized predictor's residual must be tiny vs signal amplitude
        sig = (12000 * np.sin(np.arange(4096) / 23.7)).astype(np.int64)
        coefs, shift, precision = _lpc_analyze(sig, 2)
        assert 1 <= shift <= 15 and precision == 14
        res = _lpc_residual(sig, coefs, shift)
        assert np.abs(res).mean() < 50  # vs 12000 amplitude

    def test_lpc_degenerate_falls_back(self):
        # constant block -> CONSTANT subframe even with lpc_order set
        sig = np.full(3000, 77, dtype=np.int16)
        dec, _ = decode_flac(encode_flac(sig, 8000, lpc_order=8))
        assert np.array_equal(dec, sig)

    def test_negative_lpc_shift_rejected(self):
        from cardinalityestimation_ray.stages.flac import (
            _BitReader,
            _decode_subframe,
        )

        # craft an LPC subframe with a negative (sign bit set) shift
        from cardinalityestimation_ray.stages.flac import _BitWriter

        w = _BitWriter()
        w.write(0, 1)
        w.write(0b100000, 6)  # LPC order 1
        w.write(0, 1)
        w.write(100, 16)      # warm-up
        w.write(13, 4)        # precision 14
        w.write(0b10000, 5)   # shift = -16
        w.write(1, 14)        # coef
        w.align()
        with pytest.raises(ValueError, match="negative LPC shift"):
            _decode_subframe(_BitReader(w.bytes()), 8, 16)


class TestStereo:
    @pytest.mark.parametrize("mode", ["independent", "left_side",
                                      "right_side", "mid_side"])
    @pytest.mark.parametrize("lpc", [None, 8])
    def test_stereo_lossless_all_modes(self, mode, lpc):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        rng = np.random.default_rng(1)
        t = np.arange(9000)
        base = (9000 * np.sin(t / 31.0)).astype(np.int32)
        left = (base + rng.integers(-60, 60, len(t))) \
            .clip(-32768, 32767).astype(np.int16)
        right = (0.7 * base).astype(np.int16)
        dec, rate = decode_flac(
            encode_flac_stereo(left, right, 44100, mode=mode, lpc_order=lpc))
        assert rate == 44100 and dec.shape == (len(t), 2)
        assert np.array_equal(dec[:, 0], left)
        assert np.array_equal(dec[:, 1], right)

    def test_mid_side_lsb_parity_and_extremes(self):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        # odd L+R forces the dropped-LSB reconstruction; extremes stress
        # the 17-bit side subframe
        left = np.array([-32768, 32767, 1, -1, 0, 101, -100, 32767] * 600,
                        dtype=np.int16)
        right = np.array([32767, -32768, -2, 2, 1, -100, 5, 32766] * 600,
                         dtype=np.int16)
        for mode in ("mid_side", "left_side", "right_side"):
            dec, _ = decode_flac(
                encode_flac_stereo(left, right, 8000, mode=mode))
            assert np.array_equal(dec[:, 0], left), mode
            assert np.array_equal(dec[:, 1], right), mode

    def test_channel_length_mismatch_rejected(self):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        with pytest.raises(ValueError, match="length mismatch"):
            encode_flac_stereo(np.zeros(10, dtype=np.int16),
                               np.zeros(11, dtype=np.int16), 8000)

    def test_unknown_mode_rejected(self):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        with pytest.raises(ValueError, match="unknown stereo mode"):
            encode_flac_stereo(np.zeros(8, dtype=np.int16),
                               np.zeros(8, dtype=np.int16), 8000,
                               mode="dual")

    def test_truncated_stereo_stream_raises(self):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        blob = encode_flac_stereo(
            np.arange(5000, dtype=np.int16),
            np.arange(5000, dtype=np.int16)[::-1].copy(), 16000,
            mode="mid_side")
        with pytest.raises(ValueError):
            decode_flac(blob[:len(blob) // 2])

    def test_corrupt_stereo_crc_raises(self):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        blob = bytearray(encode_flac_stereo(
            np.arange(4000, dtype=np.int16),
            np.arange(4000, dtype=np.int16), 16000))
        blob[-10] ^= 0xFF  # inside the last frame body
        with pytest.raises(ValueError):
            decode_flac(bytes(blob))

    def test_stage_downmixes_stereo(self, ray_session):
        import pyarrow as pa

        from cardinalityestimation_ray.stages.flac import encode_flac_stereo
        from cardinalityestimation_ray.stages.multimodal import (
            AudioFrameSampleStage,
        )

        blob = encode_flac_stereo(np.full(1600, 1000, dtype=np.int16),
                                  np.full(1600, 3000, dtype=np.int16),
                                  16000, mode="mid_side")
        stage = AudioFrameSampleStage(decoder="flac", n_frames=4)
        out = stage(pa.table({"media_id": ["a"],
                              "payload": pa.array([blob], type=pa.binary())}))
        e = np.asarray(out["frame_energy"].to_pylist()[0])
        assert np.allclose(e, 2000 / 32768, rtol=1e-6)


class TestLpcOrderValidation:
    """Round-5 review fix: an out-of-range lpc_order must raise at the
    encode entry point, not silently fall back to FIXED subframes."""

    def test_mono_rejects_bad_order(self):
        from cardinalityestimation_ray.stages.flac import encode_flac

        sig = np.arange(100, dtype=np.int16)
        for bad in (0, -5, 33):
            with pytest.raises(ValueError, match="lpc_order"):
                encode_flac(sig, 8000, lpc_order=bad)

    def test_stereo_rejects_bad_order(self):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        sig = np.arange(100, dtype=np.int16)
        with pytest.raises(ValueError, match="lpc_order"):
            encode_flac_stereo(sig, sig, 8000, lpc_order=40)

    def test_boundary_orders_still_encode(self):
        from cardinalityestimation_ray.stages.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(7)
        sig = rng.integers(-2000, 2000, size=5000).astype(np.int16)
        for order in (1, 32):
            dec, rate = decode_flac(encode_flac(sig, 16000, lpc_order=order))
            assert rate == 16000
            np.testing.assert_array_equal(dec, sig)


class TestEncodeFuzz:
    """Seeded encode→decode fuzz across the full (signal shape, order,
    stereo mode) space — the round-5 review ran this ad hoc; pinned here
    so subframe-selection regressions surface in CI."""

    @pytest.mark.parametrize("seed", range(6))
    def test_mono_random_shapes(self, seed):
        from cardinalityestimation_ray.stages.flac import encode_flac

        rng = np.random.default_rng(1000 + seed)
        n = int(rng.integers(1, 12000))
        kind = seed % 3
        if kind == 0:      # smooth (LPC-friendly)
            sig = (rng.integers(1000, 16000)
                   * np.sin(np.arange(n) / rng.uniform(5, 200))
                   ).astype(np.int16)
        elif kind == 1:    # noise (escape/verbatim paths)
            sig = rng.integers(-32768, 32768, n).astype(np.int16)
        else:              # piecewise constant (CONSTANT subframes)
            sig = np.repeat(rng.integers(-32768, 32768, max(n // 64, 1)),
                            64)[:n].astype(np.int16)
        order = [None, 1, 4, 8, 16, 32][seed]
        dec, rate = decode_flac(encode_flac(sig, 44100, lpc_order=order))
        assert rate == 44100
        np.testing.assert_array_equal(dec, sig)

    @pytest.mark.parametrize("seed", range(4))
    def test_stereo_random_shapes(self, seed):
        from cardinalityestimation_ray.stages.flac import encode_flac_stereo

        rng = np.random.default_rng(2000 + seed)
        n = int(rng.integers(1, 9000))
        left = rng.integers(-32768, 32768, n).astype(np.int16)
        # correlated right channel exercises the side-channel win
        right = np.clip(left.astype(np.int32)
                        + rng.integers(-500, 500, n), -32768, 32767) \
            .astype(np.int16)
        mode = ["independent", "left_side", "right_side", "mid_side"][seed]
        order = [None, 8, 2, 32][seed]
        blob = encode_flac_stereo(left, right, 22050, mode=mode,
                                  lpc_order=order)
        dec, rate = decode_flac(blob)
        assert rate == 22050 and dec.shape == (n, 2)
        np.testing.assert_array_equal(dec[:, 0], left)
        np.testing.assert_array_equal(dec[:, 1], right)
