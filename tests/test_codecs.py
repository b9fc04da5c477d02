"""Pure-numpy media codecs + real-decode multimodal stages: BMP, PCM WAV,
PNG (DEFLATE), IMA ADPCM (compressed audio), BSEQ and MJPEG AVI
(compressed video container) — published byte layouts implemented with
struct/zlib/numpy only.
"""

import numpy as np
import pyarrow as pa
import pytest

from cardinalityestimation_ray.stages.codecs import (
    decode_bmp,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
    resize_nearest,
)


class TestBmp:
    def test_round_trip_exact(self):
        rng = np.random.default_rng(0)
        for h, w in [(1, 1), (3, 5), (16, 16), (31, 33), (64, 7)]:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)

    def test_known_pixel_layout(self):
        # 1x2 image: header 54 bytes, row = B G R B G R + 2 pad bytes
        img = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
        blob = encode_bmp(img)
        assert blob[:2] == b"BM"
        assert blob[54:60] == bytes([3, 2, 1, 6, 5, 4])  # BGR order
        assert len(blob) == 54 + 8  # padded row

    @pytest.mark.parametrize("mutate", [
        lambda b: b[:40],                      # truncated header
        lambda b: b"XX" + b[2:],               # bad magic
        lambda b: b[:-10],                     # truncated pixels
        lambda b: b[:28] + bytes([8, 0]) + b[30:],   # bpp=8
    ])
    def test_adversarial_rejected(self, mutate):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        blob = mutate(encode_bmp(img))
        with pytest.raises(ValueError):
            decode_bmp(blob)

    def test_resize_nearest(self):
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        out = resize_nearest(img, 2, 3)
        assert out.shape == (2, 3, 3)
        assert np.array_equal(out[0, 0], img[0, 0])


class TestWav:
    def test_round_trip_mono(self):
        rng = np.random.default_rng(1)
        samples = rng.integers(-32768, 32768, size=999, dtype=np.int16)
        out, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 16000))
        assert rate == 16000
        assert np.array_equal(out, samples)

    def test_round_trip_stereo(self):
        rng = np.random.default_rng(2)
        samples = rng.integers(-1000, 1000, size=(500, 2), dtype=np.int16)
        out, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 44100))
        assert rate == 44100
        assert out.shape == (500, 2)
        assert np.array_equal(out, samples)

    @pytest.mark.parametrize("mutate", [
        lambda b: b[:8],
        lambda b: b"RIFX" + b[4:],
        lambda b: b[:-20],                      # data chunk truncated
        lambda b: b[:20] + bytes([3, 0]) + b[22:],  # non-PCM format tag
    ])
    def test_adversarial_rejected(self, mutate):
        blob = mutate(encode_wav_pcm16(np.zeros(100, dtype=np.int16), 8000))
        with pytest.raises(ValueError):
            decode_wav_pcm16(blob)


class TestRealDecodeStages:
    def test_image_stage_decodes_real_bmp(self):
        from cardinalityestimation_ray.stages.multimodal import (
            ImageDecodeStage,
            ImageFeatureStage,
        )

        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
                for _ in range(4)]
        # one solid-red image to pin the channel order through the pipeline
        solid = np.zeros((48, 40, 3), dtype=np.uint8)
        solid[:, :, 0] = 200
        imgs.append(solid)
        batch = pa.table({
            "media_id": pa.array([f"m{i}" for i in range(5)]),
            "payload": pa.array([encode_bmp(im) for im in imgs],
                                type=pa.binary()),
            "width": pa.array([40] * 5, type=pa.int32()),
            "height": pa.array([48] * 5, type=pa.int32()),
        })
        decoded = ImageDecodeStage(decoder="bmp", out_size=16)(batch)
        col = decoded["image"].combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        out = flat.reshape(5, 16, 16, 3)
        # nearest-neighbor of the original == stage output
        want = resize_nearest(imgs[0], 16, 16)
        assert np.array_equal(out[0], want)
        # solid red stays solid red (channel order survived BGR round trip)
        assert (out[4][:, :, 0] == 200).all() and (out[4][:, :, 1:] == 0).all()

        feats = ImageFeatureStage(out_size=16)(decoded)
        fcol = feats["features"].combine_chunks()
        fmat = fcol.values.to_numpy(zero_copy_only=False).reshape(5, 6)
        assert abs(fmat[4, 0] - 200.0) < 1e-3  # mean R of the solid image
        assert abs(fmat[4, 1]) < 1e-3          # mean G

    def test_audio_stage_real_wav_energies(self):
        from cardinalityestimation_ray.stages.multimodal import (
            AudioFrameSampleStage,
        )

        # first half silence, second half full-scale square wave
        n = 16000
        samples = np.zeros(n, dtype=np.int16)
        samples[n // 2:] = 30000
        batch = pa.table({
            "media_id": pa.array(["a"]),
            "payload": pa.array([encode_wav_pcm16(samples, 16000)],
                                type=pa.binary()),
        })
        out = AudioFrameSampleStage(decoder="wav", n_frames=8)(batch)
        energies = out["frame_energy"].combine_chunks().values.to_numpy(
            zero_copy_only=False)
        assert np.allclose(energies[:4], 0.0, atol=1e-6)
        assert np.all(energies[4:] > 0.8)

    def test_media_pipeline_end_to_end_bmp(self, ray_session):
        import ray.data

        from cardinalityestimation_ray.stages.multimodal import (
            ImageDecodeStage,
            ImageFeatureStage,
        )

        rng = np.random.default_rng(5)
        rows = []
        for i in range(40):
            img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
            rows.append({"media_id": f"m{i:03d}", "payload": encode_bmp(img),
                         "width": 24, "height": 24})
        ds = ray.data.from_items(rows)
        decoded = ds.map_batches(
            ImageDecodeStage, batch_format="pyarrow", batch_size=8,
            fn_constructor_kwargs={"decoder": "bmp", "out_size": 16},
            concurrency=2, num_cpus=1)
        feats = decoded.map_batches(
            ImageFeatureStage, batch_format="pyarrow", batch_size=8,
            fn_constructor_kwargs={"out_size": 16},
            concurrency=2, num_cpus=1).to_pandas()
        assert len(feats) == 40
        assert set(feats["media_id"]) == {f"m{i:03d}" for i in range(40)}


class TestBmpSeq:
    def test_round_trip_random_access(self):
        from cardinalityestimation_ray.stages.codecs import (
            bmpseq_info,
            decode_bmpseq_frame,
            encode_bmpseq,
        )

        rng = np.random.default_rng(6)
        frames = rng.integers(0, 256, size=(10, 12, 14, 3), dtype=np.uint8)
        blob = encode_bmpseq(frames, fps=10)
        n, fps, offsets = bmpseq_info(blob)
        assert n == 10 and fps == 10
        for i in (0, 3, 9):
            assert np.array_equal(decode_bmpseq_frame(blob, i), frames[i])
        with pytest.raises(ValueError):
            decode_bmpseq_frame(blob, 10)

    @pytest.mark.parametrize("mutate", [
        lambda b: b[:8],
        lambda b: b"NOPE" + b[4:],
        lambda b: b[:200],  # truncated frames
    ])
    def test_adversarial(self, mutate):
        from cardinalityestimation_ray.stages.codecs import (
            bmpseq_info,
            decode_bmpseq_frame,
            encode_bmpseq,
        )

        frames = np.zeros((3, 8, 8, 3), dtype=np.uint8)
        blob = mutate(encode_bmpseq(frames))
        with pytest.raises(ValueError):
            n, _, _ = bmpseq_info(blob)
            for i in range(n):
                decode_bmpseq_frame(blob, i)

    def test_video_stage_real_decode(self):
        from cardinalityestimation_ray.stages.codecs import encode_bmpseq
        from cardinalityestimation_ray.stages.multimodal import (
            VideoFrameSampleStage,
        )

        # 20-frame "video": first half black, second half solid red
        frames = np.zeros((20, 16, 16, 3), dtype=np.uint8)
        frames[10:, :, :, 0] = 255
        blob = encode_bmpseq(frames, fps=5)
        batch = pa.table({
            "media_id": pa.array(["v0"]),
            "payload": pa.array([blob], type=pa.binary()),
            "duration_ms": pa.array([4000], type=pa.int32()),
        })
        out = VideoFrameSampleStage(decoder="bmpseq", n_frames=4,
                                    feature_dim=12)(batch)
        feats = out["frame_features"].combine_chunks().values.to_numpy(
            zero_copy_only=False).reshape(4, 12)
        ts = out["frame_ts_ms"].combine_chunks().values.to_numpy(
            zero_copy_only=False)
        # frames 0,5 black; 10,15 red — R channel (every 3rd feature) flips
        assert np.allclose(feats[0], 0)
        assert np.allclose(feats[3][0::3], 1.0) and np.allclose(feats[3][1::3], 0.0)
        assert list(ts) == [0, 1000, 2000, 3000]


# ---------------------------------------------------------------------------
# PNG


class TestPNG:
    def test_roundtrip_gray_rgb_rgba(self):
        import numpy as np

        from cardinalityestimation_ray.stages.codecs import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(31)
        for shape in [(1, 1), (5, 7), (16, 16, 3), (9, 4, 4), (32, 32, 3)]:
            img = rng.integers(0, 256, size=shape).astype(np.uint8)
            out = decode_png(encode_png(img))
            assert out.shape == img.shape
            assert (out == img).all()

    def test_all_filter_types_against_spec_forward_filter(self):
        """decode must invert each RFC 2083 filter; rows are FORWARD
        filtered here by an independent straight-from-spec implementation,
        so the defilter paths (incl. Sub's cumsum trick and the sequential
        Average/Paeth) are checked against ground truth, not against our
        own encoder (which only emits filter 0)."""
        import struct
        import zlib

        import numpy as np

        from cardinalityestimation_ray.stages.codecs import decode_png

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            if pa_ <= pb and pa_ <= pc_:
                return a
            return b if pb <= pc_ else c

        rng = np.random.default_rng(77)
        h, w, chans = 6, 5, 3
        img = rng.integers(0, 256, size=(h, w * chans)).astype(np.uint8)
        filters = [0, 1, 2, 3, 4, 1]
        rows = []
        for y, ftype in enumerate(filters):
            cur = img[y].astype(int)
            prev = img[y - 1].astype(int) if y else np.zeros(w * chans, int)
            raw = np.empty(w * chans, dtype=np.uint8)
            for x in range(w * chans):
                a = cur[x - chans] if x >= chans else 0
                b = prev[x]
                c = prev[x - chans] if x >= chans else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    pred = paeth(a, b, c)
                raw[x] = (cur[x] - pred) & 0xFF
            rows.append(bytes([ftype]) + raw.tobytes())
        idat = zlib.compress(b"".join(rows))

        def chunk(typ, payload):
            return (struct.pack(">I", len(payload)) + typ + payload +
                    struct.pack(">I", zlib.crc32(typ + payload)))

        png = (b"\x89PNG\r\n\x1a\n" +
               chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)) +
               chunk(b"IDAT", idat) + chunk(b"IEND", b""))
        out = decode_png(png)
        assert (out.reshape(h, w * chans) == img).all()

    def test_adversarial_pngs_raise(self):
        import numpy as np
        import pytest

        from cardinalityestimation_ray.stages.codecs import (
            decode_png,
            encode_png,
        )

        good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_png(b"notapng")
        with pytest.raises(ValueError):
            decode_png(good[:20])  # truncated
        bad_crc = bytearray(good)
        bad_crc[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(bad_crc))
        # corrupt the deflate stream (keep chunk CRC consistent)
        import struct
        import zlib

        ihdr_end = 8 + 12 + 13
        (idat_len,) = struct.unpack_from(">I", good, ihdr_end)
        payload = bytearray(good[ihdr_end + 8:ihdr_end + 8 + idat_len])
        payload[0] ^= 0xFF
        rebuilt = (good[:ihdr_end] + struct.pack(">I", idat_len) + b"IDAT" +
                   bytes(payload) +
                   struct.pack(">I", zlib.crc32(b"IDAT" + bytes(payload))) +
                   good[ihdr_end + 12 + idat_len:])
        with pytest.raises(ValueError):
            decode_png(rebuilt)

    def test_decode_stage_accepts_png(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from cardinalityestimation_ray.stages.codecs import encode_png
        from cardinalityestimation_ray.stages.multimodal import (
            ImageDecodeStage,
        )

        rng = np.random.default_rng(5)
        rows = []
        for i in range(6):
            img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
            rows.append({"media_id": i, "payload": encode_png(img),
                         "width": 16, "height": 16})
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        out = ds.map_batches(ImageDecodeStage(decoder="png", out_size=16),
                             batch_size=4, concurrency=1,
                             batch_format="pyarrow").to_pandas()
        assert len(out) == 6
        assert (out["width"] == 16).all()


# ---------------------------------------------------------------------------
# IMA ADPCM WAV


class TestADPCM:
    def test_constant_signal_exact(self):
        import numpy as np

        from cardinalityestimation_ray.stages.codecs import (
            decode_wav_adpcm,
            encode_wav_adpcm,
        )

        for amp in (-32768, -1234, 0, 1, 1234, 32767):
            sig = np.full(1511, amp, dtype=np.int16)
            dec, rate = decode_wav_adpcm(encode_wav_adpcm(sig, 8000))
            assert rate == 8000
            assert len(dec) == len(sig)
            assert (dec == amp).all(), amp

    def test_sine_tracks_closely(self):
        import numpy as np

        from cardinalityestimation_ray.stages.codecs import (
            decode_wav_adpcm,
            encode_wav_adpcm,
        )

        t = np.arange(4000)
        sig = (8000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
        dec, _ = decode_wav_adpcm(encode_wav_adpcm(sig, 16000))
        err = np.abs(dec.astype(int) - sig.astype(int))
        assert err.mean() < 100  # ~0.3% of amplitude for a smooth signal

    def test_partial_final_block_length_preserved(self):
        import numpy as np

        from cardinalityestimation_ray.stages.codecs import (
            decode_wav_adpcm,
            encode_wav_adpcm,
        )

        sig = np.arange(-300, 300, dtype=np.int16)  # 600 % 505 != 0
        dec, _ = decode_wav_adpcm(encode_wav_adpcm(sig, 8000))
        assert len(dec) == len(sig)  # fact chunk trims block padding

    def test_adversarial(self):
        import numpy as np
        import pytest

        from cardinalityestimation_ray.stages.codecs import (
            decode_wav_adpcm,
            decode_wav_pcm16,
            encode_wav_adpcm,
            encode_wav_pcm16,
        )

        good = encode_wav_adpcm(np.zeros(100, dtype=np.int16), 8000)
        with pytest.raises(ValueError):
            decode_wav_adpcm(good[:16])
        # cross-format confusion raises actionably both ways
        pcm = encode_wav_pcm16(np.zeros(100, dtype=np.int16), 8000)
        with pytest.raises(ValueError, match="fmt|format"):
            decode_wav_adpcm(pcm)
        with pytest.raises(ValueError, match="PCM-16|format"):
            decode_wav_pcm16(good)
        with pytest.raises(ValueError):
            encode_wav_adpcm(np.zeros((2, 5), dtype=np.int16), 8000)
        with pytest.raises(ValueError):
            encode_wav_adpcm(np.zeros(10, dtype=np.float32), 8000)

    def test_audio_stage_accepts_adpcm(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from cardinalityestimation_ray.stages.codecs import encode_wav_adpcm
        from cardinalityestimation_ray.stages.multimodal import (
            AudioFrameSampleStage,
        )

        rows = []
        for i in range(4):
            sig = np.full(1600, 100 * (i + 1), dtype=np.int16)
            rows.append({"media_id": i,
                         "payload": encode_wav_adpcm(sig, 16000)})
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        out = ds.map_batches(AudioFrameSampleStage(decoder="adpcm",
                                                   n_frames=8),
                             batch_size=2, concurrency=1,
                             batch_format="pyarrow").to_pandas()
        e = np.stack(out["frame_energy"])
        expect = (np.arange(1, 5) * 100 / 32768.0)[:, None]
        assert np.allclose(e, np.broadcast_to(expect, e.shape), atol=1e-6)


# ---------------------------------------------------------------------------
# MJPEG AVI


class TestMjpegAvi:
    def test_roundtrip_uniform_frames_exact(self):
        import numpy as np

        from cardinalityestimation_ray.stages.codecs import (
            avi_mjpeg_info,
            decode_avi_mjpeg_frame,
            encode_avi_mjpeg,
        )

        frames = np.stack([np.full((16, 16, 3), v * 2, dtype=np.uint8)
                           for v in range(6)])
        blob = encode_avi_mjpeg(frames, fps=12)
        n, fps, offs, sizes, _ = avi_mjpeg_info(blob)
        assert (n, fps) == (6, 12)
        for i in (0, 3, 5):  # even uniform values are DC-exact under JPEG
            assert (decode_avi_mjpeg_frame(blob, i) == frames[i]).all()

    def test_random_frames_lossy_but_structural(self):
        import numpy as np

        from cardinalityestimation_ray.stages.codecs import (
            decode_avi_mjpeg_frame,
            encode_avi_mjpeg,
        )

        rng = np.random.default_rng(8)
        frames = rng.integers(0, 256, size=(3, 24, 16, 3)).astype(np.uint8)
        blob = encode_avi_mjpeg(frames, fps=5)
        out = decode_avi_mjpeg_frame(blob, 1)
        assert out.shape == (24, 16, 3)

    def test_adversarial(self):
        import numpy as np
        import pytest

        from cardinalityestimation_ray.stages.codecs import (
            avi_mjpeg_info,
            decode_avi_mjpeg_frame,
            encode_avi_mjpeg,
        )

        frames = np.zeros((2, 8, 8, 3), dtype=np.uint8)
        good = encode_avi_mjpeg(frames)
        with pytest.raises(ValueError):
            avi_mjpeg_info(b"RIFFxxxxWAVE")
        with pytest.raises(ValueError):
            avi_mjpeg_info(good[:60])
        with pytest.raises(ValueError):
            decode_avi_mjpeg_frame(good, 2)
        with pytest.raises(ValueError):
            encode_avi_mjpeg(np.zeros((0, 8, 8, 3), dtype=np.uint8))

    def test_video_stage_mjpeg(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from cardinalityestimation_ray.stages.codecs import encode_avi_mjpeg
        from cardinalityestimation_ray.stages.multimodal import (
            VideoFrameSampleStage,
        )

        rows = []
        for i in range(3):
            frames = np.stack([np.full((16, 16, 3), 2 * (10 * i + f),
                                       dtype=np.uint8) for f in range(8)])
            rows.append({"media_id": i,
                         "payload": encode_avi_mjpeg(frames, fps=4),
                         "duration_ms": 2000})
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        out = ds.map_batches(
            VideoFrameSampleStage(decoder="mjpeg", n_frames=4,
                                  feature_dim=12),
            batch_size=2, concurrency=1, batch_format="pyarrow").to_pandas()
        assert len(out) == 3
        # first sampled frame of media 1 is uniform 20 -> features 20/255
        feats = np.stack(out.sort_values("media_id")["frame_features"])
        assert np.allclose(feats[1].reshape(4, 12)[0], 20 / 255.0, atol=1e-3)


def test_all_decoders_fuzz_raise_valueerror_only():
    """Exception hygiene across every media decoder: random byte flips,
    truncations and garbage must raise ValueError — never IndexError /
    struct.error / OverflowError (found by fuzzing: corrupt DHT tables
    could define 200+-bit magnitude categories) — and never hang."""
    import numpy as np

    from cardinalityestimation_ray.stages.codecs import (
        decode_avi_mjpeg_frame,
        decode_bmp,
        decode_bmpseq_frame,
        decode_png,
        decode_wav_adpcm,
        decode_wav_pcm16,
        encode_avi_mjpeg,
        encode_bmp,
        encode_bmpseq,
        encode_png,
        encode_wav_adpcm,
        encode_wav_pcm16,
    )
    from cardinalityestimation_ray.stages.flac import (
        decode_flac,
        encode_flac,
    )
    from cardinalityestimation_ray.stages.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    sig = (1000 * np.sin(np.arange(2000) / 10)).astype(np.int16)
    frames = np.stack([img] * 3)
    decoders = [
        (encode_jpeg(img), decode_jpeg),
        (encode_png(img), decode_png),
        (encode_bmp(img), decode_bmp),
        (encode_flac(sig, 8000), decode_flac),
        (encode_wav_adpcm(sig, 8000), decode_wav_adpcm),
        (encode_wav_pcm16(sig, 8000), decode_wav_pcm16),
        (encode_avi_mjpeg(frames), lambda d: decode_avi_mjpeg_frame(d, 0)),
        (encode_bmpseq(frames), lambda d: decode_bmpseq_frame(d, 0)),
    ]
    for blob, dec in decoders:
        blob = bytearray(blob)
        for trial in range(120):
            m = bytearray(blob)
            kind = trial % 4
            if kind == 0:
                m[rng.integers(0, len(m))] ^= int(rng.integers(1, 256))
            elif kind == 1:
                m = m[:rng.integers(0, len(m))]
            elif kind == 2:
                for _ in range(5):
                    m[rng.integers(0, len(m))] ^= int(rng.integers(1, 256))
            else:
                m = bytearray(rng.integers(
                    0, 256, size=int(rng.integers(0, 300)))
                    .astype(np.uint8).tobytes())
            try:
                dec(bytes(m))
            except ValueError:
                pass  # the only acceptable failure mode


def test_png_gray_alpha_through_stage():
    """Colortype-4 (gray+alpha) PNGs must normalize to the stage's fixed
    3-channel schema instead of crashing the actor (review fix)."""
    import numpy as np
    import pyarrow as pa

    from cardinalityestimation_ray.stages.codecs import encode_png
    from cardinalityestimation_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(2)
    ga = rng.integers(0, 256, size=(16, 16, 2)).astype(np.uint8)
    # no gray+alpha encoder path: craft via the RGBA encoder? colortype 4
    # isn't emitted by encode_png, so build it from a decoded-gray check:
    # decode-side normalization is what matters — feed a (H, W, 2) image
    # through _decode_one's shape handling via a hand-built PNG.
    import struct
    import zlib

    h, w = 16, 16
    raw = np.empty((h, 1 + w * 2), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = ga.reshape(h, w * 2)

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload +
                struct.pack(">I", zlib.crc32(typ + payload)))

    png = (b"\x89PNG\r\n\x1a\n" +
           chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0)) +
           chunk(b"IDAT", zlib.compress(raw.tobytes())) +
           chunk(b"IEND", b""))
    batch = pa.table({
        "media_id": pa.array(["x"]),
        "payload": pa.array([png], type=pa.binary()),
        "width": pa.array([16], type=pa.int32()),
        "height": pa.array([16], type=pa.int32()),
    })
    out = ImageDecodeStage(decoder="png", out_size=16)(batch)
    img = out["image"].combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(16, 16, 3)
    assert (img[:, :, 0] == ga[:, :, 0]).all()  # luma channel replicated
    assert (img[:, :, 1] == img[:, :, 0]).all()


def test_adpcm_short_fact_chunk_rejected():
    import numpy as np
    import pytest

    from cardinalityestimation_ray.stages.codecs import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    good = bytearray(encode_wav_adpcm(np.zeros(100, dtype=np.int16), 8000))
    i = bytes(good).find(b"fact")
    truncated = bytes(good[:i]) + b"fact" + (0).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_wav_adpcm(truncated)


def test_image_feature_stage_validates_out_size():
    """The 8x8 phash pooling needs a multiple-of-8 edge: a bad out_size must
    fail loudly at construction, not as an opaque reshape error inside a Ray
    actor task."""
    import pytest

    from cardinalityestimation_ray.stages.multimodal import ImageFeatureStage

    for bad in (20, 7, 0, 12):
        with pytest.raises(ValueError, match="multiple of 8"):
            ImageFeatureStage(out_size=bad)
    ImageFeatureStage(out_size=16)  # valid sizes unchanged
