"""ISO-BMFF MP4 container: roundtrip across chunk-boundary frame counts,
sample-table integrity, adversarial/fuzzed inputs (ValueError only), and
the actor-pool video stage end-to-end."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from cardinalityestimation_ray.stages.mp4 import (
    _SAMPLES_PER_CHUNK,
    decode_mp4_mjpeg_frame,
    encode_mp4_mjpeg,
    mp4_mjpeg_info,
)


def _uniform_video(n, value=100, size=16):
    return np.full((n, size, size, 3), value, np.uint8)


@pytest.mark.parametrize("n", [1, 3, _SAMPLES_PER_CHUNK,
                               _SAMPLES_PER_CHUNK + 1, 9, 17])
def test_roundtrip_dc_exact(n):
    frames = np.stack([np.full((16, 16, 3), (i * 2) % 256, np.uint8)
                       for i in range(n)])
    blob = encode_mp4_mjpeg(frames, fps=4)
    total, fps, offs, sizes = mp4_mjpeg_info(blob)
    assert (total, fps) == (n, 4)
    assert np.all(np.diff(offs) > 0) and np.all(sizes > 0)
    for i in range(n):
        img = decode_mp4_mjpeg_frame(blob, i)
        assert img.shape == (16, 16, 3)
        assert np.all(img == (i * 2) % 256)


def test_sample_offsets_point_at_jpeg_soi():
    blob = encode_mp4_mjpeg(_uniform_video(7), fps=25)
    _, _, offs, sizes = mp4_mjpeg_info(blob)
    for o, s in zip(offs, sizes):
        sample = blob[int(o):int(o + s)]
        assert sample[:2] == b"\xff\xd8" and sample[-2:] == b"\xff\xd9"


def test_bad_inputs_raise_valueerror():
    blob = encode_mp4_mjpeg(_uniform_video(5), fps=4)
    cases = [
        b"", b"\x00" * 15,
        b"\x00\x00\x00\x08mdat" + blob[8:],      # first box not ftyp
        blob[:40],                                 # truncated mid-mdat
        blob[:len(blob) - 30],                     # truncated moov
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            mp4_mjpeg_info(bad)
    with pytest.raises(ValueError):
        decode_mp4_mjpeg_frame(blob, 5)   # out of range
    with pytest.raises(ValueError):
        decode_mp4_mjpeg_frame(blob, -1)
    with pytest.raises(ValueError):
        encode_mp4_mjpeg(np.zeros((0, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_mp4_mjpeg(np.zeros((2, 8, 8), np.uint8))


def test_largesize_and_nonjpeg_track_rejected_with_reason():
    blob = bytearray(encode_mp4_mjpeg(_uniform_video(2), fps=4))
    # corrupt the ftyp size field into the 64-bit largesize marker
    struct.pack_into(">I", blob, 0, 1)
    with pytest.raises(ValueError, match="largesize"):
        mp4_mjpeg_info(bytes(blob))

    blob = bytearray(encode_mp4_mjpeg(_uniform_video(2), fps=4))
    i = bytes(blob).index(b"jpeg")
    blob[i:i + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1"):
        mp4_mjpeg_info(bytes(blob))


def test_short_leaf_box_raises_not_misparses():
    # review fix: a well-sized but too-short leaf box must raise instead of
    # silently reading the neighboring box's bytes as field values
    from cardinalityestimation_ray.stages.mp4 import _box, _full

    mdhd = _full(b"mdhd", 0, 0, b"")  # declared size 12: no timescale field
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"X\x00")
    mdia = _box(b"mdia", mdhd + hdlr)
    moov = _box(b"moov", _box(b"trak", mdia))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    with pytest.raises(ValueError, match="mdhd box too short"):
        mp4_mjpeg_info(ftyp + moov)


def test_fuzz_never_escapes_valueerror():
    blob = encode_mp4_mjpeg(_uniform_video(5), fps=4)
    rng = random.Random(7)
    for _ in range(300):
        b = bytearray(blob)
        mode = rng.randrange(3)
        if mode == 0:
            b = b[:rng.randrange(len(b))]
        elif mode == 1:
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(b))
            del b[i:i + rng.randrange(1, 40)]
        try:
            mp4_mjpeg_info(bytes(b))
            decode_mp4_mjpeg_frame(bytes(b), 0)
        except ValueError:
            pass


def test_video_stage_end_to_end(ray_session):
    import pyarrow as pa
    import ray.data

    from cardinalityestimation_ray.stages.multimodal import (
        VideoFrameSampleStage,
    )

    payloads = [encode_mp4_mjpeg(_uniform_video(6, value=2 * k), fps=3)
                for k in range(4)]
    tbl = pa.table({
        "media_id": [str(k) for k in range(4)],
        "payload": pa.array(payloads, type=pa.binary()),
        "duration_ms": pa.array([2000] * 4, type=pa.int32()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(VideoFrameSampleStage,
                        fn_constructor_kwargs={"decoder": "mp4",
                                               "n_frames": 3,
                                               "feature_dim": 12},
                        batch_size=2, concurrency=(1, 2),
                        batch_format="pyarrow")
           .to_pandas())
    assert len(out) == 4
    for _, row in out.iterrows():
        k = int(row["media_id"])
        feats = np.asarray(row["frame_features"])
        assert feats.shape == (3 * 12,)
        np.testing.assert_allclose(feats, (2 * k) / 255.0, atol=1e-6)


def test_stsz_sample_count_bounded_before_allocation():
    """A KB-size file claiming 10^7 uniform samples must raise ValueError
    immediately (validate-before-allocate), not burn seconds of allocation
    or escape the fuzz contract via MemoryError."""
    import struct
    import time

    frames = np.full((3, 16, 16, 3), 128, np.uint8)
    data = bytearray(encode_mp4_mjpeg(frames, fps=5))
    i = bytes(data).find(b"stsz")
    struct.pack_into(">I", data, i + 8, 1)            # uniform size 1
    struct.pack_into(">I", data, i + 12, 10_000_000)  # sample_count
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="more sample bytes"):
        mp4_mjpeg_info(bytes(data))
    assert time.monotonic() - t0 < 0.5
