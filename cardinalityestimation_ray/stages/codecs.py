"""Pure-numpy media codecs for uncompressed formats.

BMP (BITMAPINFOHEADER, 24-bit BI_RGB) and WAV (RIFF PCM-16) are published
byte layouts decodable with struct + numpy alone — no imaging/audio
libraries required. These give the multimodal stages REAL decode paths in
this container (compressed formats — JPEG/PNG/FLAC/MP4 — still need the
external libs and stay behind NotImplementedError in multimodal.py).

Both decoders validate bounds before trusting header-declared sizes
(truncated/garbage input raises ValueError, mirroring the sketch
deserializers' DoS hardening).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BI_RGB), bottom-up row order, 4-byte row padding


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pixel_bytes = row_bytes * h
    # BGR channel order, bottom-up rows, rows padded to 4 bytes
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0,
                              14 + 40)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              pixel_bytes, 2835, 2835, 0, 0)
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (H, W, 3) uint8 RGB array."""
    if len(data) < 54:
        raise ValueError("truncated BMP: shorter than headers")
    magic, _file_size, _r1, _r2, data_offset = struct.unpack_from("<2sIHHI",
                                                                  data, 0)
    if magic != b"BM":
        raise ValueError("invalid BMP: bad magic")
    (hdr_size, w, h, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} "
            f"compression={compression} (only 24-bit BI_RGB)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    row_bytes = (w * 3 + 3) & ~3
    need = data_offset + row_bytes * h
    if data_offset < 54 or need > len(data):
        raise ValueError(
            f"truncated BMP: need {need} bytes for {w}x{h}, have {len(data)}")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h,
                         offset=data_offset).reshape(h, row_bytes)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# WAV — RIFF container, PCM 16-bit little-endian


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int,
                     n_channels: int = 1) -> bytes:
    """Encode int16 samples (mono: (n,); multi: (n, channels)) as PCM WAV."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        interleaved = samples
    elif samples.ndim == 2:
        n_channels = samples.shape[1]
        interleaved = samples.reshape(-1)
    else:
        raise ValueError("samples must be 1-D or 2-D")
    payload = interleaved.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
                      byte_rate, block_align, 16)
    data = struct.pack("<4sI", b"data", len(payload)) + payload
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV. Returns (samples int16 (n,) or (n, ch), rate)."""
    if len(data) < 12:
        raise ValueError("truncated WAV: shorter than RIFF header")
    riff, _size, wave = struct.unpack_from("<4sI4s", data, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("invalid WAV: bad RIFF/WAVE magic")
    pos = 12
    sample_rate = None
    n_channels = None
    payload = None
    while pos + 8 <= len(data):
        chunk_id, chunk_size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if pos + chunk_size > len(data):
            raise ValueError(
                f"truncated WAV: chunk {chunk_id!r} declares {chunk_size} "
                f"bytes past end of input")
        if chunk_id == b"fmt ":
            if chunk_size < 16:
                raise ValueError("invalid WAV: fmt chunk too small")
            (audio_fmt, n_channels, sample_rate, _br, _ba,
             bits) = struct.unpack_from("<HHIIHH", data, pos)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={audio_fmt} bits={bits} "
                    f"(only PCM-16)")
        elif chunk_id == b"data":
            payload = data[pos:pos + chunk_size]
        pos += chunk_size + (chunk_size & 1)  # chunks are word-aligned
    if sample_rate is None or payload is None:
        raise ValueError("invalid WAV: missing fmt or data chunk")
    samples = np.frombuffer(payload, dtype="<i2")
    if n_channels > 1:
        samples = samples[:len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels)
    return samples.astype(np.int16), int(sample_rate)


# ---------------------------------------------------------------------------
# vectorized nearest-neighbor resize (the post-decode step in the image stage)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) via two index gathers."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h)
    ci = (np.arange(out_w) * w // out_w)
    return img[ri][:, ci]


# ---------------------------------------------------------------------------
# BSEQ — a minimal MJPEG-style video container holding independent BMP
# frames (length-prefixed, with a seekable offset index). Every byte of
# pixel data decodes through the published BMP layout above, so frame
# sampling is a REAL decode path; only inter-frame compression (H.264 etc.)
# needs external libs.

_BSEQ_MAGIC = b"BSQ1"


def encode_bmpseq(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, H, W, 3) uint8 frames as a BMP-sequence container:
    [magic][u32 n_frames][u32 fps][u64 offset x n][BMP blob x n]."""
    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(
            f"expected (n, H, W, 3) uint8, got {frames.shape} {frames.dtype}")
    blobs = [encode_bmp(f) for f in frames]
    n = len(blobs)
    header_len = 4 + 4 + 4 + 8 * n
    offsets = []
    pos = header_len
    for b in blobs:
        offsets.append(pos)
        pos += len(b)
    head = _BSEQ_MAGIC + struct.pack("<II", n, fps)
    head += struct.pack(f"<{n}Q", *offsets) if n else b""
    return head + b"".join(blobs)


def bmpseq_info(data: bytes) -> tuple[int, int, np.ndarray]:
    """(n_frames, fps, offsets) with bounds validation."""
    if len(data) < 12:
        raise ValueError("truncated BSEQ: shorter than header")
    if data[:4] != _BSEQ_MAGIC:
        raise ValueError("invalid BSEQ: bad magic")
    n, fps = struct.unpack_from("<II", data, 4)
    if n > 1 << 24:
        raise ValueError(f"invalid BSEQ: {n} frames")
    need = 12 + 8 * n
    if len(data) < need:
        raise ValueError("truncated BSEQ: offset index past end")
    offsets = np.frombuffer(data, dtype="<u8", count=n, offset=12)
    if n and (offsets.min() < need or offsets.max() >= len(data)):
        raise ValueError("invalid BSEQ: frame offset out of bounds")
    return n, fps, offsets.astype(np.int64)


def decode_bmpseq_frame(data: bytes, index: int) -> np.ndarray:
    """Decode one frame (random access via the offset index)."""
    n, _fps, offsets = bmpseq_info(data)
    if not (0 <= index < n):
        raise ValueError(f"frame index {index} out of range [0, {n})")
    end = int(offsets[index + 1]) if index + 1 < n else len(data)
    return decode_bmp(data[int(offsets[index]):end])
