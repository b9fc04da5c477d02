"""Pure-numpy media codecs for uncompressed formats.

BMP (BITMAPINFOHEADER, 24-bit BI_RGB) and WAV (RIFF PCM-16) are published
byte layouts decodable with struct + numpy alone — no imaging/audio
libraries required. These give the multimodal stages REAL decode paths in
this container; PNG (DEFLATE) lives below, baseline JPEG (DCT + Huffman)
in stages/jpeg.py — compressed AUDIO/VIDEO (FLAC/MP4) still need external
libs and stay behind NotImplementedError in multimodal.py.

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


# ---------------------------------------------------------------------------
# PNG — 8-bit gray/RGB/RGBA, non-interlaced. A REAL compressed-image codec
# using only stdlib zlib + numpy (RFC 2083): chunk stream with CRC
# validation, zlib-inflated scanlines, all five defilter types. This
# upgrades the multimodal image stage from "compressed formats stubbed" to
# a real DEFLATE-compressed path; JPEG (stages/jpeg.py), FLAC
# (stages/flac.py) and the MP4 container (stages/mp4.py) are real too —
# only H.264 (motion-compensated entropy decoding) stays out of scope.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples/pixel


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA uint8 as PNG
    (filter 0 rows, one zlib IDAT)."""
    import zlib

    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {img.dtype}")
    if img.ndim == 2:
        colortype, chans = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        colortype, chans = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        colortype, chans = 6, 4
    else:
        raise ValueError(f"expected (H,W)/(H,W,3)/(H,W,4), got {img.shape}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # filter byte 0 per row
    raw = np.empty((h, 1 + w * chans), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * chans)
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        import zlib as _z

        return (struct.pack(">I", len(payload)) + typ + payload +
                struct.pack(">I", _z.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) +
            chunk(b"IEND", b""))


def _png_defilter(flt: np.ndarray, h: int, w: int, chans: int) -> np.ndarray:
    """Reverse PNG row filters. flt: (h, 1 + w*chans) filter-byte + data."""
    stride = w * chans
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(flt[y, 0])
        row = flt[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            # per-channel prefix sum mod 256 (vectorized along the row)
            r = row.reshape(w, chans).astype(np.uint64)
            out[y] = np.cumsum(r, axis=0).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = row + prev
        elif ftype == 3:  # Average — left-dependent, sequential per pixel
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - chans]) if x >= chans else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — left-dependent, sequential per pixel
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - chans]) if x >= chans else 0
                b = int(prev[x])
                c = int(prev[x - chans]) if x >= chans else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype} in row {y}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W) gray or (H, W, C).

    Validates signature, chunk CRCs, header-declared sizes against actual
    payload (the sketch deserializers' DoS rules), and the inflated length.
    Supports colortypes 0/2/4/6 at bit depth 8; rejects palette (3),
    16-bit, and interlaced images with actionable errors.
    """
    import zlib

    if len(data) < len(_PNG_SIG) + 25 or data[:8] != _PNG_SIG:
        raise ValueError("invalid PNG: bad signature or truncated")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        if length > len(data) - pos - 12:
            raise ValueError("truncated PNG: chunk length past end")
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"invalid PNG: bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = payload
        elif typ == b"IDAT":
            idat.extend(payload)
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None or not seen_end:
        raise ValueError("invalid PNG: missing IHDR or IEND")
    if len(ihdr) != 13:
        raise ValueError("invalid PNG: IHDR length")
    w, h, depth, colortype, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if colortype == 3:
        raise ValueError("unsupported PNG: palette images (colortype 3)")
    if colortype not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG colortype {colortype}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("unsupported PNG: Adam7 interlacing")
    if not (0 < w <= 1 << 15 and 0 < h <= 1 << 15):
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    chans = _PNG_CHANNELS[colortype]
    expect = h * (1 + w * chans)
    try:
        # bound the inflate at expect+1 bytes: a crafted high-ratio DEFLATE
        # stream with a huge IHDR must not allocate gigabytes before the
        # size check (the module's validate-before-trusting DoS rule)
        dobj = zlib.decompressobj()
        raw = dobj.decompress(bytes(idat), expect + 1)
    except zlib.error as e:
        raise ValueError(f"invalid PNG: corrupt IDAT ({e})") from None
    if len(raw) != expect or not dobj.eof or dobj.unconsumed_tail:
        raise ValueError(
            f"invalid PNG: inflated {len(raw)} bytes, expected {expect}")
    flt = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * chans)
    out = _png_defilter(flt, h, w, chans)
    return out.reshape(h, w) if chans == 1 else out.reshape(h, w, chans)


# ---------------------------------------------------------------------------
# IMA ADPCM WAV (format tag 0x0011) — a REAL compressed-audio codec using
# only the published DVI/IMA integer tables (4-bit codes, 4:1 compression):
# per-block predictor+index header, nibble-packed codes, standard step and
# index-adaptation tables. Correctness-first sequential Python loops (the
# format is inherently sample-sequential); decode runs inside actor-pool
# stages where the image/audio item is the parallelism unit.

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)


def _ima_step(predictor: int, index: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (new predictor, new index)."""
    step = int(_IMA_STEP_TABLE[index])
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    predictor = predictor - diff if code & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(_IMA_INDEX_TABLE[code & 7])))
    return predictor, index


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int,
                     samples_per_block: int = 505) -> bytes:
    """Encode mono int16 samples as an IMA ADPCM WAV (format 0x0011).

    Each block: 4-byte header (predictor int16 = first sample EXACTLY,
    index, reserved) + 4-bit codes for the remaining samples_per_block-1
    samples, two per byte (low nibble first)."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"expected 1-D int16, got {samples.shape} "
                         f"{samples.dtype}")
    if samples_per_block < 2 or samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd and >= 3")
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = []
    index = 0
    for start in range(0, len(samples), samples_per_block):
        chunk = samples[start:start + samples_per_block]
        predictor = int(chunk[0])
        head = struct.pack("<hBB", predictor, index, 0)
        codes = []
        for s in chunk[1:]:
            target = int(s)
            step = int(_IMA_STEP_TABLE[index])
            diff = target - predictor
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            predictor, index = _ima_step(predictor, index, code)
            codes.append(code)
        # pad the final partial block's code stream with zeros
        codes += [0] * ((samples_per_block - 1) - len(codes))
        body = bytearray()
        for i in range(0, len(codes), 2):
            body.append((codes[i] & 0x0F) | ((codes[i + 1] & 0x0F) << 4))
        blocks.append(head + bytes(body))
    payload = b"".join(blocks)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack("<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate,
                      block_align, 4, 2, samples_per_block)
    n_data = len(payload)
    riff_size = 4 + (8 + len(fmt)) + (8 + n_data) + (8 + 4)
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE" +
            b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"fact" + struct.pack("<II", 4, len(samples)) +
            b"data" + struct.pack("<I", n_data) + payload)


def decode_wav_adpcm(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono IMA ADPCM WAV (format 0x0011).

    Returns (int16 samples, rate). Bounds-validated like the other codecs;
    stereo/unknown formats raise with actionable messages."""
    if len(data) < 12:
        raise ValueError("truncated WAV: shorter than RIFF header")
    riff, _size, wave = struct.unpack_from("<4sI4s", data, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("invalid WAV: bad RIFF/WAVE magic")
    pos = 12
    fmt = None
    payload = None
    n_samples_fact = None
    while pos + 8 <= len(data):
        chunk_id, chunk_size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if pos + chunk_size > len(data):
            raise ValueError(
                f"truncated WAV: chunk {chunk_id!r} declares {chunk_size} "
                f"bytes past end of input")
        if chunk_id == b"fmt ":
            if chunk_size < 20:
                raise ValueError("invalid WAV: ADPCM fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHHHH", data, pos)
        elif chunk_id == b"fact":
            if chunk_size < 4:
                raise ValueError("invalid WAV: fact chunk too small")
            (n_samples_fact,) = struct.unpack_from("<I", data, pos)
        elif chunk_id == b"data":
            payload = data[pos:pos + chunk_size]
        pos += chunk_size + (chunk_size & 1)
    if fmt is None or payload is None:
        raise ValueError("invalid WAV: missing fmt or data chunk")
    (audio_fmt, n_channels, sample_rate, _br, block_align, bits,
     _ext, samples_per_block) = fmt
    if audio_fmt != 0x0011:
        raise ValueError(f"unsupported WAV: format=0x{audio_fmt:04X} "
                         f"(decode_wav_adpcm handles IMA ADPCM 0x0011; "
                         f"use decode_wav_pcm16 for PCM)")
    if n_channels != 1:
        raise ValueError("unsupported ADPCM WAV: only mono")
    if bits != 4:
        raise ValueError(f"invalid ADPCM WAV: {bits}-bit codes")
    if block_align != 4 + (samples_per_block - 1) // 2 or \
            samples_per_block < 2:
        raise ValueError("invalid ADPCM WAV: block_align/samples_per_block "
                         "mismatch")
    out = []
    for start in range(0, len(payload) - len(payload) % block_align,
                       block_align):
        block = payload[start:start + block_align]
        predictor, index, _res = struct.unpack_from("<hBB", block, 0)
        if not (0 <= index <= 88):
            raise ValueError(f"invalid ADPCM WAV: step index {index}")
        out.append(predictor)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_step(predictor, index, code)
                out.append(predictor)
    samples = np.asarray(out, dtype=np.int16)
    if n_samples_fact is not None and n_samples_fact <= len(samples):
        samples = samples[:n_samples_fact]  # drop final-block padding
    return samples, int(sample_rate)


# ---------------------------------------------------------------------------
# MJPEG AVI — a REAL compressed-video format: the published RIFF AVI
# container (hdrl/movi/idx1) carrying one baseline-JPEG frame per '00dc'
# chunk (Motion JPEG, the webcam/capture-card staple). Container math is
# struct-only; frame pixels go through the real DCT codec in
# stages/jpeg.py. Random access via the idx1 index, like BSEQ.


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (N, H, W, 3) uint8 frames as an MJPEG AVI."""
    from .jpeg import encode_jpeg

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(
            f"expected (N, H, W, 3) uint8, got {frames.shape} {frames.dtype}")
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("empty video")
    blobs = [encode_jpeg(f) for f in frames]

    def chunk(ckid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return ckid + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    max_size = max(len(b) for b in blobs)
    avih = struct.pack("<10I2I2I", 1_000_000 // max(fps, 1), max_size * fps,
                       0, 0x10, n, 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0,
                                            1, max(fps, 1), 0, n, max_size,
                                            -1, 0) +
            struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       len(blobs[0]), 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = []
    idx_entries = []
    offset = 4  # relative to the start of the 'movi' fourcc
    for b in blobs:
        ck = chunk(b"00dc", b)
        movi_chunks.append(ck)
        idx_entries.append(struct.pack("<4sII I".replace(" ", ""),
                                       b"00dc", 0x10, offset, len(b)))
        offset += len(ck)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def avi_mjpeg_info(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray, int]:
    """(n_frames, fps, frame_offsets, frame_sizes, movi_base) with bounds
    validation; offsets are ABSOLUTE positions of each JPEG payload.
    Malformed containers always raise ValueError (fuzz-pinned)."""
    try:
        return _avi_mjpeg_info(data)
    except (IndexError, struct.error, OverflowError) as e:
        raise ValueError(f"invalid AVI: malformed chunk ({e})") from None


def _avi_mjpeg_info(data: bytes):
    if len(data) < 24 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("invalid AVI: bad RIFF/AVI magic")
    pos = 12
    fps = 25
    n_frames = None
    movi_base = None
    idx_payload = None
    while pos + 8 <= len(data):
        ckid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > len(data):
            raise ValueError(f"truncated AVI: chunk {ckid!r} past end")
        if ckid == b"LIST":
            kind = data[pos + 8:pos + 12]
            if kind == b"movi":
                movi_base = pos + 8  # points at the 'movi' fourcc
            elif kind == b"hdrl":
                # scan inside for strh to pull rate/scale and length
                inner = data[pos + 12:pos + 8 + size]
                spos = inner.find(b"strh")
                if spos >= 0:
                    body = inner[spos + 8:spos + 8 + 56]
                    if len(body) >= 40 and body[:4] == b"vids":
                        scale, rate = struct.unpack_from("<II", body, 20)
                        if scale:
                            fps = max(rate // scale, 1)
                        (n_frames,) = struct.unpack_from("<I", body, 32)
                pos += 8 + size + (size & 1)
                continue
        elif ckid == b"idx1":
            idx_payload = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if movi_base is None or idx_payload is None:
        raise ValueError("invalid AVI: missing movi list or idx1 index")
    n = len(idx_payload) // 16
    if n == 0:
        raise ValueError("invalid AVI: empty index")
    if n_frames is not None and n_frames != n:
        raise ValueError(
            f"invalid AVI: header declares {n_frames} frames, index has {n}")
    offs = np.empty(n, dtype=np.int64)
    sizes = np.empty(n, dtype=np.int64)
    for i in range(n):
        ckid, _flags, off, sz = struct.unpack_from("<4sIII",
                                                   idx_payload, 16 * i)
        if ckid != b"00dc":
            raise ValueError(f"unsupported AVI: stream chunk {ckid!r}")
        # idx1 offsets are relative to the 'movi' fourcc
        abs_off = movi_base + off + 8  # skip the 00dc chunk header
        if abs_off + sz > len(data):
            raise ValueError("invalid AVI: index entry past end of input")
        offs[i] = abs_off
        sizes[i] = sz
    return n, fps, offs, sizes, movi_base


def decode_avi_mjpeg_frame(data: bytes, index: int) -> np.ndarray:
    """Decode one MJPEG frame (random access via idx1)."""
    from .jpeg import decode_jpeg

    n, _fps, offs, sizes, _base = avi_mjpeg_info(data)
    if not (0 <= index < n):
        raise ValueError(f"frame index {index} out of range [0, {n})")
    return decode_jpeg(data[int(offs[index]):int(offs[index] + sizes[index])])
