"""MP4 (ISO/IEC 14496-12 ISO Base Media File Format) container with a
Motion-JPEG video track — pure-Python/stdlib, built straight from the
public spec like the sibling RIFF/AVI codec (`codecs.py:encode_avi_mjpeg`).

Scope: the CONTAINER is real — ftyp/mdat/moov box tree, full sample
tables (stsd/stts/stsc/stsz/stco), multi-sample chunks, random-access
sample extraction by walking stsc runs against stco chunk offsets — and
samples are real baseline-JPEG bitstreams (`stages/jpeg.py`). The 'jpeg'
VisualSampleEntry (QuickTime-registered, carried unchanged into ISO BMFF)
keeps the payload codec one this repo genuinely implements; an H.264
('avc1') track would need a motion-compensated entropy decoder, which
stays out of scope (`multimodal.py` documents the stub).

Malformed containers always raise ValueError (same fuzz-pinned exception
hygiene as the other eight media decoders).
"""

from __future__ import annotations

import struct

import numpy as np

_SAMPLES_PER_CHUNK = 4  # encoder groups samples so stsc/stco have real runs


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


def encode_mp4_mjpeg(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (N, H, W, 3) uint8 frames as an MP4 with one 'jpeg' track."""
    from .jpeg import encode_jpeg

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(
            f"expected (N, H, W, 3) uint8, got {frames.shape} {frames.dtype}")
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("empty video")
    fps = max(int(fps), 1)
    blobs = [encode_jpeg(f) for f in frames]
    sizes = [len(b) for b in blobs]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2" + b"mp41")
    mdat_payload_start = len(ftyp) + 8  # mdat header is size(4)+type(4)
    offsets = np.r_[0, np.cumsum(sizes)][:-1] + mdat_payload_start
    mdat = _box(b"mdat", b"".join(blobs))

    # ---- sample tables -------------------------------------------------
    spc = _SAMPLES_PER_CHUNK
    n_chunks = (n + spc - 1) // spc
    chunk_first_sample = np.arange(n_chunks) * spc
    stco_entries = offsets[chunk_first_sample]
    stsc_runs = [(1, min(spc, n))]
    last = n - (n_chunks - 1) * spc
    if n_chunks > 1 and last != spc:
        stsc_runs.append((n_chunks, last))

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)            # data_reference_index
        + b"\x00" * 16                                 # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)   # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                         # frame_count
        + b"\x00" * 32                                 # compressorname
        + struct.pack(">Hh", 24, -1)))                 # depth, pre_defined
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs)) + b"".join(
        struct.pack(">III", first, count, 1) for first, count in stsc_runs))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + struct.pack(f">{n}I", *sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">I", n_chunks)
                 + struct.pack(f">{n_chunks}I",
                               *stco_entries.astype(np.int64)))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    # ---- track / movie headers ----------------------------------------
    url_ = _full(b"url ", 0, 1, b"")  # flag 1: media is in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n,
                                            0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", n * 1000 // fps)
                 + b"\x00" * 8 + struct.pack(">4H", 0, 0, 0, 0) + _MATRIX
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000,
                                            n * 1000 // fps)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8 + _MATRIX + b"\x00" * 24
                 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# decode side
# --------------------------------------------------------------------------

def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in
    data[start:end], with bounds validation."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("invalid MP4: trailing bytes too short for a box")
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        if size == 0:  # spec: box extends to the end of the enclosing scope
            size = end - pos
        elif size == 1:
            raise ValueError(
                "unsupported MP4: 64-bit largesize boxes (files > 4 GiB)")
        if size < 8 or pos + size > end:
            raise ValueError(
                f"invalid MP4: box {typ!r} size {size} out of bounds")
        yield typ, pos + 8, pos + size
        pos += size


def _child(data: bytes, start: int, end: int, typ: bytes) -> tuple[int, int]:
    for t, s, e in _boxes(data, start, end):
        if t == typ:
            return s, e
    raise ValueError(f"invalid MP4: missing {typ!r} box")


def _need(box_typ: bytes, payload_start: int, payload_end: int,
          offset: int, nbytes: int) -> None:
    """Require ``nbytes`` at ``offset`` to lie inside THIS box's payload —
    a short-but-well-sized box must raise, not silently parse the
    neighboring box's bytes as field values (review fix)."""
    if offset + nbytes > payload_end:
        raise ValueError(
            f"invalid MP4: {box_typ.decode('latin1')} box too short for "
            f"its declared fields")


def mp4_mjpeg_info(data: bytes
                   ) -> tuple[int, int, np.ndarray, np.ndarray]:
    """(n_frames, fps, sample_offsets, sample_sizes) for the first video
    track; offsets are ABSOLUTE positions of each JPEG sample. Malformed
    containers always raise ValueError."""
    try:
        return _mp4_mjpeg_info(data)
    except (IndexError, struct.error, OverflowError) as e:
        raise ValueError(f"invalid MP4: malformed box ({e})") from None


def _mp4_mjpeg_info(data: bytes):
    if len(data) < 16:
        raise ValueError("invalid MP4: too short")
    top = list(_boxes(data, 0, len(data)))
    if top[0][0] != b"ftyp":
        raise ValueError("invalid MP4: first box is not ftyp")
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("invalid MP4: missing moov box")

    for t, ts, te in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia_s, mdia_e = _child(data, ts, te, b"mdia")
        hdlr_s, hdlr_e = _child(data, mdia_s, mdia_e, b"hdlr")
        _need(b"hdlr", hdlr_s, hdlr_e, hdlr_s + 8, 4)
        if data[hdlr_s + 8:hdlr_s + 12] != b"vide":
            continue
        mdhd_s, mdhd_e = _child(data, mdia_s, mdia_e, b"mdhd")
        _need(b"mdhd", mdhd_s, mdhd_e, mdhd_s, 4)
        version = data[mdhd_s]
        if version == 0:
            _need(b"mdhd", mdhd_s, mdhd_e, mdhd_s + 12, 4)
            (timescale,) = struct.unpack_from(">I", data, mdhd_s + 12)
        elif version == 1:
            _need(b"mdhd", mdhd_s, mdhd_e, mdhd_s + 20, 4)
            (timescale,) = struct.unpack_from(">I", data, mdhd_s + 20)
        else:
            raise ValueError(f"invalid MP4: mdhd version {version}")
        minf_s, minf_e = _child(data, mdia_s, mdia_e, b"minf")
        stbl_s, stbl_e = _child(data, minf_s, minf_e, b"stbl")

        stsd_s, stsd_e = _child(data, stbl_s, stbl_e, b"stsd")
        _need(b"stsd", stsd_s, stsd_e, stsd_s + 4, 4)
        (n_entries,) = struct.unpack_from(">I", data, stsd_s + 4)
        if n_entries < 1:
            raise ValueError("invalid MP4: empty stsd")
        _need(b"stsd", stsd_s, stsd_e, stsd_s + 12, 4)
        fmt = data[stsd_s + 12:stsd_s + 16]
        if fmt != b"jpeg":
            raise ValueError(
                f"unsupported MP4: sample entry {fmt!r} (only the 'jpeg' "
                f"VisualSampleEntry is implemented; 'avc1'/H.264 needs a "
                f"motion-compensated entropy decoder — out of scope)")

        stts_s, stts_e = _child(data, stbl_s, stbl_e, b"stts")
        _need(b"stts", stts_s, stts_e, stts_s + 4, 4)
        (stts_n,) = struct.unpack_from(">I", data, stts_s + 4)
        if stts_n < 1:
            raise ValueError("invalid MP4: empty stts")
        _need(b"stts", stts_s, stts_e, stts_s + 8, 8)
        _, delta = struct.unpack_from(">II", data, stts_s + 8)
        fps = max(timescale // max(delta, 1), 1)

        stsz_s, stsz_e = _child(data, stbl_s, stbl_e, b"stsz")
        _need(b"stsz", stsz_s, stsz_e, stsz_s + 4, 8)
        uniform, n_samples = struct.unpack_from(">II", data, stsz_s + 4)
        if n_samples == 0:
            raise ValueError("invalid MP4: zero samples")
        if uniform:
            # validate BEFORE allocating: a 32-bit sample_count with no cap
            # lets a KB-size file drive an O(n) allocation + loop (or a
            # MemoryError, which is outside the ValueError fuzz contract).
            # Uniform samples occupy uniform*n bytes, which must fit the file
            if int(uniform) * int(n_samples) > len(data):
                raise ValueError(
                    "invalid MP4: stsz describes more sample bytes than "
                    "the file holds")
            sizes = np.full(n_samples, uniform, dtype=np.int64)
        else:
            if stsz_s + 12 + 4 * n_samples > stsz_e:
                raise ValueError("invalid MP4: stsz table truncated")
            sizes = np.frombuffer(data, dtype=">u4", count=n_samples,
                                  offset=stsz_s + 12).astype(np.int64)

        stsc_s, stsc_e = _child(data, stbl_s, stbl_e, b"stsc")
        _need(b"stsc", stsc_s, stsc_e, stsc_s + 4, 4)
        (stsc_n,) = struct.unpack_from(">I", data, stsc_s + 4)
        if stsc_s + 8 + 12 * stsc_n > stsc_e or stsc_n < 1:
            raise ValueError("invalid MP4: stsc table truncated or empty")
        runs = [struct.unpack_from(">III", data, stsc_s + 8 + 12 * i)
                for i in range(stsc_n)]

        stco_s, stco_e = _child(data, stbl_s, stbl_e, b"stco")
        _need(b"stco", stco_s, stco_e, stco_s + 4, 4)
        (n_chunks,) = struct.unpack_from(">I", data, stco_s + 4)
        if stco_s + 8 + 4 * n_chunks > stco_e or n_chunks < 1:
            raise ValueError("invalid MP4: stco table truncated or empty")
        chunk_off = np.frombuffer(data, dtype=">u4", count=n_chunks,
                                  offset=stco_s + 8).astype(np.int64)

        # expand stsc runs -> samples-per-chunk, then per-sample offsets
        firsts = [r[0] for r in runs]
        if firsts != sorted(firsts) or firsts[0] != 1:
            raise ValueError("invalid MP4: stsc first_chunk not ascending")
        per_chunk = np.empty(n_chunks, dtype=np.int64)
        for i, (first, count, _sdi) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            if not (1 <= first <= last <= n_chunks):
                raise ValueError("invalid MP4: stsc run out of range")
            per_chunk[first - 1:last] = count
        if int(per_chunk.sum()) != n_samples:
            raise ValueError(
                f"invalid MP4: stsc/stco describe {int(per_chunk.sum())} "
                f"samples, stsz has {n_samples}")

        # vectorized: offset(sample) = chunk base + exclusive cumsum of the
        # sizes of earlier samples in the same chunk
        csum = np.r_[np.int64(0), np.cumsum(sizes[:-1])]
        chunk_starts = np.r_[np.int64(0), np.cumsum(per_chunk)[:-1]]
        chunk_idx = np.repeat(np.arange(n_chunks), per_chunk)
        offsets = chunk_off[chunk_idx] + (csum - csum[chunk_starts][chunk_idx])
        if np.any(offsets < 0) or np.any(offsets + sizes > len(data)):
            raise ValueError("invalid MP4: sample outside the file")
        return n_samples, fps, offsets, sizes

    raise ValueError("invalid MP4: no video track")


def decode_mp4_mjpeg_frame(data: bytes, index: int) -> np.ndarray:
    """Decode one JPEG sample (random access via stsc/stco/stsz)."""
    from .jpeg import decode_jpeg

    n, _fps, offs, sizes, = mp4_mjpeg_info(data)
    if not (0 <= index < n):
        raise ValueError(f"frame index {index} out of range [0, {n})")
    return decode_jpeg(data[int(offs[index]):int(offs[index] + sizes[index])])
