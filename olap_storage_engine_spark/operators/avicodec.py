"""AVI/MJPEG video container codec — pure python/struct, no pyav.

Closes the last multimodal gap from the builder brief: a REAL video
container with frame-accurate indexed access.  MJPEG-in-AVI is the
honest pure-python target — the RIFF chunk walk shares its grammar
with the WAV path (multimodal.wav_decode) and each frame is a complete
baseline JPEG decoded by the existing SOF0 pipeline
(operators/jpegcodec.decode_jpeg), so no new entropy coding is needed
while the container semantics (hdrl/strl headers, movi payload stream,
idx1 frame index) are the real AVI 1.0 layout.

Scale story: the writer emits a standard ``idx1`` index, and the
sampling reader (:func:`sample_frames`) SEEKS through it — only the
sampled frames' byte ranges are ever sliced and handed to the JPEG
decoder, mirroring how a real 100 TB video pipeline uses container
indexes (or MP4 ``stss``) to avoid decoding dropped frames.  The
full-decode reader validates the index against the movi stream and
fails loudly on any disagreement (a corrupt ingest should never
average garbage).

No reference counterpart: the reference engine
(rust-olap/olap-storage-engine) has no multimodal support at all; this
module exists for the LLM-training-data surface of the brief.
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(tag: bytes, body: bytes) -> bytes:
    """One RIFF chunk: tag + little-endian size + body, even-padded
    (RIFF chunks are word-aligned; the pad byte is not counted in the
    declared size)."""
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    frames: "list[bytes]",
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """Write a spec-layout AVI 1.0 file whose single video stream is
    MJPEG: RIFF('AVI ') -> LIST(hdrl: avih + LIST(strl: strh 'vids'
    fccHandler 'MJPG' + strf BITMAPINFOHEADER biCompression 'MJPG'))
    -> LIST(movi: one '00dc' chunk per JPEG frame, word-aligned) ->
    idx1 (one AVIINDEXENTRY per frame, offsets relative to the movi
    list as mainstream writers emit them).  Every frame is a keyframe
    (MJPEG is all-intra) — that is what makes index-seek sampling
    exact."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    # --- movi body + idx1, built together so offsets agree ---
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for fb in frames:
        # AVIINDEXENTRY.dwChunkOffset: from the start of the 'movi'
        # fourcc to the frame chunk's tag (the common convention)
        off = len(movi_body)
        movi_body += _chunk(b"00dc", fb)
        idx += struct.pack(
            "<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(fb)
        )
    # --- headers ---
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1, fps,  # dwScale / dwRate = frame period
        0,  # dwStart
        n,  # dwLength (frames)
        max_bytes,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (default)
        0,  # dwSampleSize (0: variable-size video samples)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        0,  # biSizeImage (may be 0 for compressed)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    body = (
        b"AVI "
        + hdrl
        + _chunk(b"LIST", bytes(movi_body))
        + _chunk(b"idx1", bytes(idx))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) for each RIFF chunk in
    buf[pos:end], validating declared lengths against the window —
    a chunk running past its parent fails loudly (same discipline as
    multimodal.wav_decode)."""
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + ln > end:
            raise ValueError(
                f"AVI chunk {tag!r} declares {ln} bytes but only "
                f"{end - pos - 8} remain in its parent"
            )
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # word alignment


def parse_avi_mjpeg(buf: bytes):
    """Validate the container and return
    ``(meta, frame_ranges)`` where meta is a dict with width /
    height / n_frames / fps and frame_ranges is a list of
    ``(start, length)`` byte ranges of the JPEG frames inside ``buf``.

    The ranges come from the ``idx1`` index (the seekable path) and
    are cross-checked against the movi stream's actual '00dc' chunk
    layout — any disagreement (bad offset, bad size, frame-count
    mismatch with avih) raises rather than decoding garbage."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (total,) = struct.unpack_from("<I", buf, 4)
    if total + 8 != len(buf):
        raise ValueError(
            f"RIFF size {total} disagrees with payload {len(buf)}"
        )
    meta: dict = {}
    movi_at = None  # offset of the 'movi' fourcc
    movi_end = None
    idx_body = None
    for tag, start, ln in _walk_chunks(buf, 12, len(buf)):
        if tag == b"LIST":
            kind = buf[start : start + 4]
            if kind == b"hdrl":
                for t2, s2, l2 in _walk_chunks(buf, start + 4, start + ln):
                    if t2 == b"avih":
                        (
                            usec, _, _, flags, nfr, _, _, _, w, h
                        ) = struct.unpack_from("<10I", buf, s2)
                        meta = {
                            "width": w,
                            "height": h,
                            "n_frames": nfr,
                            "fps": (1_000_000 // usec) if usec else 0,
                            "has_index": bool(flags & AVIF_HASINDEX),
                        }
                    elif t2 == b"LIST" and buf[s2 : s2 + 4] == b"strl":
                        for t3, s3, _l3 in _walk_chunks(
                            buf, s2 + 4, s2 + l2
                        ):
                            if t3 == b"strh":
                                fcc, handler = struct.unpack_from(
                                    "<4s4s", buf, s3
                                )
                                if fcc != b"vids" or handler != b"MJPG":
                                    raise ValueError(
                                        f"unsupported AVI stream "
                                        f"{fcc!r}/{handler!r}"
                                    )
            elif kind == b"movi":
                movi_at, movi_end = start, start + ln
        elif tag == b"idx1":
            idx_body = (start, ln)
    if not meta:
        raise ValueError("AVI missing avih header")
    if movi_at is None:
        raise ValueError("AVI missing movi list")
    if idx_body is None or not meta["has_index"]:
        raise ValueError("AVI missing idx1 index")
    # idx1 -> frame ranges (offsets are relative to the movi fourcc)
    s, ln = idx_body
    if ln % 16:
        raise ValueError("idx1 length not a multiple of 16")
    ranges = []
    for e in range(s, s + ln, 16):
        ckid, _flags, off, size = struct.unpack_from("<4sIII", buf, e)
        if ckid != b"00dc":
            raise ValueError(f"unexpected idx1 stream id {ckid!r}")
        at = movi_at + off
        if buf[at : at + 4] != b"00dc":
            raise ValueError("idx1 offset does not land on a 00dc chunk")
        (declared,) = struct.unpack_from("<I", buf, at + 4)
        if declared != size:
            raise ValueError(
                f"idx1 size {size} disagrees with chunk size {declared}"
            )
        if at + 8 + size > movi_end:
            raise ValueError("indexed frame runs past the movi list")
        ranges.append((at + 8, size))
    if len(ranges) != meta["n_frames"]:
        raise ValueError(
            f"idx1 has {len(ranges)} frames, avih declares "
            f"{meta['n_frames']}"
        )
    return meta, ranges


def decode_frames(buf: bytes, every_k: int = 1):
    """Decode every ``every_k``-th frame of an MJPEG AVI to a pixel
    array (via jpegcodec.decode_jpeg).  Sampling slices ONLY the
    sampled frames' byte ranges out of the container — dropped frames
    are never entropy-decoded (the idx1 seek path)."""
    from . import jpegcodec as J

    meta, ranges = parse_avi_mjpeg(buf)
    out = []
    for i in range(0, len(ranges), every_k):
        s, ln = ranges[i]
        out.append(J.decode_jpeg(buf[s : s + ln]))
    return meta, out
