"""GIF89a — a real, pure-python animated-image codec (LZW and all).

The video/animation modality's on-disk format: no external codec
exists in this container, so the format support is written against
the GIF89a specification directly — logical screen descriptor,
global color table, graphic-control extensions, per-frame image
descriptors, and the variable-width LZW entropy coding (clear/EOI
codes, dictionary growth to 12 bits, the KwKwK self-reference case)
in both directions.  GIF is lossless over palette indices, so — like
PNG — round-trips are exact and decoded stats are closed-form
oracle-checkable.

Scope (fail-loud outside it): GIF87a/89a, global color table only
(no local tables), no interlace, full-frame images at origin (the
shape the encoder emits; compositing/disposal of partial frames is
out of scope and raises).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Variable-width LZW per GIF89a appendix: emit CLEAR first,
    grow code width at dictionary size 2^width, reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        # GIF packs codes LSB-first
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_dict():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_dict()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for sym in indices.tolist():
        k = w + bytes([sym])
        if k in table:
            w = k
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[k] = next_code
            next_code += 1
            # canonical width timing (compress.c lineage): the NEXT
            # emitted code switches to w+1 as soon as the table size
            # REACHES 2^w — one code earlier than pair-consistency
            # alone would require; external decoders depend on it
            if next_code >= (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = fresh_dict()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([sym])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of _lzw_encode, handling the KwKwK case and dictionary
    resets; raises on malformed streams instead of guessing."""
    clear = 1 << min_code_size
    eoi = clear + 1

    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear: full table freezes
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        # the famous decoder-lag rule: grow one code EARLY (at
        # 2^w - 1, not 2^w) because the decoder's table trails the
        # encoder's by one entry at equal stream positions
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        if len(out) > n_expected:
            raise ValueError("LZW output overruns frame size")
    if len(out) != n_expected:
        raise ValueError(
            f"LZW produced {len(out)} of {n_expected} expected pixels"
        )
    return np.frombuffer(bytes(out), np.uint8)


def default_palette() -> np.ndarray:
    """The deterministic 256-entry palette fixtures use:
    palette[k] = (k, 2k mod 256, 3k mod 256)."""
    k = np.arange(256, dtype=np.int64)
    return np.stack([k, (2 * k) % 256, (3 * k) % 256], axis=1).astype(
        np.uint8
    )


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    delay_cs: int = 10,
) -> bytes:
    """GIF89a writer: ``frames`` are (h, w) uint8 PALETTE-INDEX
    arrays (all the same shape); ``palette`` is (256, 3) uint8
    (``default_palette()`` if omitted).  Emits a graphic-control
    extension per frame and the NETSCAPE looping extension, so the
    output is a spec-conformant animated GIF any viewer plays."""
    if palette is None:
        palette = default_palette()
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table, 8 bits/entry, 256 cells
    out.extend(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    out.extend(np.ascontiguousarray(palette, np.uint8).tobytes())
    # NETSCAPE2.0 infinite loop
    out.extend(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share one shape")
        # graphic control: no disposal, no transparency
        out.extend(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00")
        out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        out.append(8)  # LZW min code size
        out.extend(
            _sub_blocks(
                _lzw_encode(
                    np.ascontiguousarray(fr, np.uint8).reshape(-1), 8
                )
            )
        )
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(buf: bytes):
    """GIF87a/89a reader: header + screen descriptor, global color
    table, extension skip-with-parse, per-frame LZW decode.  Returns
    (frames, palette): frames a list of (h, w) uint8 index arrays,
    palette (n, 3) uint8.  RGB view = palette[frame]."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("GIF without a global color table unsupported")
    gct_n = 2 << (flags & 0x07)
    palette = np.frombuffer(
        buf, np.uint8, count=gct_n * 3, offset=pos
    ).reshape(gct_n, 3)
    pos += gct_n * 3
    frames = []
    try:
        return _walk_blocks(buf, pos, w, h, palette)
    except IndexError as e:
        raise ValueError("GIF truncated mid-block") from e


def _walk_blocks(buf: bytes, pos: int, w: int, h: int, palette):
    frames = []
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", buf, pos + 1)
        pos += 10
        if iflags & 0x80:
            raise ValueError("local color tables unsupported")
        if iflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("partial-frame compositing unsupported")
        min_code = buf[pos]
        pos += 1
        data = bytearray()
        while buf[pos] != 0:
            ln = buf[pos]
            data.extend(buf[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        frames.append(
            _lzw_decode(bytes(data), min_code, fw * fh).reshape(fh, fw)
        )
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, palette
