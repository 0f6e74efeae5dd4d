"""Baseline JPEG (ITU-T T.81 SOF0) — a real, pure-python/numpy codec.

No PIL / libjpeg in this container, so the format support is written
against the spec directly: marker segments, DQT/DHT/SOF0/SOS parsing,
byte-stuffed entropy-coded data, per-MCU Huffman decode (DC
differential categories + AC run/size with ZRL/EOB), dequantize,
un-zigzag, orthonormal 2-D IDCT, level shift, and integer YCbCr→RGB.
The encoder emits spec-conformant baseline streams (standard Annex K
Huffman tables, 4:4:4 sampling, optional custom quant tables) that
any external decoder can read.

ORACLE REGIME: JPEG is lossy, so arbitrary content can't be
hash-checked against a closed-form SQL oracle.  Two properties make
an exact regime anyway:

* a spatially FLAT 8×8 block has only a DC coefficient, and with a
  unit (all-ones) quantization table the DC round-trips exactly —
  the decoder reconstructs every pixel bit-for-bit;
* defining fixture content in INTEGER YCbCr space (the encoder's
  native space) removes the RGB→YCbCr rounding, so the decoded RGB
  is the exact integer conversion the SQL oracle can recompute.

The declared query (``multimodal_jpeg_decode`` in
``__spark_entry__.py``) lives in that regime: full Huffman/bitstream/
IDCT machinery runs for real, and the result is still closed-form.
Lossy-regime behavior (non-flat blocks, real quant tables) is pinned
by round-trip-within-tolerance unit tests instead.

Limitations (explicit, fail-loud): baseline sequential only (SOF0),
8-bit, 1 or 3 components, 4:4:4 (no chroma subsampling), no restart
markers, no progressive/arithmetic coding.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants: zigzag order + the ITU T.81 Annex K Huffman table specs
# --------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# (bits[1..16], values) — Annex K.3
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: F = M @ f @ M.T."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _huff_encode_table(bits, vals):
    """value -> (code, length) per T.81 C.2 canonical code generation."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_CACHE: dict = {}


def _huff_decode_lut(bits, vals):
    """16-bit-prefix lookup: lut_val[p] / lut_len[p] for every 16-bit
    window whose leading bits form a valid code — one array index per
    symbol instead of bit-at-a-time dict probes.  Cached per table
    content (the standard Annex K tables repeat across every image,
    so the 64K tables build once per process)."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut_val = np.full(1 << 16, -1, np.int32)
    lut_len = np.zeros(1 << 16, np.int32)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut_val[lo:hi] = vals[k]
            lut_len[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = (lut_val, lut_len)
    return lut_val, lut_len


def _category(v: int) -> int:
    """DC/AC magnitude category: smallest s with |v| < 2^s."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _rgb_from_ycbcr(y, cb, cr):
    # floor(x + 0.5), not np.round: banker's rounding at exact .5
    # diverges from SQL ROUND, and the decode oracle recomputes this
    # conversion in closed form — floor(x + 0.5) is identical in both
    # engines for every real
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5
    )
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return [np.clip(c, 0, 255).astype(np.uint8) for c in (r, g, b)]


def encode_jpeg(
    ycbcr: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """Spec-conformant baseline JPEG encoder.

    ``ycbcr``: (h, w) uint8 for grayscale or (h, w, 3) uint8 of
    ALREADY-CONVERTED YCbCr planes (the caller owns color conversion —
    fixtures define content in integer YCbCr so the exact-regime
    round-trip has no conversion rounding); h and w must be multiples
    of 8 (no edge replication — fixtures choose aligned sizes).
    ``quant``: an (8, 8) quantization table applied to every
    component; default all-ones (the exact regime).
    """
    if quant is None:
        quant = np.ones((8, 8), np.int64)
    quant = np.asarray(quant, np.int64)
    gray = ycbcr.ndim == 2
    h, w = ycbcr.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encoder requires 8-aligned dimensions")
    ncomp = 1 if gray else 3

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    zz = quant.reshape(-1)[ZIGZAG].astype(np.uint8)
    seg(0xDB, bytes([0x00]) + zz.tobytes())  # DQT table 0 (shared)

    comp_spec = b"".join(
        struct.pack(">BBB", cid + 1, 0x11, 0) for cid in range(ncomp)
    )
    seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec)  # SOF0

    for cls, tid, bits, vals in [
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHR_BITS, DC_CHR_VALS),
        (1, 1, AC_CHR_BITS, AC_CHR_VALS),
    ][: 2 * (1 if gray else 2)]:
        seg(
            0xC4,
            bytes([(cls << 4) | tid])
            + bytes(bits)
            + bytes(vals),
        )

    sos_comp = b"".join(
        struct.pack(">BB", cid + 1, 0x00 if cid == 0 else 0x11)
        for cid in range(ncomp)
    )
    seg(0xDA, bytes([ncomp]) + sos_comp + bytes([0, 63, 0]))

    dc_tabs = [
        _huff_encode_table(DC_LUM_BITS, DC_LUM_VALS),
        _huff_encode_table(DC_CHR_BITS, DC_CHR_VALS),
    ]
    ac_tabs = [
        _huff_encode_table(AC_LUM_BITS, AC_LUM_VALS),
        _huff_encode_table(AC_CHR_BITS, AC_CHR_VALS),
    ]

    planes = [ycbcr] if gray else [ycbcr[:, :, c] for c in range(3)]
    bh, bwid = h // 8, w // 8
    # one batched DCT per component: (nblocks, 8, 8) through the same
    # per-block matmuls (broadcasted), then quantize + zigzag together
    zz_all = []
    for pl in planes:
        blocks = (
            pl.reshape(bh, 8, bwid, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
            .astype(np.float64)
            - 128.0
        )
        Fq = np.matmul(np.matmul(_DCT_M, blocks), _DCT_M.T)
        q = np.round(Fq / quant).astype(np.int64)
        zz_all.append(q.reshape(-1, 64)[:, ZIGZAG])
    bw = _BitWriter()
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(ncomp):
                zzq = zz_all[ci][by * bwid + bx]
                ti = 0 if ci == 0 else 1
                # DC differential
                diff = int(zzq[0]) - pred[ci]
                pred[ci] = int(zzq[0])
                s = _category(diff)
                code, ln = dc_tabs[ti][s]
                bw.write(code, ln)
                if s:
                    bw.write(
                        diff if diff >= 0 else diff + (1 << s) - 1, s
                    )
                # AC run/size
                run = 0
                for k in range(1, 64):
                    v = int(zzq[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tabs[ti][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_tabs[ti][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    code, ln = ac_tabs[ti][0x00]  # EOB
                    bw.write(code, ln)
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG decoder: full marker walk, DQT/DHT/SOF0/SOS
    parse, Huffman + bitstream decode per MCU, dequantize, un-zigzag,
    orthonormal IDCT, level shift — returns (h, w) uint8 for
    grayscale or (h, w, 3) uint8 RGB (integer BT.601 conversion) for
    3-component streams.  Unsupported variants (progressive,
    subsampled, restart intervals, 16-bit tables) raise — fail loud,
    never mis-decode."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hspecs: dict[tuple[int, int], tuple] = {}
    sof = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[p + 1 : p + 65], np.uint8
                ).astype(np.int64)
                qtabs[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                hspecs[(cls, tid)] = (bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(
                    ">BBB", body, 6 + 3 * c
                )
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, samp, tq))
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline SOF marker 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_sel = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_sel.append((cs, tabs >> 4, tabs & 0x0F))
            h, w, nc = sof
            if ns != nc:
                raise ValueError("partial scans unsupported")
            # extract + un-stuff the whole entropy segment, then read
            # it through a vectorized sliding 16-bit window: W[p] is
            # the 16 bits starting at bit p, so a Huffman symbol is
            # ONE LUT probe and a magnitude read is ONE shift — no
            # per-bit Python
            seg = bytearray()
            p = pos
            while p < len(buf):
                b0 = buf[p]
                if b0 == 0xFF:
                    if p + 1 < len(buf) and buf[p + 1] == 0x00:
                        seg.append(0xFF)
                        p += 2
                        continue
                    break  # real marker ends the scan
                seg.append(b0)
                p += 1
            bits_arr = np.unpackbits(np.frombuffer(bytes(seg), np.uint8))
            nreal = len(bits_arr)
            bits_arr = np.concatenate(
                [bits_arr, np.ones(32, np.uint8)]  # lookahead pad (1s)
            )
            win = np.lib.stride_tricks.sliding_window_view(
                bits_arr, 16
            ).astype(np.int64)
            W = win @ (1 << np.arange(15, -1, -1, dtype=np.int64))
            luts = []
            for ci in range(nc):
                _, dct_, act_ = scan_sel[ci]
                if (0, dct_) not in hspecs or (1, act_) not in hspecs:
                    raise ValueError("missing Huffman table")
                luts.append(
                    (
                        _huff_decode_lut(*hspecs[(0, dct_)]),
                        _huff_decode_lut(*hspecs[(1, act_)]),
                    )
                )
            bh, bw_ = (h + 7) // 8, (w + 7) // 8
            pred = [0] * nc
            bp = 0  # bit cursor
            nblocks = bh * bw_
            zz_store = [
                np.zeros((nblocks, 64), np.int64) for _ in range(nc)
            ]
            # the 32-bit pad covers one code lookahead past the real
            # bits, not an arbitrarily deep mid-block overrun — so a
            # malformed stream may run the cursor past the sliding
            # window W; surface that as the documented ValueError
            # rather than a raw IndexError (ADVICE r8)
            try:
                for bi in range(nblocks):
                    for ci in range(nc):
                        if bp > nreal:
                            raise ValueError(
                                "entropy segment exhausted mid-scan"
                            )
                        (dval, dlen), (aval, alen) = luts[ci]
                        zz = zz_store[ci][bi]
                        pk = int(W[bp])
                        ln = int(dlen[pk])
                        if ln == 0:
                            raise ValueError(
                                "invalid Huffman code in scan"
                            )
                        s = int(dval[pk])
                        bp += ln
                        if s:
                            diff = _extend(int(W[bp]) >> (16 - s), s)
                            bp += s
                        else:
                            diff = 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            pk = int(W[bp])
                            ln = int(alen[pk])
                            if ln == 0:
                                raise ValueError(
                                    "invalid Huffman code in scan"
                                )
                            rs = int(aval[pk])
                            bp += ln
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(
                                int(W[bp]) >> (16 - s), s
                            )
                            bp += s
                            k += 1
            except IndexError:
                raise ValueError(
                    "entropy segment exhausted mid-scan"
                ) from None
            if bp > nreal:
                raise ValueError("entropy segment exhausted mid-scan")
            # batched dequantize + un-zigzag + IDCT per component
            planes = []
            for ci in range(nc):
                qt = qtabs.get(comps[ci][2])
                if qt is None:
                    raise ValueError("missing quant table")
                blk = np.zeros((nblocks, 64), np.float64)
                blk[:, ZIGZAG] = zz_store[ci]
                Fm = blk.reshape(-1, 8, 8) * qt
                f = (
                    np.matmul(np.matmul(_DCT_M.T, Fm), _DCT_M) + 128.0
                )
                plane = (
                    f.reshape(bh, bw_, 8, 8)
                    .transpose(0, 2, 1, 3)
                    .reshape(bh * 8, bw_ * 8)
                )
                planes.append(plane)
            out = [
                np.clip(np.round(p[:h, :w]), 0, 255) for p in planes
            ]
            if nc == 1:
                return out[0].astype(np.uint8)
            if nc == 3:
                r, g, b = _rgb_from_ycbcr(out[0], out[1], out[2])
                return np.stack([r, g, b], axis=-1)
            raise ValueError(f"{nc}-component streams unsupported")
        # APPn/COM and others: skipped
    raise ValueError("no SOS marker found")
