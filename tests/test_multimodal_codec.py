"""Round-5 real BMP codec: the decoder must actually parse the byte
format, not pattern-match the encoder's happy path — pinned by a
top-down (negative height) image the encoder never emits, malformed
payloads raising, and padding-sensitive channel means.
"""

import struct

import numpy as np
import pytest

from olap_storage_engine_spark.operators import multimodal as mm


def test_encode_header_fields():
    buf = mm.encode_bmp(10, 3, list(range(10)), 7, 9)
    assert buf[:2] == b"BM"
    (off,) = struct.unpack_from("<I", buf, 10)
    dib_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", buf, 26)
    assert (off, dib_size, w, h, planes, bpp, comp) == (54, 40, 10, 3, 1, 24, 0)
    row_size = (3 * 10 + 3) // 4 * 4
    assert len(buf) == 54 + row_size * 3


def test_roundtrip_means(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    from pyspark.sql import functions as F

    imgs = mm.attach_image_payload(df)
    out = {
        r["doc_id"]: r
        for r in mm.decode_bmp_features(imgs).collect()
    }
    for i in range(40):
        w, h = 8 + i % 25, 4 + i % 13
        r = out[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == pytest.approx((w - 1) / 2.0, abs=0)
        assert r["mean_g"] == (i * 7) % 256
        assert r["mean_b"] == i % 256


def test_topdown_negative_height_rows(spark):
    """Hand-build a top-down BMP (negative height) with DIFFERENT rows
    so honoring row direction matters, and a red ramp so honoring
    3-byte stride + padding matters."""
    w, h = 5, 2
    row_size = (3 * w + 3) // 4 * 4
    off = 54
    header = struct.pack("<2sIHHI", b"BM", off + row_size * h, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, row_size * h, 0, 0, 0, 0)
    top = np.zeros(row_size, dtype=np.uint8)
    bot = np.zeros(row_size, dtype=np.uint8)
    top[2 : 3 * w : 3] = [0, 1, 2, 3, 4]   # red ramp, green/blue 0
    bot[2 : 3 * w : 3] = 100               # flat red 100
    buf = header + dib + top.tobytes() + bot.tobytes()

    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "payload": [buf]})
    sdf = spark.createDataFrame(pdf)
    r = mm.decode_bmp_features(sdf).collect()[0]
    assert (r["width"], r["height"]) == (w, h)
    # mean over both rows: (0+1+2+3+4 + 5*100) / 10
    assert r["mean_r"] == pytest.approx(51.0)
    assert r["mean_g"] == 0.0 and r["mean_b"] == 0.0


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"XX" + b[2:],                       # bad signature
        lambda b: b[:28] + struct.pack("<H", 8) + b[30:],   # 8bpp
        lambda b: b[:30] + struct.pack("<I", 1) + b[34:],   # RLE compression
    ],
)
def test_malformed_payload_raises(spark, mutate):
    import pandas as pd

    buf = mutate(mm.encode_bmp(4, 2, [0, 1, 2, 3], 5, 6))
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [buf]}))
    with pytest.raises(Exception):
        mm.decode_bmp_features(sdf).collect()


def test_fake_parameter_retired():
    """The r5-era ``fake=`` stub gate is gone (r9): all six modalities
    decode for real, so decode_features is now the plain byte-profile
    pass and no longer accepts a fake switch."""
    import inspect

    assert "fake" not in inspect.signature(mm.decode_features).parameters


def test_png_roundtrip_all_filters():
    """encode_png(filters 0/1/2) -> png_decode recovers pixels exactly;
    a spec-exact reference filterer checks the decoder's Average/Paeth
    paths too."""
    import struct
    import zlib

    import numpy as np

    from olap_storage_engine_spark.operators import multimodal as m

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (4, 8), (13, 32)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (m.png_decode(m.encode_png(img)) == img).all()

    def ref_encode(img, fts):
        h, w, _ = img.shape
        out = bytearray()
        prevrec = np.zeros(w * 3, np.int64)
        for y in range(h):
            rec = img[y].reshape(-1).astype(np.int64)
            ft = fts[y % len(fts)]
            out.append(ft)
            for x in range(w * 3):
                a = rec[x - 3] if x >= 3 else 0
                b = prevrec[x]
                c = prevrec[x - 3] if x >= 3 else 0
                if ft == 3:
                    v = rec[x] - (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = (
                        a
                        if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    v = rec[x] - pr
                out.append(v % 256)
            prevrec = rec
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            m.PNG_SIG
            + m._png_chunk(b"IHDR", ihdr)
            + m._png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + m._png_chunk(b"IEND", b"")
        )

    for fts in [(3,), (4,), (3, 4)]:
        img = rng.randint(0, 256, (9, 6, 3), dtype=np.uint8)
        assert (m.png_decode(ref_encode(img, fts)) == img).all(), fts


def test_png_decode_rejects_corruption():
    """CRC tamper, bad signature, and truncated scanline data all fail
    loudly — a corrupt ingest must never average garbage."""
    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import multimodal as m

    img = np.zeros((3, 4, 3), np.uint8)
    buf = bytearray(m.encode_png(img))
    with pytest.raises(ValueError, match="not a PNG"):
        m.png_decode(b"JUNK" + bytes(buf[4:]))
    # flip one IDAT payload byte -> chunk CRC mismatch
    tampered = bytearray(buf)
    idat_at = bytes(tampered).index(b"IDAT")
    tampered[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        m.png_decode(bytes(tampered))


def test_png_spark_decode_matches_closed_form(spark):
    """The distributed attach -> decode pipeline reproduces the
    closed-form per-channel means the oracle predicts."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    feats = m.decode_png_features(m.attach_png_payload(docs))
    for r in feats.collect():
        i = r["doc_id"]
        w, h = 8 + i % 25, 4 + i % 13
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_r"] - (w - 1) / 2.0) < 1e-9
        assert abs(r["mean_g"] - (i * 7 % 256)) < 1e-9
        assert abs(r["mean_b"] - (i % 256)) < 1e-9


def test_wav_roundtrip_and_corruption():
    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import multimodal as m

    rng = np.random.RandomState(5)
    for n in [1, 64, 1001]:
        s = rng.randint(-32768, 32768, n).astype("<i2")
        rate, back = m.wav_decode(m.encode_wav_pcm16(s, 44100))
        assert rate == 44100 and (back == s).all()
    buf = m.encode_wav_pcm16(np.zeros(8, "<i2"))
    with pytest.raises(ValueError, match="not a RIFF"):
        m.wav_decode(b"JUNK" + buf[4:])
    with pytest.raises(ValueError, match="RIFF size"):
        m.wav_decode(buf[:-2])
    # stereo / non-PCM variants refuse rather than mis-decode
    bad = bytearray(buf)
    bad[22] = 2  # channels = 2
    with pytest.raises(ValueError, match="unsupported WAVE"):
        m.wav_decode(bytes(bad))


def test_wav_spark_decode_matches_closed_form(spark):
    import math

    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    feats = m.decode_audio_features(m.attach_audio_payload(docs))
    for r in feats.collect():
        i = r["doc_id"]
        n = 64 + i % 129
        vals = [((i * 13 + 7 * j) % 65536 - 32768) for j in range(n)]
        assert r["sample_rate"] == 8000 and r["n_samples"] == n
        assert abs(r["mean_amp"] - sum(vals) / n) < 1e-9
        assert (
            abs(r["rms"] - math.sqrt(sum(v * v for v in vals) / n)) < 1e-9
        )


def test_jpeg_exact_regime_roundtrips():
    """Flat blocks + unit quant = the codec's exact regime: grayscale
    and integer-YCbCr color round-trip bit-for-bit, including
    per-block DC differentials across many Huffman categories."""
    import numpy as np

    from olap_storage_engine_spark.operators import jpegcodec as J

    for v in [0, 7, 128, 255]:
        img = np.full((16, 24), v, np.uint8)
        assert (J.decode_jpeg(J.encode_jpeg(img)) == img).all()
    rng = np.random.RandomState(9)
    img = np.zeros((40, 64), np.uint8)
    for by in range(5):
        for bx in range(8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rng.randint(
                0, 256
            )
    assert (J.decode_jpeg(J.encode_jpeg(img)) == img).all()
    # flat color: decoded RGB equals the exact integer conversion
    y, cb, cr = 40, 200, 60
    img = np.zeros((8, 16, 3), np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = y, cb, cr
    rgb = J.decode_jpeg(J.encode_jpeg(img))

    def conv(x):
        import math

        return min(255, max(0, math.floor(x + 0.5)))

    assert (rgb[:, :, 0] == conv(y + 1.402 * (cr - 128))).all()
    assert (
        rgb[:, :, 1]
        == conv(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    ).all()
    assert (rgb[:, :, 2] == conv(y + 1.772 * (cb - 128))).all()


def test_jpeg_lossy_regime_bounded():
    """Arbitrary content is lossy by nature; with unit quant the
    reconstruction error is bounded by coefficient rounding (≤3), and
    a real quant table still decodes to the right shape."""
    import numpy as np

    from olap_storage_engine_spark.operators import jpegcodec as J

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (24, 32), np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 3
    q = np.clip(np.arange(64).reshape(8, 8) + 4, 1, 255)
    back2 = J.decode_jpeg(J.encode_jpeg(img, quant=q))
    assert back2.shape == img.shape


def test_jpeg_rejects_unsupported_variants():
    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import jpegcodec as J

    img = np.full((8, 8), 5, np.uint8)
    buf = bytearray(J.encode_jpeg(img))
    with pytest.raises(ValueError, match="missing SOI"):
        J.decode_jpeg(b"xx" + bytes(buf[2:]))
    # flip SOF0 -> SOF2 (progressive)
    sof_at = bytes(buf).index(b"\xff\xc0")
    prog = bytearray(buf)
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(bytes(prog))


def test_jpeg_mid_block_overrun_raises_cleanly():
    """A truncated entropy segment that overruns the bit window deep
    inside a block must surface the documented ValueError, never a raw
    IndexError (ADVICE r8 on jpegcodec.py)."""
    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import jpegcodec as J

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24), np.uint8)
    buf = bytearray(J.encode_jpeg(img))
    eoi = bytes(buf).rindex(b"\xff\xd9")
    sos = bytes(buf).index(b"\xff\xda")
    # chop the entropy segment at several depths; every cut must fail
    # with a clean ValueError (message varies: exhausted vs invalid
    # Huffman code, depending on what the pad bits decode to)
    for keep in [1, 4, 16, (eoi - sos) // 2]:
        cut = bytes(buf[: sos + 14 + keep]) + b"\xff\xd9"
        with pytest.raises(ValueError):
            J.decode_jpeg(cut)


def test_wav_overlong_chunk_raises():
    """A chunk header declaring more bytes than remain must fail loud
    instead of silently truncating the PCM slice (ADVICE r8)."""
    import struct

    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import multimodal as m

    buf = bytearray(m.encode_wav_pcm16(np.arange(16, dtype="<i2")))
    data_at = bytes(buf).index(b"data")
    # inflate the data chunk's declared length past the buffer, and
    # re-pin the RIFF total so only the inner check can catch it
    struct.pack_into("<I", buf, data_at + 4, 10_000)
    with pytest.raises(ValueError, match="declares"):
        m.wav_decode(bytes(buf[:4]) + struct.pack("<I", len(buf) - 8) + bytes(buf[8:]))


def test_jpeg_spark_decode_matches_closed_form(spark):
    import math

    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(25).select(F.col("id").alias("doc_id"))
    feats = m.decode_jpeg_features(m.attach_jpeg_payload(docs))

    def conv(x):
        return min(255.0, max(0.0, math.floor(x + 0.5)))

    for r in feats.collect():
        i = r["doc_id"]
        y, cb, cr = i * 5 % 256, i * 11 % 256, i * 17 % 256
        assert (r["width"], r["height"]) == (8 * (1 + i % 4), 8 * (1 + i % 3))
        assert r["mean_r"] == conv(y + 1.402 * (cr - 128))
        assert r["mean_g"] == conv(
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        )
        assert r["mean_b"] == conv(y + 1.772 * (cb - 128))


def test_resize_kernels_match_references():
    """Nearest matches the integer source-mapping reference exactly;
    bilinear matches a direct per-pixel reference to 1e-9."""
    import numpy as np

    from olap_storage_engine_spark.operators import multimodal as m

    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, (13, 29, 3), np.uint8)
    rs = m.resize_nearest(px, 16, 16)
    for y in range(16):
        for x in range(16):
            assert (rs[y, x] == px[(y * 13) // 16, (x * 29) // 16]).all()

    def ref(px, oh, ow):
        h, w = px.shape[:2]
        out = np.zeros((oh, ow, 3))
        for y in range(oh):
            for x in range(ow):
                fy = (y + 0.5) * h / oh - 0.5
                fx = (x + 0.5) * w / ow - 0.5
                y0 = min(max(int(np.floor(fy)), 0), h - 1)
                x0 = min(max(int(np.floor(fx)), 0), w - 1)
                y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                wy = min(max(fy - y0, 0), 1)
                wx = min(max(fx - x0, 0), 1)
                out[y, x] = (
                    px[y0, x0] * (1 - wx) + px[y0, x1] * wx
                ) * (1 - wy) + (
                    px[y1, x0] * (1 - wx) + px[y1, x1] * wx
                ) * wy
        return out

    bl = m.resize_bilinear(px, 7, 40)
    assert np.allclose(bl, ref(px, 7, 40), atol=1e-9)


def test_resize_spark_pipeline_closed_form(spark):
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    feats = m.resize_image_features(
        m.attach_png_payload(docs), out_w=16, out_h=16
    )
    for r in feats.collect():
        i = r["doc_id"]
        w = 8 + i % 25
        want_r = sum((x * w) // 16 for x in range(16)) / 16.0
        assert abs(r["mean_r"] - want_r) < 1e-9
        assert r["mean_g"] == i * 7 % 256 and r["mean_b"] == i % 256


def test_frame_sample_decodes_only_kept_frames(spark):
    """Sampling happens JVM-side BEFORE decode (dropped frames never
    reach Python), and the sampled green means match the closed form;
    the plan carries the array filter, not a full-array Python pass."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m
    from olap_storage_engine_spark.plans.explain import formatted_plan

    docs = spark.range(17).select(F.col("id").alias("doc_id"))
    feats = m.frame_sample_features(
        m.attach_video_payload(docs), every_k=2
    )
    plan = formatted_plan(feats)
    assert "filter(frames" in plan or "filter(lambda" in plan or "filter(" in plan
    for r in feats.collect():
        i = r["doc_id"]
        n = 2 + i % 4
        kept = [f for f in range(n) if f % 2 == 0]
        want = sum((i * 7 + f * 31) % 256 for f in kept) / len(kept)
        assert r["n_frames"] == n and r["n_sampled"] == len(kept)
        assert abs(r["mean_g"] - want) < 1e-9


def test_jpeg_fuzz_roundtrip_bounded():
    """Fuzz the whole encoder/decoder pair over random shapes and
    content: decode(encode(x)) must stay within the unit-quant
    coefficient-rounding bound and never crash — this sweeps the
    byte-stuffing path (random content emits 0xFF entropy bytes) and
    every Huffman category."""
    import numpy as np

    from olap_storage_engine_spark.operators import jpegcodec as J

    rng = np.random.RandomState(123)
    for trial in range(30):
        h = 8 * rng.randint(1, 5)
        w = 8 * rng.randint(1, 5)
        if trial % 3 == 0:
            img = rng.randint(0, 256, (h, w), np.uint8)  # gray
        elif trial % 3 == 1:
            img = rng.randint(0, 256, (h, w, 3), np.uint8)  # color
        else:
            # extreme content: max-gradient checkerboard (largest AC
            # coefficients, deepest Huffman categories)
            img = (
                (np.indices((h, w)).sum(0) % 2) * 255
            ).astype(np.uint8)
        buf = J.encode_jpeg(img)
        back = J.decode_jpeg(buf)
        assert back.shape == img.shape
        if img.ndim == 2:
            err = np.abs(back.astype(int) - img.astype(int)).max()
            assert err <= 3, (trial, err)


def test_jpeg_stuffed_bytes_roundtrip():
    """Streams whose entropy segment contains 0xFF bytes (stuffed as
    0xFF00) must round-trip — verified by checking a generated corpus
    actually CONTAINS stuffed bytes, then decoding it."""
    import numpy as np

    from olap_storage_engine_spark.operators import jpegcodec as J

    rng = np.random.RandomState(77)
    found_stuffed = False
    for _ in range(40):
        img = np.zeros((8, 8), np.uint8)
        img[:] = rng.randint(0, 256)
        img[0, 0] = rng.randint(0, 256)  # one AC kick
        buf = J.encode_jpeg(img)
        scan = buf[buf.index(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan:
            found_stuffed = True
        back = J.decode_jpeg(buf)
        assert back.shape == img.shape
    assert found_stuffed, "corpus never exercised byte stuffing"


def test_png_fuzz_roundtrip_exact():
    """PNG is lossless: random shapes/content round-trip exactly
    through every encoder filter cycle."""
    import numpy as np

    from olap_storage_engine_spark.operators import multimodal as m

    rng = np.random.RandomState(321)
    for _ in range(20):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        for filters in [(0,), (1,), (2,), (0, 1, 2)]:
            assert (
                m.png_decode(m.encode_png(img, filters=filters)) == img
            ).all()


def test_gif_lzw_roundtrip_stress():
    """GIF is lossless: random / flat / long-run frames round-trip
    exactly, including dictionary growth, the KwKwK self-reference
    case (long runs), and the 4096-entry dictionary reset (large
    random frame)."""
    import numpy as np

    from olap_storage_engine_spark.operators import gifcodec as G

    rng = np.random.RandomState(6)
    for trial in range(9):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        n = rng.randint(1, 5)
        if trial % 3 == 0:
            frames = [
                np.full((h, w), rng.randint(0, 256), np.uint8)
                for _ in range(n)
            ]
        elif trial % 3 == 1:
            frames = [rng.randint(0, 256, (h, w), np.uint8) for _ in range(n)]
        else:
            base = (
                np.repeat(rng.randint(0, 4, (h,)), w)
                .reshape(h, w)
                .astype(np.uint8)
            )
            frames = [base] * n
        out, pal = G.decode_gif(G.encode_gif(frames))
        assert len(out) == n and pal.shape == (256, 3)
        for a, b in zip(frames, out):
            assert (a == b).all(), trial
    big = rng.randint(0, 256, (128, 128), np.uint8)
    out, _ = G.decode_gif(G.encode_gif([big]))
    assert (out[0] == big).all()


def test_gif_rejects_malformed():
    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import gifcodec as G

    buf = G.encode_gif([np.zeros((4, 4), np.uint8)])
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif(b"JUNK12" + buf[6:])
    # truncate the LZW data: sub-block bytes vanish
    with pytest.raises(ValueError):
        G.decode_gif(buf[:-6])


def test_gif_spark_decode_matches_closed_form(spark):
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    feats = m.decode_gif_features(m.attach_gif_payload(docs))
    for r in feats.collect():
        i = r["doc_id"]
        n = 2 + i % 4
        idxs = [(i * 3 + f * 7) % 256 for f in range(n)]
        assert r["n_frames"] == n
        assert (r["width"], r["height"]) == (8 + i % 25, 4 + i % 13)
        assert abs(r["mean_r"] - sum(idxs) / n) < 1e-9
        assert abs(r["mean_g"] - sum(2 * k % 256 for k in idxs) / n) < 1e-9
        assert abs(r["mean_b"] - sum(3 * k % 256 for k in idxs) / n) < 1e-9


# ------------------------------------------------------------------ AVI


def test_avi_mjpeg_roundtrip_and_index_seek():
    """encode_avi_mjpeg -> parse/decode recovers every frame exactly
    (exact-regime JPEG content); every_k decodes only the sampled
    frames via the idx1 index."""
    import numpy as np

    from olap_storage_engine_spark.operators import avicodec as A
    from olap_storage_engine_spark.operators import jpegcodec as J

    w, h = 24, 16
    imgs = []
    for f in range(5):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = (40 + f * 29) % 256
        img[:, :, 1] = 77
        img[:, :, 2] = 131
        imgs.append(img)
    buf = A.encode_avi_mjpeg([J.encode_jpeg(im) for im in imgs], w, h, fps=12)
    meta, frames = A.decode_frames(buf)
    assert meta == {
        "width": w, "height": h, "n_frames": 5, "fps": 12, "has_index": True,
    }
    ref = [J.decode_jpeg(J.encode_jpeg(im)) for im in imgs]
    assert len(frames) == 5
    for got, exp in zip(frames, ref):
        assert (got == exp).all()
    _, sampled = A.decode_frames(buf, every_k=2)
    assert len(sampled) == 3
    for got, exp in zip(sampled, ref[::2]):
        assert (got == exp).all()


def test_avi_rejects_malformed():
    """Container validation fails loud: bad magic, truncation, index
    disagreeing with the movi stream, odd idx1 length, non-MJPG
    streams."""
    import struct

    import numpy as np
    import pytest

    from olap_storage_engine_spark.operators import avicodec as A
    from olap_storage_engine_spark.operators import jpegcodec as J

    img = np.full((8, 8, 3), 99, np.uint8)
    buf = A.encode_avi_mjpeg([J.encode_jpeg(img)] * 2, 8, 8)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        A.parse_avi_mjpeg(b"JUNK" + buf[4:])
    with pytest.raises(ValueError, match="RIFF size"):
        A.parse_avi_mjpeg(buf[:-4])
    bad = bytearray(buf)
    at = bytes(buf).index(b"idx1")
    struct.pack_into("<I", bad, at + 8 + 8, 2)  # first entry offset
    with pytest.raises(ValueError, match="00dc chunk"):
        A.parse_avi_mjpeg(bytes(bad))
    bad2 = bytearray(buf)
    struct.pack_into("<I", bad2, at + 8 + 12, 7)  # first entry size
    with pytest.raises(ValueError, match="disagrees with chunk size"):
        A.parse_avi_mjpeg(bytes(bad2))
    bad3 = bytearray(buf)
    strh_at = bytes(buf).index(b"vids")
    bad3[strh_at + 4 : strh_at + 8] = b"H264"
    with pytest.raises(ValueError, match="unsupported AVI stream"):
        A.parse_avi_mjpeg(bytes(bad3))
    with pytest.raises(ValueError, match="at least one frame"):
        A.encode_avi_mjpeg([], 8, 8)


def test_audio_resample_matches_strided_reference(spark):
    import math

    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    feats = m.resample_audio_features(m.attach_audio_payload(docs), factor=4)
    for r in feats.collect():
        i = r["doc_id"]
        n_in = 64 + i % 129
        vals = [
            ((i * 13 + 7 * j) % 65536 - 32768) for j in range(0, n_in, 4)
        ]
        n = len(vals)
        assert r["sample_rate"] == 2000 and r["n_samples"] == n
        assert r["n_bytes_out"] == 44 + 2 * n  # canonical header + PCM16
        assert abs(r["mean_amp"] - sum(vals) / n) < 1e-9
        assert (
            abs(r["rms"] - math.sqrt(sum(v * v for v in vals) / n)) < 1e-9
        )


def test_audio_resample_factor_one_is_decode(spark):
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators import multimodal as m

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    mm_df = m.attach_audio_payload(docs)
    plain = {
        r["doc_id"]: (r["sample_rate"], r["n_samples"], r["mean_amp"], r["rms"])
        for r in m.decode_audio_features(mm_df).collect()
    }
    resamp = {
        r["doc_id"]: (r["sample_rate"], r["n_samples"], r["mean_amp"], r["rms"])
        for r in m.resample_audio_features(mm_df, factor=1).collect()
    }
    assert plain == resamp


def test_fused_attach_decode_equals_two_step_per_codec(spark):
    """r14 optimization: each codec's fused attach+decode op must be
    ROW-IDENTICAL to decode_X_features(attach_X_payload(docs)) — both
    sides share the module-level payload-recipe and feature-row
    functions, this pins the composition (incl. the AVI every_k
    sampling path)."""
    from olap_storage_engine_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(int(i),) for i in range(0, 40)], "doc_id long"
    )
    pairs = [
        (
            lambda d: mm.decode_bmp_features(mm.attach_image_payload(d)),
            mm.attach_and_decode_bmp_features,
        ),
        (
            lambda d: mm.decode_png_features(mm.attach_png_payload(d)),
            mm.attach_and_decode_png_features,
        ),
        (
            lambda d: mm.decode_audio_features(mm.attach_audio_payload(d)),
            mm.attach_and_decode_audio_features,
        ),
        (
            lambda d: mm.decode_jpeg_features(mm.attach_jpeg_payload(d)),
            mm.attach_and_decode_jpeg_features,
        ),
        (
            lambda d: mm.decode_gif_features(mm.attach_gif_payload(d)),
            mm.attach_and_decode_gif_features,
        ),
        (
            lambda d: mm.decode_video_features(mm.attach_avi_payload(d)),
            mm.attach_and_decode_video_features,
        ),
        (
            lambda d: mm.decode_video_features(
                mm.attach_avi_payload(d), every_k=2
            ),
            lambda d: mm.attach_and_decode_video_features(d, every_k=2),
        ),
    ]
    for two_step, fused in pairs:
        want = sorted(map(tuple, two_step(docs).collect()))
        got = sorted(map(tuple, fused(docs).collect()))
        assert got == want and len(got) == 40
