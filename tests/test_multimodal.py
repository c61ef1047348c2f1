"""Multimodal plumbing: binary payload columns through mapInPandas
(decode / resize / frame-sample), per SURVEY.md §7 Phase 4. Decode is
a deterministic stub; the Spark-side schema/batch plumbing is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.make_fake_media(spark, n=30).cache()


def test_decode_schema_and_determinism(spark, media):
    dec = MM.decode_media(media)
    assert dec.columns == [
        "media_id", "kind", "n_bytes", "checksum", "width", "height",
        "sample_rate", "duration_ms", "feature"
    ]
    rows = {r["media_id"]: r for r in dec.collect()}
    assert len(rows) == 30
    # dims round-trip from the stub header
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    for mid, r in rows.items():
        assert r["width"] == meta[mid]["width"]
        assert r["height"] == meta[mid]["height"]
        assert len(r["feature"]) == 8
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    assert all(rows[m]["checksum"] == rows2[m]["checksum"] for m in rows)


def test_resize_rewrites_dims(spark, media):
    resized = MM.resize_stub(media, 64, 48)
    dec = {r["media_id"]: r for r in MM.decode_media(resized).collect()}
    assert all(r["width"] == 64 and r["height"] == 48 for r in dec.values())


def test_frame_sample_fanout(spark, media):
    frames = MM.frame_sample(media, every_n_bytes=32)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos
    # stride contract: ceil(len/32) frames per video
    sizes = {
        r["media_id"]: r["meta"]["n_bytes"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for mid, nb in sizes.items():
        assert counts[mid] == -(-nb // 32)


def test_decode_rejects_headerless_payload(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"abc"), None)], MM.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="stub header|NotImplementedError"):
        MM.decode_media(bad).collect()


# --- real in-container codecs: PPM (P6) and 24-bit BMP --------------------


def test_ppm_decodes_real_bytes_to_real_dimensions(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_ppm,
    )

    # 2x2 image: red, green, blue, white — a real P6 file, byte-exact
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    payload = encode_ppm(2, 2, rgb)
    assert payload.startswith(b"P6\n2 2\n255\n")
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload),
          {"mime": "image/x-portable-pixmap", "n_bytes": len(payload),
           "width": 2, "height": 2, "duration_ms": None})],
        MEDIA_SCHEMA,
    )
    row = decode_media(df).collect()[0]
    assert (row["width"], row["height"]) == (2, 2)
    # per-channel means of the actual pixels: R=(255+0+0+255)/4 etc.
    feat = row["feature"]
    assert abs(feat[0] - (510 / 4) / 255.0) < 1e-6
    assert abs(feat[1] - (510 / 4) / 255.0) < 1e-6
    assert abs(feat[2] - (510 / 4) / 255.0) < 1e-6
    assert feat[3] == feat[4] == feat[5] == 1.0  # every channel peaks at 255


def test_ppm_header_comments_are_skipped(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_ppm,
    )

    raw = b"P6\n# made by hand\n3 1\n# another\n255\n" + bytes(9)
    w, h, rgb = _decode_ppm(raw)
    assert (w, h) == (3, 1) and rgb == bytes(9)


def test_bmp_roundtrip_with_row_padding(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_bmp,
        encode_bmp,
    )

    # width 3 -> 9-byte rows padded to 12 on disk: the decode must
    # un-pad, un-flip (bottom-up), and un-BGR
    rgb = bytes(range(3 * 2 * 3))
    payload = encode_bmp(3, 2, rgb)
    assert payload[:2] == b"BM"
    w, h, back = _decode_bmp(payload)
    assert (w, h) == (3, 2) and back == rgb


def test_bmp_through_decode_media_operator(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_bmp,
    )

    rgb = bytes([10, 20, 30] * 6)
    payload = encode_bmp(2, 3, rgb)
    df = spark.createDataFrame(
        [(7, "image", bytearray(payload),
          {"mime": "image/bmp", "n_bytes": len(payload),
           "width": 2, "height": 3, "duration_ms": None})],
        MEDIA_SCHEMA,
    )
    row = decode_media(df).collect()[0]
    assert (row["width"], row["height"]) == (2, 3)
    assert abs(row["feature"][0] - 10 / 255.0) < 1e-6
    assert abs(row["feature"][1] - 20 / 255.0) < 1e-6
    assert abs(row["feature"][2] - 30 / 255.0) < 1e-6


def test_jpeg_baseline_codec_round_trips(spark):
    """r9: the JPEG stub is now a REAL baseline codec (ITU T.81,
    pure stdlib+numpy). Self-generated fixtures: encode->decode must
    reproduce pixels within JPEG's lossy tolerance across 4:4:4,
    4:2:0, restart intervals, grayscale, and non-multiple-of-MCU
    dims; progressive (SOF2) stays a declared refusal."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 48, 32
    a = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            a[y, x] = (x * 5 % 256, y * 7 % 256, (x + y) * 3 % 256)
    rgb = a.tobytes()
    for sub, tol in (("444", 4), ("420", 12)):
        for ri in (0, 3):
            enc = encode_jpeg(
                w, h, rgb, quality=92, subsample=sub, restart_interval=ri
            )
            assert enc[:3] == b"\xff\xd8\xff" and enc[-2:] == b"\xff\xd9"
            dw, dh, out = decode_jpeg(enc)
            assert (dw, dh) == (w, h)
            got = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
            assert np.abs(got - a.astype(int)).max() <= tol
    # grayscale single-component scan
    g3 = np.repeat(
        np.repeat((np.arange(w) * 5 % 256).astype(np.uint8)[None, :, None],
                  h, axis=0),
        3, axis=2,
    )
    dw, dh, out = decode_jpeg(
        encode_jpeg(w, h, g3.tobytes(), quality=92, grayscale=True)
    )
    got = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - g3.astype(int)).max() <= 4
    # non-multiple-of-16 dims exercise edge padding on encode and the
    # plane crop on decode
    w2, h2 = 13, 9
    a2 = a[:h2, :w2].copy()
    dw, dh, out = decode_jpeg(
        encode_jpeg(w2, h2, a2.tobytes(), quality=92, subsample="420")
    )
    assert (dw, dh) == (w2, h2)
    # _decode_bytes routes the FF D8 magic to the real decoder now
    enc = encode_jpeg(w, h, rgb, quality=90)
    meta = MM._decode_bytes(enc)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["sample_rate"] is None and len(meta["feature"]) == 8
    # the feature comes from REAL pixels: close to the source image's
    import numpy as _np

    src_means = a.reshape(-1, 3).mean(axis=0) / 255.0
    assert _np.abs(_np.array(meta["feature"][:3]) - src_means).max() < 0.02
    # a baseline stream RELABELED SOF2 is malformed (r9: progressive
    # now decodes for real, and its scans cannot span Ss=0..Se=63)
    prog = bytearray(enc)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(bytes(prog))

# --- real in-container audio codec: RIFF/WAVE PCM16 -----------------------


def test_wav_sine_decodes_to_real_audio_features(spark):
    import math

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_wav,
    )

    # 0.5s of a 440 Hz sine at half amplitude, 8 kHz mono PCM16
    rate, secs, amp = 8000, 0.5, 0.5
    samples = [
        int(32767 * amp * math.sin(2 * math.pi * 440 * t / rate))
        for t in range(int(rate * secs))
    ]
    payload = encode_wav(rate, 1, samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    df = spark.createDataFrame(
        [(3, "audio", bytearray(payload),
          {"mime": "audio/wav", "n_bytes": len(payload),
           "width": None, "height": None, "duration_ms": 500})],
        MEDIA_SCHEMA,
    )
    row = decode_media(df).collect()[0]
    assert row["sample_rate"] == 8000
    assert row["duration_ms"] == 500
    assert row["width"] == 1  # channel count
    feat = row["feature"]
    # rms of a sine = amp/sqrt(2); zcr of 440 Hz at 8 kHz = 2*440/8000
    assert abs(feat[0] - amp / math.sqrt(2)) < 1e-3
    assert abs(feat[1] - amp) < 1e-3          # peak
    assert abs(feat[2] - 2 * 440 / rate) < 5e-3  # zero-crossing rate
    # steady tone: all four quarter energies equal the global rms
    for q in feat[4:8]:
        assert abs(q - feat[0]) < 1e-3


def test_wav_stereo_interleave_and_word_alignment(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_wav,
        encode_wav,
    )

    # L channel constant +0.25, R channel constant -0.25, 10 frames
    left, right = int(0.25 * 32768), -int(0.25 * 32768)
    inter = []
    for _ in range(10):
        inter += [left, right]
    rate_, ch, frames, a = _decode_wav(encode_wav(16000, 2, inter))
    assert (rate_, ch, frames) == (16000, 2, 10)
    assert abs(a[:, 0].mean() - 0.25) < 1e-3
    assert abs(a[:, 1].mean() + 0.25) < 1e-3


def test_wav_perceptual_codec_is_a_declared_stub(spark):
    """r9 moved the WAV boundary: PCM widths, IEEE float, G.711, and
    IMA ADPCM all decode now — only perceptual codecs (e.g. MP3-in-
    WAV, format tag 0x55) stay the declared refusal."""
    import struct

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_bytes,
    )

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 32000, 4, 0)
    payload = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + fmt
        + b"data" + (0).to_bytes(4, "little")
    )
    with pytest.raises(NotImplementedError, match="format tag"):
        _decode_bytes(payload)


def test_resize_images_real_nearest_neighbor(spark):
    """resize_images on a real PPM: output decodes to the target dims
    with exactly the nearest-neighbor-selected pixels."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_ppm,
        encode_ppm,
        resize_images,
    )

    # 4x2 image, each pixel value = 10*x + y in all three channels
    rgb = bytes(
        v for y in range(2) for x in range(4) for v in [10 * x + y] * 3
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(4, 2, rgb)))],
        "media_id long, kind string, payload binary",
    )
    out = resize_images(df, 2, 1).collect()[0]
    w, h, small = _decode_ppm(bytes(out["payload"]))
    assert (w, h) == (2, 1)
    # nearest-neighbor with floor mapping picks x in {0, 2}, y = 0
    assert list(small) == [0, 0, 0, 20, 20, 20]


def test_resize_images_passes_through_non_images(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        resize_images,
    )

    payload = b"\x00\x01\x00\x01not-an-image"
    df = spark.createDataFrame(
        [(1, "audio", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    out = resize_images(df, 8, 8).collect()[0]
    assert bytes(out["payload"]) == payload


def _random_rgb(rng, w, h):
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def test_png_roundtrip_every_filter_type(spark):
    """Real PNG codec (stdlib zlib): encode with each of the five
    scanline filters (None/Sub/Up/Average/Paeth) and per-row mixes —
    decode must reproduce the exact pixels."""
    import random

    rng = random.Random(3)
    w, h = 9, 7  # odd dims exercise filter edge columns
    rgb = _random_rgb(rng, w, h)
    for ft in range(5):
        png = MM.encode_png(w, h, rgb, row_filters=[ft] * h)
        gw, gh, grgb = MM._decode_png(png)
        assert (gw, gh) == (w, h) and grgb == rgb, f"filter {ft}"
    mixed = [rng.randrange(5) for _ in range(h)]
    png = MM.encode_png(w, h, rgb, row_filters=mixed)
    assert MM._decode_png(png)[2] == rgb


def test_png_gray_palette_alpha_color_types(spark):
    """Hand-built PNGs for color types 0 (gray), 3 (palette),
    4 (gray+alpha), 6 (RGBA) — all expand to RGB."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            len(body).to_bytes(4, "big") + tag + body
            + zlib.crc32(tag + body).to_bytes(4, "big")
        )

    def png(w, h, ctype, raw_scanlines, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        body = MM._PNG_MAGIC + chunk(b"IHDR", ihdr)
        if plte:
            body += chunk(b"PLTE", plte)
        return body + chunk(b"IDAT", zlib.compress(raw_scanlines)) + chunk(b"IEND", b"")

    # gray 2x2: values 10,20 / 30,40
    g = png(2, 2, 0, bytes([0, 10, 20, 0, 30, 40]))
    assert MM._decode_png(g) == (2, 2, bytes([10]*3 + [20]*3 + [30]*3 + [40]*3))
    # palette 2x1: indices 1,0 into [(255,0,0),(0,255,0)]
    p = png(2, 1, 3, bytes([0, 1, 0]), plte=bytes([255, 0, 0, 0, 255, 0]))
    assert MM._decode_png(p) == (2, 1, bytes([0, 255, 0, 255, 0, 0]))
    # gray+alpha 1x1: gray 77, alpha 128 -> RGB 77,77,77
    ga = png(1, 1, 4, bytes([0, 77, 128]))
    assert MM._decode_png(ga) == (1, 1, bytes([77, 77, 77]))
    # RGBA 1x1: alpha dropped
    rgba = png(1, 1, 6, bytes([0, 1, 2, 3, 200]))
    assert MM._decode_png(rgba) == (1, 1, bytes([1, 2, 3]))


def test_png_through_decode_media_operator(spark):
    """VERDICT r4 #5 done-condition: a real PNG decodes to dimensions
    + pixel features through media_decode."""
    import random

    rng = random.Random(5)
    w, h = 12, 8
    rgb = _random_rgb(rng, w, h)
    png = MM.encode_png(w, h, rgb, row_filters=[4] * h)  # Paeth rows
    df = spark.createDataFrame(
        [(1, "image", bytearray(png),
          {"mime": "image/png", "n_bytes": len(png), "width": w,
           "height": h, "duration_ms": None})],
        MM.MEDIA_SCHEMA,
    )
    r = MM.decode_media(df).collect()[0]
    assert (r["width"], r["height"]) == (w, h)
    # features computed from REAL pixels: compare to direct math
    import numpy as np

    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(float)
    want = list(a.mean(axis=0) / 255.0) + list(a.max(axis=0) / 255.0)
    got = r["feature"][:6]
    assert all(abs(x - y) < 1e-6 for x, y in zip(got, want))


def _png_chunk(tag, body):
    import zlib

    return (
        len(body).to_bytes(4, "big") + tag + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


def test_png_16bit_and_adam7_decode(spark):
    """r9: 16-bit depth and Adam7 interlace decode for real (formerly
    declared stubs). Fixtures are hand-built from the spec layout —
    an INDEPENDENT reimplementation of the pass lattice — and must
    equal the plain 8-bit non-interlaced decode of the same pixels.
    Sub-byte depths stay a declared refusal."""
    import struct
    import zlib

    w, h = 11, 7  # odd dims exercise partial Adam7 passes
    px = [
        ((x * 23 + y * 7) % 256, (x * 5) % 256, (y * 31) % 256)
        for y in range(h)
        for x in range(w)
    ]
    flat8 = bytes(v for p in px for v in p)
    # 16-bit: each sample v replicated as v*257 (high byte == v), so
    # the rescale-to-8 decode must reproduce flat8 exactly
    raw16 = bytearray()
    for y in range(h):
        raw16.append(0)  # filter None
        for x in range(w):
            for v in px[y * w + x]:
                raw16 += (v * 257).to_bytes(2, "big")
    ihdr16 = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    png16 = (
        MM._PNG_MAGIC + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw16)))
        + _png_chunk(b"IEND", b"")
    )
    assert MM._decode_png(png16) == (w, h, flat8)
    # Adam7: seven passes, filter None scanlines, independent lattice
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw7 = bytearray()
    for x0, y0, dx, dy in passes:
        ys = list(range(y0, h, dy))
        xs = list(range(x0, w, dx))
        if not ys or not xs:
            continue
        for yy in ys:
            raw7.append(0)
            for xx in xs:
                raw7 += bytes(px[yy * w + xx])
    ihdr7 = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    png7 = (
        MM._PNG_MAGIC + _png_chunk(b"IHDR", ihdr7)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw7)))
        + _png_chunk(b"IEND", b"")
    )
    assert MM._decode_png(png7) == (w, h, flat8)
    # sub-byte depth: still a declared boundary
    ihdr4 = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)
    bad = (
        MM._PNG_MAGIC + _png_chunk(b"IHDR", ihdr4)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        MM._decode_png(bad)


def test_ppm_16bit_decodes_with_maxval_rescale(spark):
    """r9: 16-bit P6 (maxval > 255) decodes for real — big-endian
    two-byte samples rescaled by the DECLARED maxval (exact round),
    not just a high-byte truncation."""
    w, h = 3, 2
    vals = [0, 1000, 4095, 2048, 4094, 7, 500, 123, 4001,
            3000, 2000, 1, 4095, 42, 77, 1234, 999, 3333]
    body = b"".join(v.to_bytes(2, "big") for v in vals)
    ppm = f"P6\n{w} {h}\n4095\n".encode() + body
    dw, dh, rgb = MM._decode_ppm(ppm)
    assert (dw, dh) == (w, h)
    want = bytes(round(v * 255 / 4095) for v in vals)
    assert rgb == want


def test_resize_handles_png_payloads(spark):
    import random

    rng = random.Random(9)
    w, h = 16, 10
    rgb = _random_rgb(rng, w, h)
    png = MM.encode_png(w, h, rgb, row_filters=[2] * h)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png),
          {"mime": "image/png", "n_bytes": len(png), "width": w,
           "height": h, "duration_ms": None})],
        MM.MEDIA_SCHEMA,
    )
    out = MM.resize_images(df, 8, 5).collect()[0]
    gw, gh, grgb = MM._decode_ppm(bytes(out["payload"]))
    assert (gw, gh) == (8, 5)
    import numpy as np

    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(5) * h) // 5
    xs = (np.arange(8) * w) // 8
    assert grgb == a[ys][:, xs].tobytes()


def test_gif_roundtrip_and_through_decode_media(spark):
    """Real GIF codec (pure-Python LZW): random palettes round-trip;
    a GIF payload decodes to dimensions + pixel features through the
    media operator."""
    import random

    import numpy as np

    rng = random.Random(11)
    w, h, nc = 17, 11, 23
    pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(nc)]
    rgb = b"".join(bytes(pal[rng.randrange(nc)]) for _ in range(w * h))
    gif = MM.encode_gif(w, h, rgb)
    assert MM._decode_gif(gif) == (w, h, rgb)

    df = spark.createDataFrame(
        [(1, "image", bytearray(gif),
          {"mime": "image/gif", "n_bytes": len(gif), "width": w,
           "height": h, "duration_ms": None})],
        MM.MEDIA_SCHEMA,
    )
    r = MM.decode_media(df).collect()[0]
    assert (r["width"], r["height"]) == (w, h)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(float)
    want = list(a.mean(axis=0) / 255.0)
    assert all(abs(x - y) < 1e-6 for x, y in zip(r["feature"][:3], want))


def test_gif_interlaced_decodes(spark):
    """Hand-interlace a GIF's index stream per the 4-pass scheme; the
    decoder must reassemble row order."""
    import random

    rng = random.Random(5)
    w, h = 8, 16
    pal = [(i * 16, 0, 255 - i * 16) for i in range(16)]
    idx_rows = [[rng.randrange(16) for _ in range(w)] for _ in range(h)]
    rgb = b"".join(
        bytes(pal[i]) for row in idx_rows for i in row
    )
    plain = MM.encode_gif(w, h, rgb)
    # rebuild the same file with the interlace flag + reordered rows
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    inter_rgb = b"".join(
        bytes(pal[i]) for r in order for i in idx_rows[r]
    )
    inter = bytearray(MM.encode_gif(w, h, inter_rgb))
    # image descriptor: ',' u16*4 then packed byte -> set interlace bit
    comma = inter.index(ord(","), 13)
    inter[comma + 9] |= 0x40
    gw, gh, grgb = MM._decode_gif(bytes(inter))
    assert (gw, gh) == (w, h) and grgb == rgb


def test_resize_handles_gif_payloads(spark):
    import random

    import numpy as np

    rng = random.Random(9)
    w, h = 20, 12
    pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(50)]
    rgb = b"".join(bytes(pal[rng.randrange(50)]) for _ in range(w * h))
    gif = MM.encode_gif(w, h, rgb)
    df = spark.createDataFrame(
        [(1, "image", bytearray(gif),
          {"mime": "image/gif", "n_bytes": len(gif), "width": w,
           "height": h, "duration_ms": None})],
        MM.MEDIA_SCHEMA,
    )
    out = MM.resize_images(df, 10, 6).collect()[0]
    gw, gh, grgb = MM._decode_ppm(bytes(out["payload"]))
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(6) * h) // 6
    xs = (np.arange(10) * w) // 10
    assert (gw, gh) == (10, 6) and grgb == a[ys][:, xs].tobytes()


# -- pHash + spectral features ----------------------------------------------


def _rand_image(rng, w=64, h=48):
    import numpy as np

    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # smooth it so pHash has structure (pure noise hashes are fragile)
    a = ((a.astype(int) + np.roll(a, 1, 0).astype(int)
          + np.roll(a, 1, 1).astype(int)) // 3).astype(np.uint8)
    return a


def test_phash_invariant_across_encodings_and_resize(spark):
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        image_phash,
    )

    rng = np.random.default_rng(5)
    a = _rand_image(rng)
    h, w = a.shape[:2]
    rgb = a.tobytes()
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(w, h, rgb)), {"mime": "image/png"}),
            (2, "image", bytearray(encode_bmp(w, h, rgb)), {"mime": "image/bmp"}),
            (3, "audio", bytearray(b"RIFFxxxxWAVE"), {"mime": "audio/wav"}),
        ],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    got = {r["media_id"]: r["phash"] for r in image_phash(df).collect()}
    assert got[1] is not None and got[1] == got[2]  # same pixels, any container
    assert got[3] is None                            # non-image -> NULL


def test_phash_pairs_find_noised_near_dup_not_distinct(spark):
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        encode_ppm,
        image_phash,
        phash_pairs,
    )

    rng = np.random.default_rng(11)
    base = _rand_image(rng)
    h, w = base.shape[:2]
    noised = base.copy()
    noised[0, 0] = (noised[0, 0] + 3) % 256  # one-pixel perturbation
    other = _rand_image(np.random.default_rng(999))
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_ppm(w, h, base.tobytes())), {}),
            (2, "image", bytearray(encode_ppm(w, h, noised.tobytes())), {}),
            (3, "image", bytearray(encode_ppm(w, h, other.tobytes())), {}),
        ],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    pairs = phash_pairs(image_phash(df)).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_spectral_features_locate_a_pure_tone(spark):
    import math

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav,
    )

    rate, freq, n = 8000, 1000, 4096
    samples = [
        int(20000 * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)
    ]
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(encode_wav(rate, 1, samples)), {}),
            (2, "image", bytearray(b"P6 junk"), {}),
        ],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["media_id"]: r for r in audio_spectral_features(df).collect()}
    tone = rows[1]
    assert abs(tone["centroid_hz"] - freq) < 25      # energy concentrated at 1 kHz
    assert abs(tone["rolloff_hz"] - freq) < 25
    assert tone["bandwidth_hz"] < 120                # narrow line
    assert tone["flatness"] < 0.01                   # tonal, not noisy
    assert rows[2]["centroid_hz"] is None            # non-audio -> NULLs


def test_phash_band_join_is_lossless_vs_bruteforce(spark):
    """The pigeonhole guarantee: for max_hamming < n_bands the banded
    candidate join must find EXACTLY the brute-force hamming pairs."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        phash_pairs,
    )

    rng = np.random.default_rng(21)
    base = int(rng.integers(0, 1 << 63))
    hashes = [base]
    for _ in range(40):
        h = hashes[rng.integers(0, len(hashes))]
        flips = rng.integers(0, 10)  # cluster of mutated hashes
        for _ in range(int(flips)):
            h ^= 1 << int(rng.integers(0, 64))
        hashes.append(h)
    signed = [x - (1 << 64) if x >= (1 << 63) else x for x in hashes]
    df = spark.createDataFrame(
        list(enumerate(signed)), "media_id long, phash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_pairs(df, max_hamming=6).collect()
    }
    want = set()
    for i in range(len(signed)):
        for j in range(i + 1, len(signed)):
            d = bin((signed[i] ^ signed[j]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want.add((i, j, d))
    assert got == want


# -- AVI/MJPG video container (new r9) -------------------------------------


def test_avi_mjpeg_round_trip_exact_solid_frames():
    """Solid-color frames at quality=100 (all-ones quant tables)
    survive the AVI mux + JPEG round trip bit-exactly; header fields
    parse per the RIFF reference."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.avi import (
        decode_avi_frame,
        encode_avi_mjpeg,
        parse_avi,
    )

    colors = [(5, 4, 3), (250, 1, 128), (77, 200, 13), (0, 255, 7)]
    b = encode_avi_mjpeg(
        16, 8, [bytes(list(c) * 128) for c in colors], fps=25
    )
    p = parse_avi(b)
    assert (p["width"], p["height"], p["n_frames"], p["fps"]) == (
        16, 8, 4, 25,
    )
    assert p["duration_ms"] == 4 * 40
    for i, c in enumerate(colors):
        w, h, rgb = decode_avi_frame(p, i)
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        assert (w, h) == (16, 8)
        assert (a == np.array(c)).all(), (i, c)


def test_avi_gradient_frames_near_exact():
    """Non-solid frames aren't DC-only — the decode must still land
    within the baseline-JPEG tolerance at quality=100."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.avi import (
        decode_avi_frame,
        encode_avi_mjpeg,
        parse_avi,
    )

    w, h = 16, 16
    grad = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            grad[y, x] = (x * 16, y * 16, (x + y) * 8)
    b = encode_avi_mjpeg(w, h, [grad.tobytes()], fps=10)
    _, _, rgb = decode_avi_frame(parse_avi(b), 0)
    got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - grad.astype(int)).max() <= 2


def test_avi_non_mjpg_codec_raises():
    """Interframe codecs are the declared boundary — an XVID fourcc
    raises NotImplementedError, truncated/foreign bytes ValueError."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.avi import (
        encode_avi_mjpeg,
        parse_avi,
    )

    b = bytearray(
        encode_avi_mjpeg(16, 8, [bytes([1, 2, 3] * 128)], fps=10)
    )
    i = b.find(b"vids") + 4
    assert b[i : i + 4] == b"MJPG"
    b[i : i + 4] = b"XVID"
    j = b.find(b"MJPG")  # biCompression in strf
    b[j : j + 4] = b"XVID"
    with pytest.raises(NotImplementedError, match="XVID"):
        parse_avi(bytes(b))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"RIFX" + bytes(20))
    with pytest.raises(ValueError, match="avih"):
        parse_avi(b"RIFF" + (4).to_bytes(4, "little") + b"AVI ")


def test_decode_media_handles_avi(spark):
    """decode_media routes RIFF/'AVI ' payloads through the real
    container decode: avih dims, fps in the rate slot, duration, and
    first-frame features."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.avi import (
        encode_avi_mjpeg,
    )

    b = encode_avi_mjpeg(
        16, 8, [bytes([100, 150, 200] * 128), bytes([0, 0, 0] * 128)],
        fps=5,
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(b),
          {"mime": "video/x-msvideo", "n_bytes": len(b),
           "width": 16, "height": 8, "duration_ms": 400})],
        MM.MEDIA_SCHEMA,
    )
    row = MM.decode_media(media).collect()[0]
    assert (row.width, row.height) == (16, 8)
    assert row.sample_rate == 5 and row.duration_ms == 400
    assert [round(row.feature[i], 4) for i in range(3)] == [
        0.3922, 0.5882, 0.7843,
    ]


def test_sample_video_frames_uniform_and_exact(spark):
    """sample_video_frames: k uniformly-spaced decoded frames per
    video, exact channel means for solid frames; k >= n yields every
    frame; non-video rows are filtered out before decode."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.avi import (
        encode_avi_mjpeg,
    )

    v = encode_avi_mjpeg(
        8, 8, [bytes([10 * i, 5 * i, i] * 64) for i in range(6)], fps=10
    )
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(v),
             {"mime": "video/x-msvideo", "n_bytes": len(v),
              "width": 8, "height": 8, "duration_ms": 600}),
            (2, "image", bytearray(b"P6 not really"),
             {"mime": "image/x-portable-pixmap", "n_bytes": 13,
              "width": 1, "height": 1, "duration_ms": None}),
        ],
        MM.MEDIA_SCHEMA,
    )
    got = {
        (r.frame_idx, r.mean_r, r.mean_g, r.mean_b, r.n_frames)
        for r in MM.sample_video_frames(media, num_frames=3).collect()
    }
    assert got == {
        (0, 0.0, 0.0, 0.0, 6),
        (2, 20.0, 10.0, 2.0, 6),
        (5, 50.0, 25.0, 5.0, 6),
    }
    allf = MM.sample_video_frames(media, num_frames=99).collect()
    assert sorted(r.frame_idx for r in allf) == list(range(6))


# -- progressive JPEG (SOF2, new r9) ----------------------------------------


def test_cmyk_ycck_jpeg_decodes(spark):
    """4-component Adobe JPEG (new r10): APP14 transform 0 (direct
    inverted CMYK) and 2 (YCCK) both decode; at quality=100 a solid
    block is DC-only, so RGB = ROUND(s*s_k/255) is exact and
    hand-derivable; a structured image stays within DCT rounding of
    the per-pixel formula; unknown APP14 transforms refuse."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    sc, sm, sy, sk = 200, 150, 100, 230
    want = bytes(
        (round(sc * sk / 255), round(sm * sk / 255),
         round(sy * sk / 255))
    )
    for transform in (0, 2):
        b = encode_jpeg_cmyk(
            8, 8, bytes([sc, sm, sy, sk] * 64), transform=transform
        )
        w, h, rgb = decode_jpeg(b)
        assert (w, h) == (8, 8) and rgb == want * 64, transform
    # structured image: within DCT rounding of the formula
    import random

    rnd = random.Random(11)
    stored = bytes(rnd.randrange(256) for _ in range(16 * 8 * 4))
    _w, _h, rgb = decode_jpeg(encode_jpeg_cmyk(16, 8, stored))
    a = np.frombuffer(stored, np.uint8).reshape(8, 16, 4).astype(float)
    expect = np.stack(
        [a[..., i] * a[..., 3] / 255.0 for i in range(3)], axis=2
    )
    got = np.frombuffer(rgb, np.uint8).reshape(8, 16, 3).astype(float)
    assert np.abs(got - expect).max() <= 4.0  # q=100 AC rounding
    # unknown APP14 transform refuses
    b = bytearray(encode_jpeg_cmyk(8, 8, bytes([1, 2, 3, 4] * 64)))
    i = b.find(b"Adobe") + 11
    b[i] = 9
    with pytest.raises(NotImplementedError, match="transform"):
        decode_jpeg(bytes(b))


def test_lossless_jpeg_sof3_round_trips(spark):
    """Lossless JPEG (SOF3, new r10): no DCT — decoding reproduces
    the encoder's input bytes EXACTLY, across all 7 Annex H
    predictors; point transform quantizes to multiples of 2^Pt;
    grayscale replicates; decode_media routes it like any JPEG."""
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rnd = random.Random(4)
    for (w, h) in ((8, 5), (16, 16), (1, 1), (3, 7)):
        rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        for pred in range(1, 8):
            assert decode_jpeg(
                encode_jpeg_lossless(w, h, rgb, predictor=pred)
            ) == (w, h, rgb), (w, h, pred)
    # point transform: output is the input quantized to 2^pt steps
    rgb = bytes(rnd.randrange(256) for _ in range(12 * 4 * 3))
    _w, _h, out = decode_jpeg(
        encode_jpeg_lossless(12, 4, rgb, predictor=4, pt=2)
    )
    assert out == bytes((v >> 2) << 2 for v in rgb)
    # decode_media routes the SOF3 payload to real pixels
    p = encode_jpeg_lossless(4, 4, bytes(range(48)), predictor=7)
    row = MM.decode_media(
        spark.createDataFrame(
            [(1, "image", bytearray(p),
              {"mime": "image/jpeg", "n_bytes": len(p),
               "width": 4, "height": 4, "duration_ms": None})],
            MM.MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert (row.width, row.height) == (4, 4)
    # channel means are plain arithmetic over range(48)
    assert round(row.feature[0], 4) == round(22.5 / 255, 4)


def test_progressive_jpeg_bit_identical_to_baseline():
    """The successive-approximation split is losslessly invertible:
    decoding the progressive encoding equals decoding the baseline
    encoding BIT-FOR-BIT at the same quality — across subsampling,
    grayscale, non-multiple-of-8 dims, and qualities."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        (16, 16, "444", False),
        (24, 17, "420", False),  # unaligned 420: AC grid != MCU grid
        (8, 8, "444", True),
        (33, 9, "444", False),
        (7, 5, "420", False),
    ]
    for w, h, sub, gray in cases:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        for q in (30, 90, 100):
            base = decode_jpeg(
                encode_jpeg(w, h, img, quality=q, subsample=sub,
                            grayscale=gray)
            )
            prog = decode_jpeg(
                encode_jpeg_progressive(
                    w, h, img, quality=q, subsample=sub, grayscale=gray
                )
            )
            assert base == prog, (w, h, sub, gray, q)


def test_progressive_jpeg_smooth_image_eob_runs():
    """A smooth gradient makes most AC bands all-zero — the EOBn
    batching path (multi-block runs + buffered refinement bits) must
    still reproduce the baseline decode exactly, and the progressive
    file should be the smaller one (EOB runs amortize)."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    w, h = 64, 48
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (x * 255 // w, y * 255 // h, 128)
    pb = encode_jpeg_progressive(w, h, img.tobytes(), quality=85)
    bb = encode_jpeg(w, h, img.tobytes(), quality=85)
    assert decode_jpeg(pb) == decode_jpeg(bb)
    got = np.frombuffer(decode_jpeg(pb)[2], np.uint8).reshape(h, w, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 14


def test_progressive_jpeg_solid_exact_and_marker_layout():
    """Solid color at quality=100 round-trips exactly through the
    progressive path too; the file really is SOF2 multi-scan."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    b = encode_jpeg_progressive(
        16, 8, bytes([100, 150, 200] * 128), quality=100
    )
    assert b.count(b"\xff\xc2") == 1 and b.count(b"\xff\xc0") == 0
    assert b.count(b"\xff\xda") >= 6  # multi-scan script
    w, h, rgb = decode_jpeg(b)
    a = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
    assert (w, h) == (16, 8)
    assert (a == np.array([100, 150, 200])).all()


def test_jpeg_arithmetic_and_lossless_still_raise():
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    b = bytearray(
        encode_jpeg_progressive(8, 8, bytes([1, 2, 3] * 64), quality=90)
    )
    i = b.find(b"\xff\xc2")
    # progressive-arithmetic still refuses (SOF3 lossless decodes
    # since r10, so a flipped-marker stream now fails as MALFORMED
    # lossless data instead of as an unsupported process)
    b2 = bytearray(b)
    b2[i + 1] = 0xCA
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(b2))
    b3 = bytearray(b)
    b3[i + 1] = 0xC3
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(b3))


# -- animated GIF multi-frame decode (new r9) --------------------------------


def test_gif_animation_full_frames_round_trip():
    """Multi-frame GIF: all frames decode losslessly, delays carried;
    the single-frame fast path still serves frame 1."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    frames = [
        bytes([3 * i + 1, 7 * i + 2, 11 * i + 3] * 12) for i in range(6)
    ]
    b = encode_gif_animation(4, 3, frames, delay_cs=4)
    d = decode_gif_frames(b)
    assert (d["width"], d["height"], d["n_frames"]) == (4, 3, 6)
    assert d["delays_ms"] == [40] * 6
    assert d["frames"] == frames
    assert _decode_gif(b) == (4, 3, frames[0])


def test_gif_animation_subrect_composite_and_disposal():
    """Sub-rectangle patch frames composite onto the canvas; disposal
    3 restores the pre-frame canvas before the next frame lands."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = bytes([1, 1, 1] * 12)
    patch = bytes([9, 9, 9] * 2)  # 2x1 rect at (1,1)
    last = bytes([5, 5, 5] * 2)  # 2x1 rect at (0,0)
    b = encode_gif_animation(
        4, 3, [base, patch, last],
        rects=[(0, 0, 4, 3), (1, 1, 2, 1), (0, 0, 2, 1)],
        disposals=[1, 3, 1],
    )
    d = decode_gif_frames(b)
    f2 = bytearray(base)
    for c in range(2):
        o = (1 * 4 + 1 + c) * 3
        f2[o : o + 3] = bytes([9, 9, 9])
    assert d["frames"][1] == bytes(f2)
    f3 = bytearray(base)  # frame 2's patch was disposed (restore prev)
    for c in range(2):
        f3[c * 3 : c * 3 + 3] = bytes([5, 5, 5])
    assert d["frames"][2] == bytes(f3)


def test_sample_video_frames_handles_gif(spark):
    """sample_video_frames routes GIF payloads through the multi-frame
    decode — exact channel means (GIF is lossless)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        encode_gif_animation,
    )

    frames = [bytes([10 * i, 5 * i, i] * 12) for i in range(5)]
    g = encode_gif_animation(4, 3, frames, delay_cs=10)
    media = spark.createDataFrame(
        [(7, "video", bytearray(g),
          {"mime": "image/gif", "n_bytes": len(g),
           "width": 4, "height": 3, "duration_ms": 500})],
        MM.MEDIA_SCHEMA,
    )
    got = sorted(
        (r.frame_idx, r.width, r.height, r.mean_r, r.mean_g, r.mean_b)
        for r in MM.sample_video_frames(media, num_frames=3).collect()
    )
    assert got == [
        (0, 4, 3, 0.0, 0.0, 0.0),
        (2, 4, 3, 20.0, 10.0, 2.0),
        (4, 4, 3, 40.0, 20.0, 4.0),
    ]


# -- compressed WAV codecs (new r9): G.711 + IMA ADPCM -----------------------


def test_g711_tables_match_stdlib_reference():
    """The u-law/A-law decode tables must equal an INDEPENDENT
    implementation byte-for-byte (stdlib audioop, present on this
    Python; skip where removed)."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _ALAW_TABLE,
        _ULAW_TABLE,
    )

    codes = bytes(range(256))
    assert (
        np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2") == _ULAW_TABLE
    ).all()
    assert (
        np.frombuffer(audioop.alaw2lin(codes, 2), "<i2") == _ALAW_TABLE
    ).all()


def test_compressed_wav_round_trips_and_decode_media(spark):
    """u-law/A-law within G.711 quantization, IMA ADPCM within its
    adaptation envelope after convergence; decode_media serves real
    rate/duration/features for all three; unknown tags still raise."""
    import math

    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _decode_wav,
        decode_media,
        encode_wav_compressed,
    )

    sine = [
        int(12000 * math.sin(2 * math.pi * 200 * i / 16000))
        for i in range(4000)
    ]
    payloads = {}
    for fmt in ("ulaw", "alaw"):
        b = encode_wav_compressed(16000, 1, sine, fmt)
        rate, ch, frames, a = _decode_wav(b)
        assert (rate, ch, frames) == (16000, 1, 4000)
        err = np.abs(
            (a[:, 0] * 32768).round().astype(int) - np.array(sine)
        )
        assert err.max() < 1024  # half the top G.711 segment step
        payloads[fmt] = b
    b = encode_wav_compressed(16000, 1, sine, "ima")
    rate, ch, frames, a = _decode_wav(b)
    got = (a[:, 0] * 32768).round().astype(int)[: len(sine)]
    err = np.abs(got - np.array(sine))
    assert err[100:].max() < 800  # post-adaptation envelope
    payloads["ima"] = b
    # stereo IMA: channels de-interleave correctly (distinct tones)
    stereo = []
    for i in range(4000):
        stereo += [
            int(9000 * math.sin(2 * math.pi * 150 * i / 8000)),
            int(7000 * math.sin(2 * math.pi * 350 * i / 8000)),
        ]
    rate, ch, frames, a = _decode_wav(
        encode_wav_compressed(8000, 2, stereo, "ima", block_align=256)
    )
    assert ch == 2
    src = np.array(stereo).reshape(-1, 2)
    got = (a * 32768).round().astype(int)[: src.shape[0]]
    assert np.abs(got[200:] - src[200 : got.shape[0]]).max() < 1200
    # decode_media: real rate + duration for compressed payloads
    rows = [
        (i, "audio", bytearray(p),
         {"mime": "audio/wav", "n_bytes": len(p),
          "width": 1, "height": None, "duration_ms": 250})
        for i, p in enumerate(payloads.values())
    ]
    out = decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()
    for r in out:
        assert r.sample_rate == 16000 and r.duration_ms in (250, 252)
        # real peak from real samples: amplitude 12000/32768 ~ 0.366
        assert 0.3 < r.feature[1] <= 0.45
    # unsupported tag (e.g. MP3 = 0x55) still the declared boundary
    import struct

    bad = bytearray(payloads["ulaw"])
    i = bad.find(b"fmt ") + 8
    bad[i : i + 2] = struct.pack("<H", 0x55)
    with pytest.raises(Exception, match="format tag|NotImplemented"):
        _decode_wav(bytes(bad))


# -- ISO-BMFF (MP4) container (new r9) ---------------------------------------


def test_mp4_mjpeg_round_trip_and_metadata():
    """Minimal MJPEG MP4 fixture parses: codec/dims/frames/duration
    from the box tree, per-sample byte ranges from stsz/stco/stsc;
    solid frames decode exactly at quality=100."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.mp4 import (
        decode_mp4_frame,
        encode_mp4_mjpeg,
        parse_mp4,
    )

    colors = [(100, 150, 200), (10, 20, 30), (250, 1, 128)]
    b = encode_mp4_mjpeg(
        16, 8, [bytes(list(c) * 128) for c in colors], fps=10
    )
    p = parse_mp4(b)
    assert (p["codec"], p["width"], p["height"]) == ("jpeg", 16, 8)
    assert (p["n_frames"], p["fps"], p["duration_ms"]) == (3, 10, 300)
    for i, c in enumerate(colors):
        w, h, rgb = decode_mp4_frame(p, i)
        a = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
        assert (a == np.array(c)).all(), i
    # foreign bytes / missing boxes raise ValueError
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00" * 32)
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(b[: b.find(b"moov") - 4])


def test_mp4_interframe_codec_metadata_only(spark):
    """An avc1-style track parses to metadata; pixel decode raises
    the declared boundary; decode_media serves dims/fps/duration
    with a NULL feature."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.mp4 import (
        decode_mp4_frame,
        encode_mp4_mjpeg,
        parse_mp4,
    )

    b = bytearray(
        encode_mp4_mjpeg(16, 8, [bytes([1, 2, 3] * 128)] * 2, fps=4)
    )
    i = b.find(b"jpeg", b.find(b"stsd"))
    b[i : i + 4] = b"avc1"
    p = parse_mp4(bytes(b))
    assert p["codec"] == "avc1" and p["n_frames"] == 2
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frame(p, 0)
    media = spark.createDataFrame(
        [(1, "video", bytearray(bytes(b)),
          {"mime": "video/mp4", "n_bytes": len(b),
           "width": 16, "height": 8, "duration_ms": 500})],
        MM.MEDIA_SCHEMA,
    )
    row = MM.decode_media(media).collect()[0]
    assert (row.width, row.height, row.sample_rate) == (16, 8, 4)
    assert row.duration_ms == 500 and row.feature is None


def test_sample_video_frames_handles_mp4(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.mp4 import (
        encode_mp4_mjpeg,
    )

    v = encode_mp4_mjpeg(
        8, 8, [bytes([10 * i, 5 * i, i] * 64) for i in range(5)], fps=10
    )
    media = spark.createDataFrame(
        [(9, "video", bytearray(v),
          {"mime": "video/mp4", "n_bytes": len(v),
           "width": 8, "height": 8, "duration_ms": 500})],
        MM.MEDIA_SCHEMA,
    )
    got = sorted(
        (r.frame_idx, r.mean_r, r.mean_g, r.mean_b)
        for r in MM.sample_video_frames(media, num_frames=3).collect()
    )
    assert got == [
        (0, 0.0, 0.0, 0.0),
        (2, 20.0, 10.0, 2.0),
        (4, 40.0, 20.0, 4.0),
    ]


def test_wav_pcm_width_variants_decode():
    """PCM 8 (unsigned) / 24 / 32-bit and IEEE float WAVs decode to
    the same normalized samples as the PCM16 reference encoding."""
    import math
    import struct

    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_wav,
        encode_wav,
    )

    sine16 = [
        int(12000 * math.sin(2 * math.pi * 100 * i / 8000))
        for i in range(800)
    ]
    _, _, _, ref = _decode_wav(encode_wav(8000, 1, sine16))

    def wav(fmt_tag, bits, data):
        body = struct.pack(
            "<HHIIHH", fmt_tag, 1, 8000, 8000 * bits // 8, bits // 8, bits
        )
        return (
            b"RIFF" + (28 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + body
            + b"data" + len(data).to_bytes(4, "little") + data
        )

    # 8-bit unsigned
    d8 = bytes((s >> 8) + 128 for s in sine16)
    _, _, n, a = _decode_wav(wav(1, 8, d8))
    assert n == 800 and np.abs(a[:, 0] - ref[:, 0]).max() < 1 / 100
    # 24-bit
    d24 = b"".join(
        ((s << 8) & 0xFFFFFF).to_bytes(3, "little") for s in sine16
    )
    _, _, n, a = _decode_wav(wav(1, 24, d24))
    assert n == 800 and np.abs(a[:, 0] - ref[:, 0]).max() < 1e-9
    # 32-bit int
    d32 = struct.pack("<800i", *[s << 16 for s in sine16])
    _, _, n, a = _decode_wav(wav(1, 32, d32))
    assert n == 800 and np.abs(a[:, 0] - ref[:, 0]).max() < 1e-9
    # IEEE float32
    df = struct.pack("<800f", *[s / 32768.0 for s in sine16])
    _, _, n, a = _decode_wav(wav(3, 32, df))
    assert n == 800 and np.abs(a[:, 0] - ref[:, 0]).max() < 1e-6


# -- EXIF metadata (new r9) ---------------------------------------------------


def test_exif_round_trip_both_byte_orders_and_strip():
    """EXIF APP1 write->parse round trip in II and MM byte orders;
    strip_exif removes the segment without touching pixels."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.exif import (
        insert_app1,
        make_exif_app1,
        parse_exif,
        strip_exif,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    base = encode_jpeg(16, 8, bytes([100, 150, 200] * 128), quality=90)
    for bo in ("II", "MM"):
        j = insert_app1(
            base,
            make_exif_app1(
                make="ACME", model="Cam 9", orientation=6,
                datetime="2024:01:02 03:04:05",
                datetime_original="2023:12:31 23:59:58",
                pixel_x=16, pixel_y=8, iso=400,
                gps=(37.7749, -122.4194), byte_order=bo,
            ),
        )
        meta = parse_exif(j)
        assert meta["make"] == "ACME" and meta["orientation"] == 6
        assert meta["datetime_original"] == "2023:12:31 23:59:58"
        assert (meta["pixel_x"], meta["pixel_y"], meta["iso"]) == (
            16, 8, 400,
        )
        assert (meta["gps_lat"], meta["gps_lon"]) == (
            37.7749, -122.4194,
        )
        assert decode_jpeg(j) == decode_jpeg(base)
        stripped = strip_exif(j)
        assert decode_jpeg(stripped) == decode_jpeg(base)
        with pytest.raises(ValueError, match="no EXIF"):
            parse_exif(stripped)
    with pytest.raises(ValueError, match="no EXIF"):
        parse_exif(base)


def test_extract_exif_operator(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.exif import (
        insert_app1,
        make_exif_app1,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        encode_jpeg,
    )

    base = encode_jpeg(8, 8, bytes([1, 2, 3] * 64), quality=90)
    j = insert_app1(base, make_exif_app1(make="X", orientation=3))
    rows = [
        (1, "image", bytearray(j),
         {"mime": "image/jpeg", "n_bytes": len(j),
          "width": 8, "height": 8, "duration_ms": None}),
        (2, "image", bytearray(base),
         {"mime": "image/jpeg", "n_bytes": len(base),
          "width": 8, "height": 8, "duration_ms": None}),
        (3, "image", bytearray(b"P6 1 1 255 xxx"),
         {"mime": "image/x-portable-pixmap", "n_bytes": 14,
          "width": 1, "height": 1, "duration_ms": None}),
    ]
    got = {
        r.media_id: (r.has_exif, r.make, r.orientation)
        for r in MM.extract_exif(
            spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        ).collect()
    }
    # non-JPEG payloads are skipped entirely
    assert got == {1: (True, "X", 3), 2: (False, None, None)}


# -- perceptual audio container metadata (new r9) -----------------------------


def test_mp3_frame_walk_and_id3(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.audio_meta import (
        encode_mp3_silence,
        parse_mp3,
    )

    b = encode_mp3_silence(
        n_frames=38, sample_rate=44100, bitrate=128,
        tags={"TIT2": "Song A", "TPE1": "Artist B", "TALB": "Album C"},
    )
    m = parse_mp3(b)
    assert (m["title"], m["artist"], m["album"]) == (
        "Song A", "Artist B", "Album C",
    )
    assert (m["sample_rate"], m["channels"], m["n_frames"]) == (
        44100, 2, 38,
    )
    assert m["duration_ms"] == 38 * 1152 * 1000 // 44100
    assert m["vbr"] is False
    # trailing junk after the last frame is tolerated
    m2 = parse_mp3(b + b"TAGjunkjunk")
    assert m2["n_frames"] == 38
    with pytest.raises(ValueError, match="frames"):
        parse_mp3(b"ID3\x03\x00\x00\x00\x00\x00\x00no frames here")
    # decode_media: metadata with a null feature
    row = MM.decode_media(
        spark.createDataFrame(
            [(1, "audio", bytearray(b),
              {"mime": "audio/mpeg", "n_bytes": len(b),
               "width": 2, "height": None, "duration_ms": 992})],
            MM.MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert row.sample_rate == 44100 and row.duration_ms == 992
    assert row.feature is None


def test_flac_streaminfo_and_tags():
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.audio_meta import (
        encode_flac_headers,
        parse_flac,
    )

    f = encode_flac_headers(
        96000, 2, 24, 960000, tags={"TITLE": "X", "ARTIST": "Y"}
    )
    m = parse_flac(f)
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) == (
        96000, 2, 24,
    )
    assert m["duration_ms"] == 10000
    assert m["tags"] == {"TITLE": "X", "ARTIST": "Y"}
    with pytest.raises(ValueError, match="FLAC"):
        parse_flac(b"not flac")


def test_png_text_metadata_parse():
    """PNG ancillary metadata (new r9): tEXt/zTXt/iTXt (incl.
    zlib-deflated + utf-8) and pHYs DPI parse without pixel decode;
    the spliced chunks leave the pixel decode byte-identical."""
    import struct
    import zlib

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_png,
        encode_png,
        parse_png_metadata,
        png_text_chunks,
    )

    png = encode_png(2, 2, bytes([255, 0, 0, 0, 255, 0, 0, 0, 255,
                                  9, 9, 9]))
    ihdr_end = 8 + 8 + 13 + 4

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", crc
        )

    extra = png_text_chunks({"Title": "Fixture"}, dpi=300)
    extra += chunk(
        b"zTXt", b"Comment\x00\x00" + zlib.compress(b"deflated text")
    )
    extra += chunk(
        b"iTXt",
        b"Desc\x00\x01\x00en\x00\x00" + zlib.compress("uni ✓".encode()),
    )
    spliced = png[:ihdr_end] + extra + png[ihdr_end:]
    m = parse_png_metadata(spliced)
    assert m["texts"] == {
        "Title": "Fixture", "Comment": "deflated text", "Desc": "uni ✓",
    }
    assert m["dpi"] == 300 and (m["width"], m["height"]) == (2, 2)
    assert _decode_png(spliced) == _decode_png(png)
    with pytest.raises(ValueError, match="PNG"):
        parse_png_metadata(b"nope")


def test_webp_header_dims_metadata_only():
    """WebP (new r9): dims parse from VP8/VP8L/VP8X headers — pixel
    decode stays external (null feature through decode_media)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        _decode_bytes,
    )

    def riff(chunks: bytes) -> bytes:
        return (
            b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP"
            + chunks
        )

    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) % 2 else b""
        )

    # VP8 lossy keyframe: 3-byte tag + sync + 14-bit dims
    vp8 = chunk(
        b"VP8 ",
        b"\x00\x00\x00\x9d\x01\x2a"
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little"),
    )
    m = _decode_bytes(riff(vp8))
    assert (m["width"], m["height"], m["feature"]) == (320, 240, None)
    # VP8L lossless: 0x2f + packed 14+14 bit dims (stored -1)
    bits = (99) | (49 << 14)
    vp8l = chunk(b"VP8L", b"\x2f" + bits.to_bytes(4, "little"))
    m = _decode_bytes(riff(vp8l))
    assert (m["width"], m["height"]) == (100, 50)
    # VP8X extended: 24-bit canvas dims (stored -1)
    vp8x = chunk(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (799).to_bytes(3, "little") + (599).to_bytes(3, "little"),
    )
    m = _decode_bytes(riff(vp8x))
    assert (m["width"], m["height"]) == (800, 600)
    with pytest.raises(ValueError, match="WebP"):
        _decode_bytes(riff(chunk(b"JUNK", b"\x00" * 8)))


def test_tiff_round_trip_and_boundaries(spark):
    """Baseline uncompressed TIFF (new r9): lossless round trip
    through the IFD reader + strip concat; compression refuses."""
    import struct

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rgb = bytes(range(4 * 3 * 3))
    b = encode_tiff(4, 3, rgb)
    assert decode_tiff(b) == (4, 3, rgb)
    # decode_media routes the TIFF magic to real pixels
    row = MM.decode_media(
        spark.createDataFrame(
            [(1, "image", bytearray(b),
              {"mime": "image/tiff", "n_bytes": len(b),
               "width": 4, "height": 3, "duration_ms": None})],
            MM.MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert (row.width, row.height) == (4, 3) and row.feature is not None
    # old-style JPEG (6) refuses (LZW decodes since r10, deflate and
    # new-style JPEG since r11)
    bad = bytearray(b)
    i = bad.find(struct.pack("<HHI", 259, 3, 1))
    bad[i + 8 : i + 10] = struct.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(bad))


def test_tiff_multi_strip_and_packbits(spark):
    """Multi-strip + PackBits TIFF (new r10, ADVICE r9 fix): count>1
    StripOffsets/StripByteCounts decode via the full IFD value lists
    (real scanner TIFFs set rows_per_strip < height), and PackBits
    (compression 32773) decompresses per strip — both lossless round
    trips against the independent fixture writer."""
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
        packbits_decode,
        packbits_encode,
    )

    rnd = random.Random(10)
    rgb = bytes(rnd.randrange(256) for _ in range(6 * 5 * 3))
    # multi-strip uncompressed, strip boundaries mid-image
    for rps in (1, 2, 3, 5):
        assert decode_tiff(
            encode_tiff(6, 5, rgb, rows_per_strip=rps)
        ) == (6, 5, rgb)
    # PackBits, single- and multi-strip
    assert decode_tiff(
        encode_tiff(6, 5, rgb, compression="packbits")
    ) == (6, 5, rgb)
    assert decode_tiff(
        encode_tiff(6, 5, rgb, rows_per_strip=2,
                    compression="packbits")
    ) == (6, 5, rgb)
    # PackBits RLE round trips on edge shapes (spec: literal runs,
    # replicate runs, both capped at 128; -128 control is a no-op)
    for data in (b"", b"a", b"a" * 300, bytes(range(256)) * 2,
                 b"aabbbccd" * 40):
        assert packbits_decode(packbits_encode(data)) == data
    assert packbits_decode(b"\x80\x00a") == b"a"  # no-op control
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab")  # literal run short
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\xfe")  # replicate run missing byte
    # byte runs compress (grayscale/fax profile): 300 -> <=8 bytes
    assert len(packbits_encode(bytes([77] * 300))) <= 8


def test_tiff_lzw_codec_and_decode(spark):
    """TIFF LZW (compression 5, new r10): MSB-first variable-width
    codes with the spec's early-change rule — round trips across the
    9->10->11->12-bit boundaries and a mid-stream ClearCode; the
    9-bit MSB packing of the stream head is pinned by INDEPENDENT
    bit arithmetic; full-TIFF decode matches; predictor-2 and
    unknown compressions refuse."""
    import random
    import struct

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    rnd = random.Random(5)
    for data in (
        b"",
        b"a",
        b"TOBEORNOTTOBEORTOBEORNOT",
        b"ab" * 5000,  # long run of 2-byte period
        bytes(rnd.randrange(256) for _ in range(20000)),  # all widths
        bytes(rnd.choice(b"abcd") for _ in range(30000)),  # + clear
    ):
        assert tiff_lzw_decode(tiff_lzw_encode(data)) == data
    # independent pin of the bit layout: first codes of the classic
    # string are CLEAR, T, O, B, E — unpacked here by hand, not by
    # the codec under test
    enc = tiff_lzw_encode(b"TOBEORNOTTOBEORTOBEORNOT")
    acc = int.from_bytes(enc[:8], "big")
    got = [(acc >> (64 - 9 * (k + 1))) & 0x1FF for k in range(5)]
    assert got == [256, 84, 79, 66, 69], got
    # full-TIFF LZW decode, single- and multi-strip
    rgb = bytes(rnd.randrange(256) for _ in range(40 * 40 * 3))
    assert decode_tiff(
        encode_tiff(40, 40, rgb, compression="lzw")
    ) == (40, 40, rgb)
    assert decode_tiff(
        encode_tiff(40, 40, rgb, rows_per_strip=7, compression="lzw")
    ) == (40, 40, rgb)
    # old-style JPEG (6) refuses; corrupt LZW raises, not garbage
    bad = bytearray(encode_tiff(4, 2, bytes(24), compression="lzw"))
    i = bad.find(struct.pack("<HHI", 259, 3, 1))
    bad[i + 8 : i + 10] = struct.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError, match="LZW"):
        tiff_lzw_decode(b"\xff\xff\xff\xff")  # no leading ClearCode
    # decode_media routes the packbits payload to real pixels
    p = encode_tiff(4, 6, bytes([90, 60, 30] * 24), rows_per_strip=2,
                    compression="packbits")
    row = MM.decode_media(
        spark.createDataFrame(
            [(1, "image", bytearray(p),
              {"mime": "image/tiff", "n_bytes": len(p),
               "width": 4, "height": 6, "duration_ms": None})],
            MM.MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert (row.width, row.height) == (4, 6)
    assert round(row.feature[0], 4) == round(90 / 255, 4)


def test_tiff_deflate_and_predictor(spark):
    """TIFF Deflate (compression 8/32946, new r11) + the §14
    horizontal-differencing predictor (tag 317 = 2): lossless round
    trips single- and multi-strip, predictor with LZW too; the
    big-endian/old-style deflate code decodes; predictor 3 and
    predictor-2-on-uncompressed refuse; decode_media routes it."""
    import random
    import struct

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rnd = random.Random(11)
    rgb = bytes(rnd.randrange(256) for _ in range(9 * 7 * 3))
    for kwargs in (
        {"compression": "deflate"},
        {"compression": "deflate", "rows_per_strip": 3},
        {"compression": "deflate", "predictor": 2},
        {"compression": "deflate", "predictor": 2, "rows_per_strip": 2},
        {"compression": "lzw", "predictor": 2},
        {"compression": "lzw", "predictor": 2, "rows_per_strip": 4},
    ):
        assert decode_tiff(encode_tiff(9, 7, rgb, **kwargs)) == (
            9, 7, rgb,
        ), kwargs
    # a smooth gradient compresses BETTER with the predictor — the
    # reason the tag exists
    grad = bytes((x * 2 + c) & 0xFF for _y in range(16)
                 for x in range(16) for c in range(3))
    plain = encode_tiff(16, 16, grad, compression="deflate")
    pred = encode_tiff(16, 16, grad, compression="deflate", predictor=2)
    assert len(pred) < len(plain)
    # old-style deflate code 32946 decodes identically
    b = bytearray(encode_tiff(4, 3, rgb[: 4 * 3 * 3],
                              compression="deflate"))
    i = b.find(struct.pack("<HHI", 259, 3, 1))
    b[i + 8 : i + 10] = struct.pack("<H", 32946 & 0xFFFF)
    assert decode_tiff(bytes(b)) == (4, 3, rgb[: 4 * 3 * 3])
    # floating-point predictor (3) refuses
    p2 = bytearray(encode_tiff(4, 3, rgb[: 4 * 3 * 3],
                               compression="deflate", predictor=2))
    j = p2.find(struct.pack("<HHI", 317, 3, 1))
    p2[j + 8 : j + 10] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError, match="predictor 3"):
        decode_tiff(bytes(p2))
    # predictor 2 on uncompressed data refuses (spec scope): flip a
    # deflate file's compression tag to 1 and keep tag 317
    v = bytearray(encode_tiff(4, 3, rgb[: 4 * 3 * 3],
                              compression="deflate", predictor=2))
    m = v.find(struct.pack("<HHI", 259, 3, 1))
    v[m + 8 : m + 10] = struct.pack("<H", 1)
    with pytest.raises(NotImplementedError, match="predictor 2"):
        decode_tiff(bytes(v))
    # decode_media routes the deflate+predictor payload to pixels
    p = encode_tiff(4, 4, bytes(range(48)), compression="deflate",
                    predictor=2)
    row = MM.decode_media(
        spark.createDataFrame(
            [(1, "image", bytearray(p),
              {"mime": "image/tiff", "n_bytes": len(p),
               "width": 4, "height": 4, "duration_ms": None})],
            MM.MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert (row.width, row.height) == (4, 4)
    assert round(row.feature[0], 4) == round(22.5 / 255, 4)


def test_ogg_opus_metadata(spark):
    """Ogg page walk + OpusHead (new r9): channels/rate/pre-skip and
    duration from the last granule; unknown codec ids refuse."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.audio_meta import (
        encode_ogg_opus_headers,
        parse_ogg,
    )

    b = encode_ogg_opus_headers(
        channels=2, input_rate=44100, pre_skip=312,
        total_samples_48k=96000,
    )
    m = parse_ogg(b)
    assert m == {
        "codec": "opus", "channels": 2, "sample_rate": 44100,
        "pre_skip": 312, "duration_ms": 2000,
    }
    row = MM.decode_media(
        spark.createDataFrame(
            [(1, "audio", bytearray(b),
              {"mime": "audio/ogg", "n_bytes": len(b),
               "width": 2, "height": None, "duration_ms": 2000})],
            MM.MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert row.sample_rate == 44100 and row.duration_ms == 2000
    assert row.feature is None
    bad = bytearray(b)
    i = bad.find(b"OpusHead")
    bad[i : i + 8] = b"Speex   "
    with pytest.raises(NotImplementedError, match="codec id"):
        parse_ogg(bytes(bad))


def test_progressive_jpeg_restart_markers():
    """Progressive scans with DRI/RSTn (the decoder resets DC
    predictors + EOB runs at each marker, per scan-unit counting:
    MCUs interleaved / blocks non-interleaved) — still bit-identical
    to the baseline decode, and the file really carries RSTn."""
    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(23)
    for w, h, sub in [(32, 24, "444"), (24, 17, "420")]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg(w, h, img, quality=88,
                                       subsample=sub))
        for ri in (1, 3):
            enc = encode_jpeg_progressive(
                w, h, img, quality=88, subsample=sub,
                restart_interval=ri,
            )
            assert b"\xff\xdd" in enc  # DRI
            assert any(
                bytes((0xFF, 0xD0 + k)) in enc for k in range(8)
            )
            assert decode_jpeg(enc) == base, (w, h, sub, ri)

def test_tiff_tiled_and_jpeg_in_tiff(spark):
    """Tiled TIFF (§15, tags 322-325) + new-style JPEG-in-TIFF
    (compression 7, TechNote 2) — both new r11: tiles stitch with
    edge cropping and per-tile predictor undo for every codec;
    JPEG segments (lossless SOF3, so byte-exact) decode per
    strip/tile with shared tables from the JPEGTables tag spliced
    after each segment's SOI; malformed layouts raise."""
    import random
    import struct

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.tiff import (
        _extract_jpeg_dht,
        _jpeg_with_tables,
        decode_tiff,
        encode_tiff,
    )

    rnd = random.Random(4)
    w, h = 17, 9  # deliberately not multiples of the tile size
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    for kw in (
        {"tile_size": (8, 8)},
        {"tile_size": (8, 8), "compression": "deflate", "predictor": 2},
        {"tile_size": (4, 8), "compression": "lzw", "predictor": 2},
        {"tile_size": (8, 4), "compression": "packbits"},
        {"compression": "jpeg"},
        {"compression": "jpeg", "rows_per_strip": 4},
        {"compression": "jpeg", "rows_per_strip": 4,
         "jpeg_tables": True},
        {"tile_size": (8, 8), "compression": "jpeg"},
        {"tile_size": (8, 8), "compression": "jpeg",
         "jpeg_tables": True},
    ):
        assert decode_tiff(encode_tiff(w, h, rgb, **kw)) == (
            w, h, rgb,
        ), kw
    # the shared-tables fixture really is abbreviated: across
    # multiple strips the single shared DHT beats one per strip
    shared = encode_tiff(w, h, rgb, compression="jpeg",
                         rows_per_strip=2, jpeg_tables=True)
    plain = encode_tiff(w, h, rgb, compression="jpeg",
                        rows_per_strip=2)
    assert len(shared) < len(plain)  # one table, not per-strip
    # and the split helper really removes the DHT segment (the first
    # strip stream starts at offset 8 and ends at its EOI — FF bytes
    # inside entropy data are stuffed as FF 00, so FF D9 is the EOI)
    end = plain.index(b"\xff\xd9", 8) + 2
    body, dht = _extract_jpeg_dht(plain[8:end])
    assert b"\xff\xc4" in dht and b"\xff\xc4" not in body
    # splice refuses a tables-less non-JPEG segment
    with pytest.raises(ValueError, match="SOI"):
        _jpeg_with_tables(b"\x00\x01", None)
    # tile grid short of the image raises
    bad = bytearray(encode_tiff(w, h, rgb, tile_size=(8, 8)))
    i = bad.find(struct.pack("<HHI", 257, 3, 1))
    bad[i + 8 : i + 10] = struct.pack("<H", h * 3)  # claim 3x height
    with pytest.raises(ValueError, match="tile count"):
        decode_tiff(bytes(bad))

def test_jpeg_12bit_extended_sequential(spark):
    """12-bit extended sequential JPEG (SOF1 precision 12, new r11):
    16-bit DQT entries, the wider SSSS alphabet, level shift 2048,
    P-bit range mapped onto RGB24. Solid colors are DC-only with the
    all-ones tables, so decode == min(255, ROUND(v/16)) exactly;
    arbitrary content stays within the /16 rounding envelope;
    12-bit via SOF0 still refuses."""
    import random
    import struct

    import numpy as np

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg12,
    )

    for r, g, b in [(0, 0, 0), (4095, 4095, 4095), (1000, 2000, 3000),
                    (123, 45, 4000)]:
        w, h, rgb = decode_jpeg(encode_jpeg12(8, 8, [r, g, b] * 64))
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        assert (a == [min(255, round(v / 16)) for v in (r, g, b)]).all()
    rnd = random.Random(2)
    samples = [rnd.randrange(4096) for _ in range(12 * 10 * 3)]
    w, h, rgb = decode_jpeg(encode_jpeg12(12, 10, samples))
    a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    want = np.clip(np.array(samples).reshape(10, 12, 3) / 16.0, 0, 255)
    assert np.abs(a - want).max() <= 1.0
    # non-multiple-of-8 dims pad with edge replication
    w, h, rgb = decode_jpeg(encode_jpeg12(5, 3, [100, 200, 300] * 15))
    assert (w, h) == (5, 3)
    # out-of-range samples refuse
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg12(2, 2, [5000] * 12)
    # SOF0 with precision 12 still refuses (baseline is 8-bit only)
    enc = bytearray(encode_jpeg12(4, 4, [1, 2, 3] * 16))
    i = enc.find(b"\xff\xc1")
    enc[i + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="precision 12"):
        decode_jpeg(bytes(enc))
