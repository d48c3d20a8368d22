"""Multimodal plumbing tests: schemas, batch shapes, deterministic fakes."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.functions.multimodal import (
    extract_image_features,
    sample_video_frames,
    with_image_meta,
)


@pytest.fixture()
def blobs(spark):
    rows = [
        Row(id=1, image=b"\xff\xd8\xff\xe0" + b"j" * 100),   # jpeg magic
        Row(id=2, image=b"\x89PNG\r\n\x1a\n" + b"p" * 50),   # png magic
        Row(id=3, image=b"garbage-bytes"),
        Row(id=4, image=None),
    ]
    return spark.createDataFrame(rows)


def test_extract_image_features_contract(blobs):
    out = extract_image_features(blobs, blob_col="image")
    assert out.schema.simpleString() == (
        "struct<id:bigint,n_bytes:bigint,content_hash:string,"
        "features:array<float>>"
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 104
    assert rows[1]["content_hash"] == hashlib.md5(
        b"\xff\xd8\xff\xe0" + b"j" * 100
    ).hexdigest()
    assert len(rows[1]["features"]) == 8
    assert all(0 <= v <= 1 for v in rows[1]["features"])
    assert rows[4]["n_bytes"] == 0 and rows[4]["features"] is None
    # determinism
    again = {r["id"]: r for r in extract_image_features(blobs, blob_col="image").collect()}
    assert again[2]["features"] == rows[2]["features"]


def test_real_decoder_is_explicitly_stubbed(spark):
    # WebP: a real format with NO native decoder here (BMP/PNG/GIF/
    # baseline JPEG all decode for real now), so the raise is the
    # explicit needs-Pillow stub, not a corrupt-payload codec error
    webp = spark.createDataFrame(
        [Row(id=1, image=b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"w" * 40)]
    )
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        extract_image_features(
            webp, blob_col="image", use_fake_decoder=False
        ).collect()


def test_video_frame_sampling(spark):
    video = b"frame-bytes!" * 400  # 4800 bytes -> 75 fake frames
    df = spark.createDataFrame([Row(id=9, video=video)])
    out = sample_video_frames(df, blob_col="video", every_n=30).collect()
    assert [r["frame_idx"] for r in out] == [0, 30, 60]
    assert all(r["id"] == 9 for r in out)


def test_image_meta_routing(blobs):
    out = with_image_meta(blobs, "image")
    got = {r["id"]: r["meta"]["format"] for r in out.collect()}
    assert got[1] == "jpeg"
    assert got[2] == "png"
    assert got[3] == "unknown"


def test_resize_contract_dims_and_determinism(spark):
    from feast_spark.functions.multimodal import resize_images

    df = spark.createDataFrame(
        [Row(id=1, image=b"\xff\xd8\xff\xe0" + b"x" * 100),
         Row(id=2, image=None)]
    )
    out = {r["id"]: r for r in resize_images(df, width=64, height=32).collect()}
    assert out[1]["meta"]["width"] == 64
    assert out[1]["meta"]["height"] == 32
    assert out[2]["image"] is None
    # deterministic fake payload: md5 + packed dims
    again = {r["id"]: r for r in resize_images(df, width=64, height=32).collect()}
    assert bytes(out[1]["image"]) == bytes(again[1]["image"])
    assert len(bytes(out[1]["image"])) == 16 + 4


def test_audio_features_rms_fake_pcm(spark):
    from feast_spark.functions.multimodal import extract_audio_features

    silent = bytes([128] * 64)          # zero signal
    loud = bytes([255, 0] * 32)         # max swing
    df = spark.createDataFrame([Row(id=1, audio=silent), Row(id=2, audio=loud)])
    out = {r["id"]: r for r in extract_audio_features(df).collect()}
    assert out[1]["rms"] == 0.0
    assert out[2]["rms"] > 100.0
    assert len(out[2]["features"]) == 8


# ---------------------------------------------------------------------------
# real pure-Python codecs (functions/codecs.py)
# ---------------------------------------------------------------------------


def _bmp_4x4():
    import numpy as np

    from feast_spark.functions.codecs import encode_bmp

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = [255, 0, 0]    # top-left red
    img[:2, 2:] = [0, 255, 0]    # top-right green
    img[2:, :2] = [0, 0, 255]    # bottom-left blue
    img[2:, 2:] = [255, 255, 0]  # bottom-right yellow
    return img, encode_bmp(img)


def test_bmp_roundtrip_and_header_dims():
    import numpy as np

    from feast_spark.functions.codecs import decode_bmp, parse_image_dims

    img, blob = _bmp_4x4()
    assert parse_image_dims(blob) == ("bmp", 4, 4)
    assert np.array_equal(decode_bmp(blob), img)


def test_parse_dims_png_gif_jpeg():
    import struct

    from feast_spark.functions.codecs import parse_image_dims

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0) + b"\x00" * 8
    )
    assert parse_image_dims(png) == ("png", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    assert parse_image_dims(gif) == ("gif", 320, 200)
    # minimal JPEG: SOI, APP0 (skipped), SOF0 with dims 100x50
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"          # APP0
        + b"\xff\xc0" + struct.pack(">H", 11)                        # SOF0
        + b"\x08" + struct.pack(">HH", 50, 100) + b"\x03\x00\x00\x00"
    )
    assert parse_image_dims(jpeg) == ("jpeg", 100, 50)
    assert parse_image_dims(b"nonsense-blob") == ("unknown", None, None)


def test_with_image_meta_real_dims_jvm_exprs(spark):
    """PNG/BMP/GIF width+height come straight out of column
    expressions — no Python ran on executors."""
    import struct

    _, bmp_blob = _bmp_4x4()
    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0) + b"\x00" * 8
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    df = spark.createDataFrame(
        [Row(id=1, image=png), Row(id=2, image=bmp_blob), Row(id=3, image=gif)]
    )
    got = {r["id"]: r["meta"] for r in with_image_meta(df, "image").collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("bmp", 4, 4)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 320, 200)


def test_parse_image_meta_includes_jpeg(spark):
    import struct

    from feast_spark.functions.multimodal import parse_image_meta

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", 50, 100) + b"\x03\x00\x00\x00"
    )
    df = spark.createDataFrame([Row(id=1, image=jpeg)])
    meta = parse_image_meta(df).collect()[0]["meta"]
    assert (meta["format"], meta["width"], meta["height"]) == ("jpeg", 100, 50)


def test_resize_bmp_is_real(spark):
    """BMP payloads decode, resample, and re-encode: the 2x2 output
    keeps one pixel per source quadrant."""
    import numpy as np

    from feast_spark.functions.codecs import decode_bmp
    from feast_spark.functions.multimodal import resize_images

    _, blob = _bmp_4x4()
    df = spark.createDataFrame([Row(id=1, image=blob)])
    out = resize_images(df, width=2, height=2).collect()[0]
    assert out["meta"]["format"] == "bmp"
    small = decode_bmp(bytes(out["image"]))
    assert np.array_equal(
        small,
        np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]],
            dtype=np.uint8,
        ),
    )


def test_wav_features_real_pcm(spark):
    """A pure sine at amplitude a has rms a/sqrt(2); duration and
    sample rate come from the actual RIFF header."""
    import numpy as np

    from feast_spark.functions.codecs import encode_wav, wav_features
    from feast_spark.functions.multimodal import (
        extract_audio_features,
        parse_audio_meta,
    )

    t = np.arange(16000) / 16000.0
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), sample_rate=16000)
    f = wav_features(wav)
    assert f["sample_rate"] == 16000
    assert f["duration_ms"] == 1000
    assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert f["zero_crossing_rate"] == pytest.approx(2 * 440 / 16000, rel=0.01)

    df = spark.createDataFrame([Row(id=1, audio=wav)])
    row = extract_audio_features(df).collect()[0]
    assert row["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert len(row["features"]) == 8
    meta = parse_audio_meta(df).collect()[0]["meta"]
    assert meta["codec"] == "pcm_wav"
    assert meta["sample_rate"] == 16000
    assert meta["duration_ms"] == 1000


# ---------------------------------------------------------------------------
# PNG codec (pure zlib+numpy)
# ---------------------------------------------------------------------------


def _deterministic_rgb(h, w, seed=7):
    import numpy as np

    # LCG-filled array: deterministic without touching RNG state
    n = h * w * 3
    vals = np.empty(n, dtype=np.uint64)
    x = seed
    for i in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        vals[i] = x
    return (vals % 256).astype(np.uint8).reshape(h, w, 3)


def test_png_roundtrip_golden_pixels():
    import numpy as np
    from feast_spark.functions.codecs import decode_png, encode_png

    img = _deterministic_rgb(13, 17)
    out = decode_png(encode_png(img))
    assert out.shape == (13, 17, 3)
    assert np.array_equal(out, img)
    # gray and RGBA channel counts round-trip too
    gray = img[:, :, 0]
    assert np.array_equal(decode_png(encode_png(gray))[:, :, 0], gray)
    rgba = np.dstack([img, np.full((13, 17), 200, np.uint8)])
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_decode_all_filter_types():
    """Hand-filter known scanlines with each of the five PNG filters
    and check the decoder reconstructs the original pixels — encode_png
    only emits filter 0, so this is the real unfiltering coverage."""
    import struct
    import zlib

    import numpy as np
    from feast_spark.functions.codecs import _PNG_MAGIC, decode_png

    img = _deterministic_rgb(5, 6, seed=3)
    h, w, bpp = 5, 6, 3
    stride = w * bpp
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):  # one row per filter type
        cur = flat[y]
        if f == 0:
            filt = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = cur - ((left + prev) >> 1)
        else:  # paeth
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        raw.append(f)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_palette_and_errors():
    import struct
    import zlib

    import numpy as np
    from feast_spark.functions.codecs import _PNG_MAGIC, decode_png, encode_png

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    # 2x2 palette image: indices [[0,1],[1,0]], palette red/blue
    raw = bytes([0, 0, 1, 0, 1, 0])
    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_png(payload)
    assert img.shape == (2, 2, 3)
    assert list(img[0, 0]) == [255, 0, 0] and list(img[0, 1]) == [0, 0, 255]

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456789")
    # 16-bit depth refused with a clear message
    deep = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(7)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="16-bit needs Pillow"):
        decode_png(deep)
    with pytest.raises(ValueError, match="unsupported channel count"):
        encode_png(np.zeros((2, 2, 5), np.uint8))


def test_resize_images_real_png_path(spark):
    """resize_images(use_fake_decoder=False) really decodes, resamples,
    and re-encodes PNG alongside BMP — no fake branch taken."""
    import numpy as np
    from feast_spark.functions.codecs import decode_png, encode_bmp, encode_png
    from feast_spark.functions.multimodal import resize_images

    img = _deterministic_rgb(16, 12)
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(encode_bmp(img))),
    ]
    df = spark.createDataFrame(rows, "id long, image binary")
    out = {
        r["id"]: r
        for r in resize_images(
            df, width=8, height=8, use_fake_decoder=False
        ).collect()
    }
    assert out[1]["meta"]["format"] == "png"
    assert out[2]["meta"]["format"] == "bmp"
    decoded = decode_png(bytes(out[1]["image"]))
    assert decoded.shape == (8, 8, 3)
    # nearest-neighbor: every output pixel exists in the source
    src_px = {tuple(p) for p in img.reshape(-1, 3)}
    assert {tuple(p) for p in decoded.reshape(-1, 3)} <= src_px


def test_extract_image_features_real_decoder(spark):
    import math

    from feast_spark.functions.codecs import encode_png
    from feast_spark.functions.multimodal import extract_image_features

    img = _deterministic_rgb(10, 10)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "id long, image binary"
    )
    row = extract_image_features(df, use_fake_decoder=False).collect()[0]
    px = img.reshape(-1, 3).astype("float64") / 255.0
    want = list(px.mean(axis=0)) + list(px.std(axis=0)) + [
        math.log1p(10) / 10.0
    ] * 2
    assert row["features"] == pytest.approx(want, abs=1e-6)
    # unknown formats still refuse loudly without the fake
    bad = spark.createDataFrame(
        [(2, bytearray(b"RIFF\x24\x00\x00\x00WEBPVP8 webp-ish"))],
        "id long, image binary",
    )
    with pytest.raises(Exception, match="needs Pillow"):
        extract_image_features(bad, use_fake_decoder=False).collect()
    # corrupt payloads of supported formats refuse loudly too
    corrupt = spark.createDataFrame([(3, bytearray(b"\xff\xd8 jpeg-ish"))],
                                    "id long, image binary")
    with pytest.raises(Exception, match="JPEG"):
        extract_image_features(corrupt, use_fake_decoder=False).collect()


# ---------------------------------------------------------------------------
# GIF codec (pure LZW)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_exact():
    import numpy as np
    from feast_spark.functions.codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )

    img = _deterministic_rgb(23, 31) % 64  # bounded values -> <=256 colors? no
    # force a small exact palette instead: map pixels through 13 colors
    pal = _deterministic_rgb(1, 13)[0]
    idx = (img[:, :, 0].astype(int) + img[:, :, 1]) % 13
    img = pal[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)

    frames = [pal[(idx + k) % 13] for k in range(4)]
    back = decode_gif_frames(encode_gif(frames, delay_cs=5))
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_gif_lzw_table_growth_and_reset():
    """Enough distinct patterns to grow codes to 12 bits and reset the
    dictionary mid-stream — the stress path of both codec directions."""
    import numpy as np
    from feast_spark.functions.codecs import decode_gif, encode_gif

    pal = np.unique(_deterministic_rgb(16, 16).reshape(-1, 3), axis=0)[:250]
    # LCG-indexed noise over 250 colors fills the 4096-entry table
    n = 120 * 180
    xs = np.empty(n, dtype=np.int64)
    x = 11
    for i in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        xs[i] = x
    img = pal[(xs % len(pal)).reshape(120, 180)]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF: rows stored in the 4-pass order
    must come back in display order."""
    import struct

    import numpy as np
    from feast_spark.functions.codecs import (
        _gif_lzw_encode,
        decode_gif,
        encode_gif,
    )

    pal = _deterministic_rgb(1, 8)[0]
    idx = (np.arange(16)[:, None] + np.arange(12)[None, :]) % 8
    img = pal[idx]
    # pass order for h=16: rows 0,8 | 4,12 | 2,6,10,14 | odd rows
    order = (
        list(range(0, 16, 8))
        + list(range(4, 16, 8))
        + list(range(2, 16, 4))
        + list(range(1, 16, 2))
    )
    stored = idx[order].astype(np.uint8).reshape(-1)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 12, 16, 0x80 | 2, 0, 0)
    out += pal.tobytes() + b"\x00" * (3 * 8 - pal.size)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 12, 16, 0x40)  # interlace flag
    out.append(3)  # min code size for 8 colors
    lzw = _gif_lzw_encode(stored, 3)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(out)), img)


def test_gif_transparency_composites_over_previous_frame():
    """A second frame with a transparent hole shows frame 1's pixels
    through it (GIF89a graphic-control compositing)."""
    import struct

    import numpy as np
    from feast_spark.functions.codecs import _gif_lzw_encode, decode_gif_frames

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    f1 = np.zeros((4, 4), np.uint8)  # all red
    f2 = np.full((4, 4), 1, np.uint8)
    f2[1:3, 1:3] = 2  # transparent index 2 -> red shows through
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    out += pal.tobytes()
    for frame, flags in ((f1, 0x00), (f2, 0x01)):
        gce_packed = flags  # bit0 = transparent color follows
        out += b"\x21\xf9\x04" + struct.pack("<BHB", gce_packed, 2, 2) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
        out.append(2)
        lzw = _gif_lzw_encode(frame.reshape(-1), 2)
        out.append(len(lzw))
        out += lzw
        out.append(0)
    out += b"\x3b"
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all()
    assert (frames[1][0, 0] == [0, 255, 0]).all()
    assert (frames[1][1, 1] == [255, 0, 0]).all()  # hole shows frame 1


def test_gif_video_frame_sampling_real(spark):
    """Animated GIF payloads go through the REAL frame decoder: hashes
    match md5 of the composited RGB frames."""
    import hashlib as _hl

    import numpy as np
    from feast_spark.functions.codecs import decode_gif_frames, encode_gif

    pal = _deterministic_rgb(1, 5)[0]
    frames = [pal[(np.arange(36).reshape(6, 6) + k) % 5] for k in range(7)]
    blob = encode_gif(frames)
    df = spark.createDataFrame([Row(id=1, video=bytearray(blob))])
    out = sample_video_frames(df, blob_col="video", every_n=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    decoded = decode_gif_frames(blob)
    want = [_hl.md5(decoded[i].tobytes()).hexdigest() for i in (0, 3, 6)]
    assert [r["frame_hash"] for r in out] == want


def test_gif_resize_and_features_real(spark):
    import numpy as np
    from feast_spark.functions.codecs import decode_gif, encode_gif
    from feast_spark.functions.multimodal import resize_images

    solid = np.tile(np.array([40, 80, 120], np.uint8), (10, 12, 1))
    blob = encode_gif(solid)
    df = spark.createDataFrame([Row(id=1, image=bytearray(blob))])

    resized = resize_images(
        df, width=5, height=4, use_fake_decoder=False
    ).collect()[0]
    assert resized["meta"]["format"] == "gif"
    back = decode_gif(bytes(resized["image"]))
    assert back.shape == (4, 5, 3)
    assert (back == [40, 80, 120]).all()

    feats = extract_image_features(
        df, blob_col="image", use_fake_decoder=False
    ).collect()[0]["features"]
    assert feats[0] == pytest.approx(40 / 255, abs=1e-6)
    assert feats[1] == pytest.approx(80 / 255, abs=1e-6)
    assert feats[2] == pytest.approx(120 / 255, abs=1e-6)
    assert feats[3] == pytest.approx(0.0, abs=1e-6)  # zero std: solid color


# ---------------------------------------------------------------------------
# JPEG codec (pure numpy baseline DCT)
# ---------------------------------------------------------------------------


def _psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


def _gradient_rgb(h=64, w=80):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(x * 2, 0, 255), np.clip(y * 2, 0, 255),
         np.clip(255 - x - y, 0, 255)],
        axis=2,
    ).astype(np.uint8)


def test_jpeg_solid_color_exact():
    import numpy as np
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 24, 3), 128, np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90))
    assert np.array_equal(out, img)  # DC-only content survives exactly


def test_jpeg_roundtrip_psnr_bounds():
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb()
    for q, floor in ((95, 45.0), (90, 42.0), (75, 35.0)):
        out = decode_jpeg(encode_jpeg(img, q))
        assert out.shape == img.shape
        assert _psnr(img, out) > floor, f"quality {q} below {floor} dB"


def test_jpeg_odd_dims_and_gray():
    import numpy as np
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb()[:50, :45]
    out = decode_jpeg(encode_jpeg(img, 90))
    assert out.shape == (50, 45, 3)
    assert _psnr(img, out) > 40.0
    gray = img[:, :, 0]
    out = decode_jpeg(encode_jpeg(gray, 90))
    assert out.shape == (50, 45, 3)
    assert _psnr(np.repeat(gray[:, :, None], 3, 2), out) > 40.0


def test_jpeg_420_subsampling_and_restart_markers():
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb()
    out = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
    assert _psnr(img, out) > 38.0  # chroma halved: looser bound
    out = decode_jpeg(encode_jpeg(img, 90, restart_interval=5))
    assert _psnr(img, out) > 42.0
    out = decode_jpeg(
        encode_jpeg(img[:50, :45], 85, subsampling="420", restart_interval=3)
    )
    assert out.shape == (50, 45, 3)
    assert _psnr(img[:50, :45], out) > 36.0


def test_jpeg_rejects_progressive_and_garbage():
    import struct

    from feast_spark.functions.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nonsense")
    # SOF2 (progressive) marker must raise the explicit unsupported error
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
    )
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(sof2)


def test_jpeg_resize_and_features_real(spark):
    import numpy as np
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from feast_spark.functions.multimodal import resize_images

    solid = np.tile(np.array([40, 80, 120], np.uint8), (24, 32, 1))
    blob = encode_jpeg(solid, 95)
    df = spark.createDataFrame([Row(id=1, image=bytearray(blob))])

    resized = resize_images(
        df, width=8, height=6, use_fake_decoder=False
    ).collect()[0]
    assert resized["meta"]["format"] == "jpeg"
    back = decode_jpeg(bytes(resized["image"]))
    assert back.shape == (6, 8, 3)
    assert np.abs(back.astype(int) - [40, 80, 120]).max() <= 4  # lossy

    feats = extract_image_features(
        df, blob_col="image", use_fake_decoder=False
    ).collect()[0]["features"]
    assert feats[0] == pytest.approx(40 / 255, abs=0.02)
    assert feats[1] == pytest.approx(80 / 255, abs=0.02)
    assert feats[2] == pytest.approx(120 / 255, abs=0.02)


def test_resize_fake_fallback_for_corrupt_known_format(spark):
    """A truncated JPEG in fake mode falls back to the deterministic
    fake instead of raising; in real mode it raises."""
    df = spark.createDataFrame(
        [Row(id=1, image=b"\xff\xd8\xff\xe0" + b"x" * 100)]
    )
    from feast_spark.functions.multimodal import resize_images

    out = resize_images(df, width=64, height=32).collect()[0]
    assert out["meta"]["format"] == "raw"
    assert len(bytes(out["image"])) == 16 + 4
    with pytest.raises(Exception):
        resize_images(df, width=64, height=32, use_fake_decoder=False).collect()


# ---------------------------------------------------------------------------
# AVI container (RIFF parse + MJPEG/DIB decode)
# ---------------------------------------------------------------------------


def _avi_frames(n=5, h=32, w=48):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [np.clip(x * 4 + k * 10, 0, 255), np.clip(y * 4, 0, 255),
             np.clip(200 - x - y, 0, 255)],
            axis=2,
        ).astype(np.uint8)
        for k in range(n)
    ]


def test_avi_dib_roundtrip_exact():
    import numpy as np
    from feast_spark.functions.avi import decode_avi_frames, encode_avi, parse_avi

    frames = _avi_frames()
    blob = encode_avi(frames, fps=24, codec="dib")
    info = parse_avi(blob)
    assert (info["codec"], info["width"], info["height"]) == ("dib", 48, 32)
    assert len(info["frames"]) == 5
    for a, b in zip(frames, decode_avi_frames(blob)):
        assert np.array_equal(a, b)  # DIB is lossless


def test_avi_mjpeg_roundtrip_psnr():
    from feast_spark.functions.avi import decode_avi_frames, encode_avi, parse_avi

    frames = _avi_frames()
    blob = encode_avi(frames, fps=10, codec="mjpeg")
    info = parse_avi(blob)
    assert info["codec"] == "mjpeg"
    assert info["fps"] == pytest.approx(10.0)
    for a, b in zip(frames, decode_avi_frames(blob)):
        assert _psnr(a, b) > 40.0


def test_avi_video_frame_sampling_real(spark):
    import hashlib as _hl

    from feast_spark.functions.avi import decode_avi_frames, encode_avi

    frames = _avi_frames(n=7)
    blob = encode_avi(frames, codec="mjpeg")
    df = spark.createDataFrame([Row(id=1, video=bytearray(blob))])
    out = sample_video_frames(df, blob_col="video", every_n=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    decoded = decode_avi_frames(blob)
    want = [_hl.md5(decoded[i].tobytes()).hexdigest() for i in (0, 3, 6)]
    assert [r["frame_hash"] for r in out] == want


def test_avi_unknown_codec_still_extracts_frames():
    """An H.264-ish AVI can't decode pixels, but the container parse
    still recovers per-frame chunks."""
    import struct

    from feast_spark.functions.avi import encode_avi, parse_avi

    blob = bytearray(encode_avi(_avi_frames(n=3), codec="mjpeg"))
    i = blob.find(b"MJPG")  # strh handler
    blob[i : i + 4] = b"H264"
    i = blob.find(b"MJPG", i + 4)  # strf biCompression
    blob[i : i + 4] = b"H264"
    info = parse_avi(bytes(blob))
    assert info["codec"] == "h264"
    assert len(info["frames"]) == 3
    from feast_spark.functions.avi import decode_avi_frames

    with pytest.raises(ValueError, match="ffmpeg"):
        decode_avi_frames(bytes(blob))


# ---------------------------------------------------------------------------
# spectral audio features (numpy FFT)
# ---------------------------------------------------------------------------


def test_wav_spectral_features_physics():
    """Pure tones land their energy in the right band; noise is
    spectrally flat; centroids track the tone frequency."""
    import numpy as np

    from feast_spark.functions.codecs import encode_wav, wav_spectral_features

    sr = 16000
    t = np.arange(sr) / sr
    low = wav_spectral_features(encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), sr))
    high = wav_spectral_features(encode_wav(0.5 * np.sin(2 * np.pi * 4000 * t), sr))
    assert low["centroid_hz"] == pytest.approx(440, abs=30)
    assert high["centroid_hz"] == pytest.approx(4000, abs=100)
    assert low["rolloff_hz"] < high["rolloff_hz"]
    assert low["bands"].index(max(low["bands"])) < \
        high["bands"].index(max(high["bands"]))
    assert low["flatness"] < 0.01

    # deterministic LCG noise: near-flat spectrum
    vals = np.empty(sr)
    x = 9
    for i in range(sr):
        x = (1103515245 * x + 12345) % (1 << 31)
        vals[i] = x / (1 << 31) - 0.5
    noise = wav_spectral_features(encode_wav(vals, sr))
    assert noise["flatness"] > 0.8


def test_extract_audio_spectral_spark(spark):
    import numpy as np

    from feast_spark.functions.codecs import encode_wav
    from feast_spark.functions.multimodal import extract_audio_spectral

    sr = 8000
    t = np.arange(sr) / sr
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 1000 * t), sr)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, b"\xffnot-audio"), (3, None)],
        "id long, audio binary",
    )
    out = {r["id"]: r for r in extract_audio_spectral(df, n_bands=8).collect()}
    assert out[1]["sample_rate"] == sr
    assert out[1]["centroid_hz"] == pytest.approx(1000, abs=50)
    assert len(out[1]["bands"]) == 8
    assert out[2]["bands"] is None      # not WAV: NULL features
    assert out[3]["bands"] is None


def test_avi_with_audio_stream_parses_video_codec():
    """An audio strl (whose strf is WAVEFORMATEX, not a bitmap header)
    must not clobber the video codec detection."""
    import struct

    from feast_spark.functions.avi import decode_avi_frames, encode_avi, parse_avi

    frames = _avi_frames(n=2)
    blob = encode_avi(frames, codec="mjpeg")

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    # audio strl: strh('auds') + WAVEFORMATEX strf (16kHz mono pcm)
    strh = b"auds" + b"\x00" * 52
    strf = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16) + b"\x00" * 8
    audio_strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    # splice the audio strl just after hdrl's avih, BEFORE video strl
    i = blob.find(b"LIST", 12)          # hdrl LIST header
    j = blob.find(b"LIST", i + 8)       # video strl LIST inside hdrl
    spliced = bytearray(blob)
    spliced[j:j] = audio_strl
    # grow the two enclosing sizes (RIFF at 4, hdrl LIST at i+4)
    for off in (4, i + 4):
        (old,) = struct.unpack_from("<I", spliced, off)
        struct.pack_into("<I", spliced, off, old + len(audio_strl))
    info = parse_avi(bytes(spliced))
    assert info["codec"] == "mjpeg"      # not overwritten by audio strf
    assert len(info["frames"]) == 2
    assert len(decode_avi_frames(bytes(spliced))) == 2


def test_gif_disposal_methods_background_and_previous():
    """Disposal 2 (restore to background) and 3 (restore previous)
    control what the NEXT frame composites onto."""
    import struct

    import numpy as np
    from feast_spark.functions.codecs import _gif_lzw_encode, decode_gif_frames

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], np.uint8)

    def build(disposal):
        out = bytearray()
        out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
        out += pal.tobytes() + b"\x00" * (3 * 4 - pal.size % (3 * 4)) * 0
        out += b"\x00" * (12 - pal.size)  # pad table to 4 entries
        frames = [
            (np.full((4, 4), 1, np.uint8), disposal, (0, 0, 4, 4)),  # red
            (np.full((2, 2), 2, np.uint8), 0, (1, 1, 2, 2)),         # green patch
        ]
        for idx, disp, (left, top, w, h) in frames:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", disp << 2, 2, 0) + b"\x00"
            out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            out.append(2)
            lzw = _gif_lzw_encode(idx.reshape(-1), 2)
            out.append(len(lzw))
            out += lzw
            out.append(0)
        out += b"\x3b"
        return decode_gif_frames(bytes(out))

    # disposal 2 on frame 1: frame 2's canvas reverts to BACKGROUND
    # (palette[0]) outside its green patch
    frames = build(disposal=2)
    assert (frames[0] == [200, 0, 0]).all()
    assert (frames[1][0, 0] == [10, 10, 10]).all()   # restored to bg
    assert (frames[1][1, 1] == [0, 200, 0]).all()    # new patch
    # disposal 3 on frame 1: canvas reverts to the PRIOR canvas (which
    # was also the background here) — same observable, different path
    frames = build(disposal=3)
    assert (frames[1][0, 0] == [10, 10, 10]).all()
    assert (frames[1][1, 1] == [0, 200, 0]).all()
    # disposal 0 keeps frame 1 underneath
    frames = build(disposal=0)
    assert (frames[1][0, 0] == [200, 0, 0]).all()
