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


def test_real_decoder_is_explicitly_stubbed(blobs):
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        extract_image_features(blobs, blob_col="image", use_fake_decoder=False).collect()


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
