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
