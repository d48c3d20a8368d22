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
