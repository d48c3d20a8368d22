"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contracts (schemas, partitioning, UDF signatures, batch
shapes) are real and tested; the actual codec work (JPEG decode, audio
resample, video frame extraction) is STUBBED — the image/audio libraries
are not available in this container.  Each stub either uses the
deterministic fake (for tests) or raises NotImplementedError with the
library it needs, so wiring it to Pillow/torchaudio/pyav later is a
one-function change with no plan changes.

Scale notes: binary payloads stay columnar in parquet; mapInPandas
streams Arrow batches so a 100 TB corpus of images processes one batch
per core with no row-at-a-time Python, and ``spark.sql.files.
maxPartitionBytes`` controls the scan granularity.  Keep metadata in a
sibling struct column so filters on (width, format, duration) push down
without touching the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside each blob column
IMAGE_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)
AUDIO_META = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
VIDEO_META = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: bytes -> R^dim.
    Stable across machines (md5-seeded), so tests can assert values."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_image_features(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "image",
    dim: int = 8,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """mapInPandas over Arrow batches: (id, blob) -> (id, n_bytes,
    content_hash, features).  The batch shape (pandas DataFrame per
    Arrow batch) is the real production contract; only the innermost
    decode call is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real image decoding needs Pillow/opencv; "
                    "pass use_fake_decoder=True in this environment"
                )
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_hash": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "features": blobs.map(
                        lambda b: _fake_features(bytes(b), dim) if b is not None else None
                    ),
                }
            )
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "video",
    every_n: int = 30,
) -> DataFrame:
    """Frame-sampling contract: one output row per sampled frame with a
    frame index — implemented against the fake decoder (frames =
    fixed-size byte windows) to exercise the explode/batch shape."""
    frame_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                blob = bytes(blob)
                # fake: treat each 64-byte window as one "frame"
                n_frames = max(len(blob) // 64, 1)
                for f in range(0, n_frames, every_n):
                    ids.append(int(row[id_col]))
                    idxs.append(f)
                    hashes.append(
                        hashlib.md5(blob[f * 64 : (f + 1) * 64]).hexdigest()
                    )
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.select(id_col, blob_col).mapInPandas(run, frame_schema)


def with_image_meta(
    df: DataFrame, blob_col: str = "image", out_col: str = "meta"
) -> DataFrame:
    """Attach a typed metadata struct parsed from the blob header.
    Fake parser: recognizes JPEG/PNG magic bytes only (enough to route);
    real width/height need a decoder."""
    magic = F.hex(F.substring(F.col(blob_col), 1, 4))
    fmt = (
        F.when(magic.startswith("FFD8"), F.lit("jpeg"))
        .when(magic.startswith("89504E47"), F.lit("png"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn(
        out_col,
        F.struct(
            fmt.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )


def resize_images(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "image",
    width: int = 224,
    height: int = 224,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Resize contract: (id, blob) -> (id, blob', meta') with the target
    dimensions stamped into the metadata struct.  The fake "resize"
    re-encodes the blob as md5(blob) || dims (deterministic, size-
    bounded); a real one decodes + resamples + re-encodes in the same
    batch loop — the plan, schema, and batch shape don't change."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(blob_col, T.BinaryType()),
            T.StructField("meta", IMAGE_META),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real image resizing needs Pillow/opencv; "
                    "pass use_fake_decoder=True in this environment"
                )

            def fake_resize(b):
                if b is None:
                    return None
                digest = hashlib.md5(bytes(b)).digest()
                return digest + width.to_bytes(2, "big") + height.to_bytes(2, "big")

            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    blob_col: pdf[blob_col].map(fake_resize),
                    "meta": [
                        {"format": "raw", "width": width, "height": height}
                        for _ in range(len(pdf))
                    ],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, out_schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "audio",
    dim: int = 8,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Audio feature contract: (id, blob) -> (id, n_bytes, rms,
    features).  Fake decoder treats the payload as signed 8-bit PCM
    (deterministic rms + md5 features); a real one swaps in
    soundfile/torchaudio inside the same Arrow batch loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real audio decoding needs soundfile/torchaudio; "
                    "pass use_fake_decoder=True in this environment"
                )

            def rms(b):
                if b is None or len(b) == 0:
                    return 0.0
                samples = [x - 128 for x in bytes(b)]
                return (sum(s * s for s in samples) / len(samples)) ** 0.5

            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "rms": blobs.map(rms).astype("float64"),
                    "features": blobs.map(
                        lambda b: _fake_features(bytes(b), dim)
                        if b is not None
                        else None
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
