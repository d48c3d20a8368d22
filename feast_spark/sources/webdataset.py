"""WebDataset-style sharded tar export for training corpora.

The de-facto loading format for large multimodal training jobs (the
public WebDataset convention: shard-NNNNNN.tar files; each sample is a
group of member files sharing a key — ``{key}.txt``, ``{key}.jpg``,
``{key}.json`` — so a dataloader streams samples sequentially with no
random I/O).  The reference has no export of this kind; a training
pipeline at 100 TB needs one, and it maps cleanly onto Spark:

- **shard assignment** is a deterministic hash of the sample key
  (growth-stable: adding documents never moves existing samples
  between shards for a fixed ``n_shards``), or an explicit shard
  column (e.g. from ``corpus_mix``/``hash_split`` upstream).
- **tar packing** is per-shard: groupBy(shard) -> applyInPandas builds
  one tar in memory per group, samples sorted by key for reproducible
  bytes.  Each shard is one task; parallelism = number of shards.
- **sinking**: the default returns a (shard, tar_bytes, n_samples)
  DataFrame — compose with any Spark sink; ``write_webdataset``
  writes ``shard-NNNNNN.tar`` files to a directory (posix/shared-fs
  path; for object stores, sink the DataFrame through the cluster's
  Hadoop connectors instead).

Size discipline: keep ``n_shards`` sized so a shard (corpus_bytes /
n_shards) stays in the 100 MB–1 GB band the format expects; the tar is
built in executor memory, so a shard must fit the executor — that is
the same bound WebDataset's own writers impose.
"""

from __future__ import annotations

import io
import json
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _member_bytes(value, ext: str) -> bytes | None:
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    if ext == ".json":
        return json.dumps(value, sort_keys=True, default=str).encode()
    return str(value).encode()


def to_webdataset_shards(
    df: DataFrame,
    columns: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 16,
    shard_col: str | None = None,
) -> DataFrame:
    """(shard, tar_bytes, n_samples) — one row per shard.

    ``columns`` maps column name -> member extension (".txt", ".jpg",
    ".json", ...): binary columns are written raw, ".json" columns are
    JSON-serialized, everything else is utf-8 text.  Samples are
    sorted by key inside each shard, so shard bytes are reproducible
    run-to-run."""
    if not columns:
        raise ValueError("columns mapping is empty")
    for c in list(columns) + [key_col]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    if shard_col is None:
        work = df.withColumn(
            "__shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        )
        shard_field = "__shard"
    else:
        work = df
        shard_field = shard_col
    sel = work.select(
        # cast: user-supplied shard columns may be int/short/string
        F.col(shard_field).cast("long").alias("__shard"),
        F.col(key_col).cast("string").alias("__key"),
        *[F.col(c) for c in columns],
    )

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("tar_bytes", T.BinaryType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )

    col_items = sorted(columns.items())  # stable member order

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__key", kind="mergesort")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                wrote = False
                for col, ext in col_items:
                    data = _member_bytes(row[col], ext)
                    if data is None:
                        continue
                    info = tarfile.TarInfo(name=f"{row['__key']}{ext}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible bytes
                    tar.addfile(info, io.BytesIO(data))
                    wrote = True
                if wrote:
                    n += 1
        return pd.DataFrame(
            {
                "shard": [int(pdf["__shard"].iloc[0])],
                "tar_bytes": [buf.getvalue()],
                "n_samples": [n],
            }
        )

    return sel.groupBy("__shard").applyInPandas(build, out_schema)


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    columns: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 16,
    shard_col: str | None = None,
) -> list[str]:
    """Write ``shard-NNNNNN.tar`` files under ``out_dir`` (a shared or
    local filesystem path reachable from the driver), plus a
    ``_manifest.json`` recording per-shard md5/byte-size/sample-count.
    Returns the written tar paths.  Shards stream to the driver one
    row at a time (toLocalIterator) — driver memory holds ONE shard,
    not the dataset.

    Because shard bytes are reproducible (sorted keys, zeroed mtimes),
    the manifest md5s double as a cheap incremental-re-export check:
    regenerate, compare manifests, re-upload only changed shards."""
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    shards = to_webdataset_shards(
        df, columns, key_col=key_col, n_shards=n_shards, shard_col=shard_col
    )
    paths = []
    manifest: dict[str, dict] = {}
    for row in shards.toLocalIterator():
        name = f"shard-{int(row['shard']):06d}.tar"
        blob = bytes(row["tar_bytes"])
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        manifest[name] = {
            "md5": hashlib.md5(blob).hexdigest(),
            "n_bytes": len(blob),
            "n_samples": int(row["n_samples"]),
        }
        paths.append(os.path.join(out_dir, name))
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1, sort_keys=True)
    return sorted(paths)


def read_webdataset_samples(tar_bytes: bytes) -> dict[str, dict[str, bytes]]:
    """tar bytes -> {key: {ext: member_bytes}} — the loader-side view,
    used by tests to pin the roundtrip."""
    out: dict[str, dict[str, bytes]] = {}
    with tarfile.open(fileobj=io.BytesIO(bytes(tar_bytes))) as tar:
        for member in tar.getmembers():
            name = member.name
            dot = name.rfind(".")
            key, ext = name[:dot], name[dot:]
            out.setdefault(key, {})[ext] = tar.extractfile(member).read()
    return out
