"""Versioned training datasets: the offline half of run provenance.

A training run's ONLINE state, index commits and registry version are
all replayable (provenance.py) — but the training DataFrame itself
(the point-in-time join output a model actually fit on) is usually
written as a loose parquet directory that the next run overwrites.
``commit_dataset`` writes it through the same manifest-flip snapshot
store the online layer uses (io/manifest.py): every commit is an
immutable ``v_<n>`` directory published by one atomic manifest write,
with a seq'd commit log, ``keep_versions`` GC, and GC-exempt tags —
so "the exact rows the June model trained on" is an ``as_of=`` read,
not a hope that nobody re-ran the pipeline.

This mirrors the reference's SavedDataset direction (the reference
v0.11 has no dataset persistence verb; its successor added one) with
the commit discipline the rest of this repo uses.  At 100 TB the
mechanics hold: a commit is one parquet write of the dataset plus one
JSON flip; readers resolve the manifest first and never see a partial
write; retention bounds storage to ``keep_versions`` datasets plus
tagged pins (which a reproducible run must keep by definition).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from feast_spark.io.fs import StoreFS
from feast_spark.io.manifest import ManifestedParquetTable


def commit_dataset(
    df: DataFrame,
    root: str,
    fs: StoreFS | None = None,
    keep_versions: int = 3,
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the next snapshot of the dataset at ``root``;
    returns the commit seq (the coordinate to record in a provenance
    snapshot).  ``meta`` (feature refs, entity-df description, code
    version) merges into the manifest for ``dataset_meta`` readers."""
    t = ManifestedParquetTable(root, fs=fs, keep_versions=keep_versions)
    # commit() returns the seq it minted under the manifest lock —
    # re-reading history()[-1] here could hand back a CONCURRENT
    # committer's seq, recording the wrong rows in a provenance pin
    return t.commit(df, meta=meta)


def read_dataset(
    spark: SparkSession,
    root: str,
    as_of: int | str | datetime | None = None,
    fs: StoreFS | None = None,
) -> DataFrame:
    """The dataset at ``root`` — head, or the snapshot at commit seq /
    tag name / wall-clock instant ``as_of``.  Raises the manifest's
    honest retention-window error for expired targets."""
    df = ManifestedParquetTable(root, fs=fs).read(spark, as_of=as_of)
    if df is None:
        raise ValueError(f"no committed dataset at {root}")
    return df


def dataset_history(root: str, fs: StoreFS | None = None) -> list[dict]:
    """The retained commit log (oldest first) — the resolvable
    ``as_of=`` targets."""
    return ManifestedParquetTable(root, fs=fs).history()


def dataset_meta(root: str, fs: StoreFS | None = None) -> dict:
    """The last commit's merged metadata."""
    return ManifestedParquetTable(root, fs=fs).current_meta()


def tag_dataset(
    root: str, name: str, seq: int | None = None,
    fs: StoreFS | None = None,
) -> int:
    """Pin a dataset commit (default head) under ``name`` — GC-exempt
    until :func:`delete_dataset_tag`; readable via
    ``read_dataset(as_of=name)``."""
    return ManifestedParquetTable(root, fs=fs).tag(name, seq)


def delete_dataset_tag(
    root: str, name: str, fs: StoreFS | None = None
) -> None:
    """Unpin ``name``; its snapshot rejoins the GC window at the next
    commit (or :func:`vacuum_dataset`)."""
    ManifestedParquetTable(root, fs=fs).delete_tag(name)


def vacuum_dataset(
    root: str, fs: StoreFS | None = None, keep_versions: int = 3
) -> list[str]:
    """Reclaim dataset versions outside the keep window NOW — e.g.
    after a retired run's tag was deleted on a dataset nobody re-runs
    (commit-path GC would otherwise never fire again).  Returns the
    deleted version dirs."""
    return ManifestedParquetTable(
        root, fs=fs, keep_versions=keep_versions
    ).vacuum()
