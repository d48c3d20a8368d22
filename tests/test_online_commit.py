"""Versioned-snapshot commit protocol of the online store: manifest
pointer, orphan tolerance, GC, and the HadoopFS twin.

The reference swaps sqlite rows transactionally; here the unit of
atomicity is the manifest pointer — these tests pin the crash-safety
properties that replaced the (object-store-unsafe) directory rename."""

import json
import os

import pytest
from pyspark.sql import Row

from feast_spark.io.fs import HadoopFS, LocalFS
from feast_spark.online.store import MANIFEST, OnlineStore


def _write(store, spark, rows):
    df = spark.createDataFrame(rows)
    store.online_write_batch(
        spark, "p", "v", df, ["driver_id"], "ts", None, ["value"]
    )


def _read_values(store, spark, ids):
    req = spark.createDataFrame([Row(driver_id=i) for i in ids])
    out = store.online_read(spark, "p", "v", req, ["driver_id"], ["value"])
    return {r["driver_id"]: r["value"] for r in out.collect()}


def _ts(s):
    from datetime import datetime

    return datetime.fromisoformat(s)


def test_versioned_commit_and_upsert(spark, tmp_path):
    store = OnlineStore(str(tmp_path))
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-01T00:00"), value=10.0)])
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-02T00:00"), value=20.0),
                          Row(driver_id=2, ts=_ts("2024-01-01T00:00"), value=5.0)])
    assert _read_values(store, spark, [1, 2]) == {1: 20.0, 2: 5.0}
    table_dir = tmp_path / "p" / "v"
    manifest = json.loads((table_dir / MANIFEST).read_text())
    assert manifest["current"] == "v_00000002"
    # snapshots are immutable: both versions still present (keep=2)
    assert sorted(d for d in os.listdir(table_dir) if d.startswith("v_")) == [
        "v_00000001",
        "v_00000002",
    ]


def test_crashed_writer_orphan_is_invisible_and_never_reused(spark, tmp_path):
    """Crash between snapshot write and manifest update: readers keep the
    old version; the next commit numbers PAST the orphan (never reuses
    its directory) and the manifest then skips over it."""
    store = OnlineStore(str(tmp_path))
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-01T00:00"), value=10.0)])
    # simulate a writer that died after step (1): full snapshot on disk,
    # manifest never updated
    orphan = tmp_path / "p" / "v" / "v_00000007"
    spark.createDataFrame([Row(junk=1)]).write.parquet(str(orphan))
    assert _read_values(store, spark, [1]) == {1: 10.0}
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-02T00:00"), value=30.0)])
    manifest = json.loads((tmp_path / "p" / "v" / MANIFEST).read_text())
    assert manifest["current"] == "v_00000008"
    assert _read_values(store, spark, [1]) == {1: 30.0}


def test_manifest_tmp_leftover_is_ignored(spark, tmp_path):
    store = OnlineStore(str(tmp_path))
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-01T00:00"), value=1.5)])
    # crash mid write_bytes_atomic: temp file beside the manifest
    (tmp_path / "p" / "v" / f"{MANIFEST}.tmp.dead").write_text("{corrupt")
    assert _read_values(store, spark, [1]) == {1: 1.5}


def test_gc_prunes_to_keep_versions(spark, tmp_path):
    store = OnlineStore(str(tmp_path), keep_versions=1)
    for day, val in [("01", 1.0), ("02", 2.0), ("03", 3.0)]:
        _write(store, spark,
               [Row(driver_id=1, ts=_ts(f"2024-01-{day}T00:00"), value=val)])
    table_dir = tmp_path / "p" / "v"
    assert [d for d in sorted(os.listdir(table_dir)) if d.startswith("v_")] == [
        "v_00000003"
    ]
    assert _read_values(store, spark, [1]) == {1: 3.0}


def test_miss_before_any_commit(spark, tmp_path):
    store = OnlineStore(str(tmp_path))
    vals = _read_values(store, spark, [9])
    assert vals == {9: None}


@pytest.mark.parametrize("fs_name", ["local", "hadoop"])
def test_storefs_contract(spark, tmp_path, fs_name):
    """Both StoreFS implementations honor the same contract; HadoopFS
    runs against file:// here and any cluster scheme in production."""
    if fs_name == "local":
        fs, base = LocalFS(), str(tmp_path / "c")
    else:
        fs, base = HadoopFS(spark), f"file://{tmp_path}/c"
    fs.mkdirs(f"{base}/a/v_00000001")
    fs.mkdirs(f"{base}/a/v_00000002")
    fs.write_bytes_atomic(f"{base}/a/m.json", b'{"current": "v_00000002"}')
    # overwrite must be atomic-replace, not append/fail
    fs.write_bytes_atomic(f"{base}/a/m.json", b'{"current": "v_00000001"}')
    assert json.loads(fs.read_bytes(f"{base}/a/m.json")) == {
        "current": "v_00000001"
    }
    assert fs.exists(f"{base}/a/m.json")
    assert sorted(fs.list_subdirs(f"{base}/a")) == ["v_00000001", "v_00000002"]
    fs.delete(f"{base}/a/v_00000001")
    assert sorted(fs.list_subdirs(f"{base}/a")) == ["v_00000002"]
    assert not fs.exists(f"{base}/a/v_00000001")


def test_online_store_over_hadoopfs(spark, tmp_path):
    """Full upsert/read cycle with manifest IO through the Hadoop
    FileSystem API — the path a real s3a://-rooted store exercises."""
    store = OnlineStore(str(tmp_path), fs=HadoopFS(spark))
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-01T00:00"), value=10.0)])
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-02T00:00"), value=20.0)])
    assert _read_values(store, spark, [1]) == {1: 20.0}
