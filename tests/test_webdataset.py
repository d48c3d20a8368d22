"""WebDataset export: reproducible shard bytes, growth-stable shard
assignment, mixed text/binary/json members, and the loader-side
roundtrip."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.sources.webdataset import (
    read_webdataset_samples,
    to_webdataset_shards,
    write_webdataset,
)


@pytest.fixture()
def docs(spark):
    rows = [
        Row(
            doc_id=i,
            text=f"document number {i}",
            image=bytes([i % 256] * (10 + i)),
            meta={"lang": "en", "idx": str(i)},
        )
        for i in range(40)
    ]
    return spark.createDataFrame(rows)


COLS = {"text": ".txt", "image": ".bin", "meta": ".json"}


def test_roundtrip_and_member_contents(docs):
    shards = to_webdataset_shards(docs, COLS, n_shards=4).collect()
    assert len(shards) == 4
    seen = {}
    for s in shards:
        samples = read_webdataset_samples(s["tar_bytes"])
        assert s["n_samples"] == len(samples)
        seen.update(samples)
    assert len(seen) == 40
    import json

    for i in range(40):
        sample = seen[str(i)]
        assert sample[".txt"] == f"document number {i}".encode()
        assert sample[".bin"] == bytes([i % 256] * (10 + i))
        assert json.loads(sample[".json"]) == {"lang": "en", "idx": str(i)}


def test_shard_bytes_reproducible(docs):
    a = {r["shard"]: bytes(r["tar_bytes"])
         for r in to_webdataset_shards(docs, COLS, n_shards=4).collect()}
    b = {r["shard"]: bytes(r["tar_bytes"])
         for r in to_webdataset_shards(docs, COLS, n_shards=4).collect()}
    assert a == b  # sorted keys + zeroed mtimes -> byte-stable


def test_shard_assignment_growth_stable(spark, docs):
    """Appending new docs never moves an existing doc's shard."""
    before = {}
    for s in to_webdataset_shards(docs, COLS, n_shards=4).collect():
        for key in read_webdataset_samples(s["tar_bytes"]):
            before[key] = s["shard"]
    grown = docs.union(
        spark.createDataFrame(
            [Row(doc_id=i, text=f"document number {i}",
                 image=b"x", meta={"lang": "en", "idx": str(i)})
             for i in range(40, 60)]
        )
    )
    after = {}
    for s in to_webdataset_shards(grown, COLS, n_shards=4).collect():
        for key in read_webdataset_samples(s["tar_bytes"]):
            after[key] = s["shard"]
    assert len(after) == 60
    for key, shard in before.items():
        assert after[key] == shard


def test_explicit_shard_column(docs):
    work = docs.withColumn("my_shard", F.col("doc_id") % 2)
    shards = to_webdataset_shards(
        docs.withColumn("my_shard", F.col("doc_id") % 2),
        COLS,
        shard_col="my_shard",
    ).collect()
    assert sorted(r["shard"] for r in shards) == [0, 1]
    for s in shards:
        for key in read_webdataset_samples(s["tar_bytes"]):
            assert int(key) % 2 == s["shard"]


def test_write_webdataset_files(docs, tmp_path):
    paths = write_webdataset(docs, str(tmp_path / "wds"), COLS, n_shards=3)
    assert [p.rsplit("/", 1)[-1] for p in paths] == [
        "shard-000000.tar", "shard-000001.tar", "shard-000002.tar",
    ]
    total = 0
    for p in paths:
        with open(p, "rb") as f:
            total += len(read_webdataset_samples(f.read()))
    assert total == 40


def test_null_members_skipped(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, None)],
        "doc_id long, text string, image binary",
    )
    shards = to_webdataset_shards(
        df, {"text": ".txt", "image": ".bin"}, n_shards=1
    ).collect()
    samples = read_webdataset_samples(shards[0]["tar_bytes"])
    assert set(samples["1"]) == {".txt"}
    assert "2" not in samples  # all members NULL -> sample dropped
    assert shards[0]["n_samples"] == 1


def test_validation_errors(docs):
    with pytest.raises(ValueError, match="not in DataFrame"):
        to_webdataset_shards(docs, {"nope": ".txt"})
    with pytest.raises(ValueError, match="empty"):
        to_webdataset_shards(docs, {})


def test_manifest_written_and_stable(docs, tmp_path):
    """_manifest.json records md5/bytes/samples per shard, and a
    re-export of the same data produces the identical manifest — the
    incremental-re-export check."""
    import hashlib
    import json

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    paths = write_webdataset(docs, d1, COLS, n_shards=3)
    with open(f"{d1}/_manifest.json") as f:
        m1 = json.load(f)
    assert sorted(m1) == ["shard-000000.tar", "shard-000001.tar",
                          "shard-000002.tar"]
    assert sum(e["n_samples"] for e in m1.values()) == 40
    for p in paths:
        with open(p, "rb") as f:
            blob = f.read()
        entry = m1[p.rsplit("/", 1)[-1]]
        assert entry["md5"] == hashlib.md5(blob).hexdigest()
        assert entry["n_bytes"] == len(blob)
    write_webdataset(docs, d2, COLS, n_shards=3)
    with open(f"{d2}/_manifest.json") as f:
        assert json.load(f) == m1
