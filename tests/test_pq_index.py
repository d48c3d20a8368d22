"""Persisted IVFPQ index: identity vs the inline ivfpq_topk under the
same frozen models, append==frozen-model identity, crash invisibility,
compact/vacuum, plan pruning, and the streaming sink's exactly-once
watermark."""

import json
import os

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.pq import ivfpq_topk, pq_encode
from feast_spark.operators.pq_index import (
    _load_centroids,
    _load_codebooks,
    _manifest,
    build_ivfpq_index,
    ivfpq_index_append,
    ivfpq_index_compact,
    ivfpq_index_stats,
    ivfpq_index_topk,
    ivfpq_index_vacuum,
)
from feast_spark.io.fs import LocalFS
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED


def _emb(spark):
    return load_table(spark, SF_MED, "embeddings")


def _queries(spark):
    return _emb(spark).filter("vec_id < 3")


def _key(rows):
    return sorted(
        (r["query_id"], r["neighbor_id"], round(r["adc_dist"], 9))
        for r in rows
    )


def _inline_twin(spark, emb, path):
    """Inline ivfpq_topk over codes built with the INDEX's committed
    quantizer + codebooks — what the persisted read must reproduce."""
    fs = LocalFS()
    manifest = _manifest(path, fs)
    cents = _load_centroids(path, manifest, fs)
    books = _load_codebooks(path, manifest, fs)
    from feast_spark.operators.similarity import nearest_centroid

    codes = (
        pq_encode(
            emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
            books, vec_col="vec", out_col="codes",
        )
        .withColumn("cell", nearest_centroid(F.col("vec"), cents))
        .select(F.col("id").alias("vec_id"), F.col("codes").alias("pq_codes"), "cell")
    )
    return ivfpq_topk(
        codes, _queries(spark), cents, books,
        id_col="vec_id", codes_col="pq_codes", k=5, n_probe=3,
    )


def test_ivfpq_index_matches_inline(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=8, iters=2, m_subspaces=8)
    got = ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3)
    want = _inline_twin(spark, emb, path)
    assert _key(got.collect()) == _key(want.collect())
    # layout: one directory per cell, codes not vectors
    cells = [
        d for d in os.listdir(f"{path}/codes/epoch=0") if d.startswith("cell=")
    ]
    assert len(cells) > 1


def test_ivfpq_index_scan_prunes_to_probed_cells(spark, tmp_path):
    import re

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=8, iters=2)
    df = ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1) and m.group(1).strip(), plan[:1500]


def test_ivfpq_append_equals_frozen_model_rebuild(spark, tmp_path):
    """(build on A, append B) == inline pipeline over A∪B with the
    models trained on A — the frozen-quantizer append contract."""
    emb = _emb(spark)
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(a, path, n_centroids=8, iters=2)
    ivfpq_index_append(spark, path, b)
    got = ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3)
    want = _inline_twin(spark, emb, path)  # models committed from A
    assert _key(got.collect()) == _key(want.collect())


@pytest.mark.nightly
def test_ivfpq_crashed_append_invisible_and_no_collision(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=8, iters=2)
    before = _key(
        ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3).collect()
    )
    # a crashed writer's partial epoch: directory exists, not committed
    os.makedirs(f"{path}/codes/epoch=1/cell=0", exist_ok=True)
    after = _key(
        ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3).collect()
    )
    assert after == before
    # next append numbers PAST the orphan
    ivfpq_index_append(
        spark, path,
        spark.createDataFrame(
            [(10_001, [0.5] * 64)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
        ),
    )
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f)["epochs"] == [0, 2]


@pytest.mark.nightly
def test_ivfpq_compact_vacuum_and_stats(spark, tmp_path):
    emb = _emb(spark)
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(a, path, n_centroids=8, iters=2)
    ivfpq_index_append(spark, path, b)
    before = _key(
        ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3).collect()
    )
    stats = ivfpq_index_stats(spark, path).collect()
    assert stats[0]["n_epochs"] == 2
    assert sum(r["n_codes"] for r in stats) == emb.count()

    ivfpq_index_compact(spark, path)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["epochs"] == [2]
    assert _key(
        ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3).collect()
    ) == before

    # rebuild stages a new model generation; vacuum then removes the
    # superseded epochs AND the old quantizer/codebook generations
    build_ivfpq_index(emb, path, n_centroids=8, iters=2)
    removed = ivfpq_index_vacuum(spark, path)
    assert removed["codes"]  # superseded epochs gone
    assert removed["centroids"] == ["gen=0"]
    assert removed["codebooks"] == ["gen=0.json"]
    assert _key(
        ivfpq_index_topk(spark, path, _queries(spark), k=5, n_probe=3).collect()
    ) == _key(_inline_twin(spark, emb, path).collect())


def test_ivfpq_empty_append_noop_and_unbuilt(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    with pytest.raises(ValueError, match="no IVFPQ index"):
        ivfpq_index_topk(spark, str(tmp_path / "missing"), _queries(spark))
    build_ivfpq_index(emb, path, n_centroids=8, iters=2)
    empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    ivfpq_index_append(spark, path, empty)
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f)["epochs"] == [0]


@pytest.mark.nightly
def test_ivfpq_streaming_sink_exactly_once(spark, tmp_path):
    """The foreachBatch sink appends each micro-batch once; a replayed
    epoch id is skipped (watermark in the manifest), and a rebuild
    carries the watermark forward."""
    from feast_spark.streaming.index_sink import ivfpq_index_sink

    emb = _emb(spark)
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(a, path, n_centroids=8, iters=2)
    sink = ivfpq_index_sink(spark, path)
    sink(b, 0)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 0 and len(m["epochs"]) == 2
    sink(b, 0)  # at-least-once replay: skipped
    with open(f"{path}/_MANIFEST.json") as f:
        assert len(json.load(f)["epochs"]) == 2
    build_ivfpq_index(emb, path, n_centroids=8, iters=2)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 0  # survived the rebuild
    assert len(m["epochs"]) == 1
