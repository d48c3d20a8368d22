"""The index-health advisor (operators/index_advisor.py): healthy
indexes get an empty advice list; each documented bound, when crossed,
names the action and the concrete rebuild parameter."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.index_advisor import index_advise
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def _actions(report):
    return [(a["action"], a.get("param")) for a in report["advice"]]


def test_healthy_ivf_has_no_advice(spark, emb, tmp_path):
    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=1)
    report = index_advise(spark, path, target_cell_size=1024)
    assert report["kind"] == "ivf"
    assert report["advice"] == []
    assert report["health"]["n_cells"] == 8
    assert report["health"]["total_vectors"] == emb.count()


def test_overgrown_cells_recommend_rescaled_quantizer(spark, emb, tmp_path):
    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=1)
    # mean cell = total/8 >> 2 * target -> rebuild with total/target cells
    report = index_advise(
        spark, path, target_cell_size=10, skew_bound=1e9
    )
    acts = _actions(report)
    assert ("rebuild", "n_centroids") in acts
    rec = next(a for a in report["advice"] if a["action"] == "rebuild")
    assert rec["recommended"] == max(8, emb.count() // 10)


def test_epoch_pileup_recommends_compact(spark, emb, tmp_path):
    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 4 == 0), path, n_centroids=4, iters=1
    )
    for r in (1, 2, 3):
        ivf_index_append(
            spark, path, emb.filter(F.col("vec_id") % 4 == r)
        )
    report = index_advise(spark, path, epoch_bound=2, skew_bound=1e9)
    assert ("compact", None) in _actions(report)
    assert report["n_epochs"] == 4


def test_skew_recommends_retrain(spark, emb, tmp_path):
    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=1)
    # real cells are never perfectly uniform: a skew bound just above
    # 1.0 is guaranteed crossed, standing in for drifted appends
    report = index_advise(
        spark, path, skew_bound=1.000001, target_cell_size=1_000_000
    )
    assert ("rebuild", "n_centroids") in _actions(report)
    assert "skew" in report["advice"][0]["reason"]


def test_bm25_bucket_volume_and_ivfpq_dispatch(spark, emb, tmp_path):
    from feast_spark.operators.bm25 import build_bm25_index
    from feast_spark.operators.pq_index import build_ivfpq_index

    docs = load_table(spark, SF_SMALL, "documents")
    bpath = str(tmp_path / "bm25")
    build_bm25_index(docs, bpath, "doc_id", "text", n_term_buckets=4)
    report = index_advise(
        spark, bpath, target_bucket_postings=10, skew_bound=1e9
    )
    assert report["kind"] == "bm25"
    rec = next(a for a in report["advice"] if a["action"] == "rebuild")
    assert rec["param"] == "n_term_buckets"
    total = report["health"]["total_postings"]
    assert rec["recommended"] >= total // 10  # next pow2 of total/target
    assert rec["recommended"] & (rec["recommended"] - 1) == 0

    qpath = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        emb, qpath, n_centroids=4, iters=1, m_subspaces=4, k_codes=8
    )
    report = index_advise(spark, qpath, target_cell_size=1024)
    assert report["kind"] == "ivfpq"
    assert report["health"]["total_vectors"] == emb.count()


def test_minhash_hot_bucket_flagged(spark, tmp_path):
    from feast_spark.operators.minhash_index import build_minhash_index

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "mh")
    build_minhash_index(docs, path, "doc_id", "text")
    healthy = index_advise(spark, path)
    assert healthy["kind"] == "minhash"
    assert healthy["advice"] == []
    # a bound of 1 is an artificial trigger: the diagnosis (which
    # profile blew the bound) keys off bound/10, so with natural
    # corpus dups either branch can fire — what matters is that a
    # crossed bound always yields exactly one actionable row
    flagged = index_advise(spark, path, hot_bucket_bound=1)
    assert len(flagged["advice"]) == 1
    assert flagged["advice"][0]["action"] in ("investigate", "rebuild")


def test_maintain_applies_compact_and_vacuum(spark, emb, tmp_path):
    from feast_spark.io import epochs as epochs_io
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.index_advisor import index_maintain
    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_index_topk,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 4 == 0), path, n_centroids=4, iters=1
    )
    for r in (1, 2, 3):
        ivf_index_append(spark, path, emb.filter(F.col("vec_id") % 4 == r))
    q = emb.filter(F.col("vec_id") < 2)
    before = ivf_index_topk(spark, path, q, n_probe=4, k=5).collect()

    report = index_maintain(
        spark, path, epoch_bound=2, skew_bound=1e9, vacuum=True
    )
    assert report["applied"] == ["compact", "vacuum"]
    assert len(report["vacuumed"]["epochs_removed"]) == 4  # superseded
    # the report describes the index AS LEFT BEHIND: re-advised after
    # applying, so no already-applied advice leaks to the caller
    assert report["n_epochs"] == 1 and report["advice"] == []
    manifest = epochs_io.read_manifest(path, LocalFS())
    assert len(manifest["epochs"]) == 1
    after = ivf_index_topk(spark, path, q, n_probe=4, k=5).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))

    # idempotent: a second run finds a healthy index and applies nothing
    again = index_maintain(
        spark, path, epoch_bound=2, skew_bound=1e9, vacuum=True
    )
    assert again["applied"] == [] and again["advice"] == []

    # default vacuum=False honors the reader-drain contract: compact
    # flips the manifest but superseded dirs stay on disk
    path2 = str(tmp_path / "ivf2")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 4 == 0), path2, n_centroids=4, iters=1
    )
    for r in (1, 2, 3):
        ivf_index_append(spark, path2, emb.filter(F.col("vec_id") % 4 == r))
    rep2 = index_maintain(spark, path2, epoch_bound=2, skew_bound=1e9)
    assert rep2["applied"] == ["compact"] and rep2["vacuumed"] == {}
    import os

    assert len(os.listdir(path2 + "/vectors")) == 5  # 4 old + 1 merged


def test_maintain_reports_rebuild_unapplied(spark, emb, tmp_path):
    from feast_spark.operators.index_advisor import index_maintain
    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=4, iters=1)
    report = index_maintain(
        spark, path, target_cell_size=10, skew_bound=1e9
    )
    assert report["applied"] == []  # rebuild advice is never auto-applied
    assert [a["action"] for a in report["advice"]] == ["rebuild"]


def test_doctor_cli_index_mode(spark, emb, tmp_path, capsys):
    from feast_spark.cli import main
    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=4, iters=1)
    rc = main(["--master", "local[2]", "doctor", "--index", path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "kind     ivf" in out and "inside every documented bound" in out


def test_doctor_cli_maintain(spark, emb, tmp_path, capsys):
    from feast_spark.cli import main
    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 3 == 0), path, n_centroids=4, iters=1
    )
    for r in (1, 2):
        ivf_index_append(spark, path, emb.filter(F.col("vec_id") % 3 == r))
    # 3 epochs > default epoch_bound=8? no — so force compact advice by
    # checking the flag path on a healthy index first: nothing applied
    rc = main(["--master", "local[2]", "doctor", "--index", path,
               "--maintain"])
    out = capsys.readouterr().out
    assert rc == 0 and "applied" not in out

    # pile epochs past the bound, then maintain: compact applied, exit 0
    for _ in range(7):
        ivf_index_append(spark, path, emb.filter(F.col("vec_id") < 0))
    for r in range(10):
        ivf_index_append(
            spark, path,
            emb.filter(F.col("vec_id") % 37 == r).limit(3)
            .withColumn("vec_id", F.col("vec_id") + 10_000 * (r + 1)),
        )
    rc = main(["--master", "local[2]", "doctor", "--index", path,
               "--maintain", "--vacuum"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "applied  compact" in out and "applied  vacuum" in out
    assert "inside every documented bound" in out


def test_doctor_cli_maintain_requires_index():
    import pytest as _pytest

    from feast_spark.cli import main

    with _pytest.raises(SystemExit):
        main(["doctor", "--maintain"])


def test_doctor_cli_vacuum_requires_maintain(spark, emb, tmp_path):
    # --vacuum alone used to pass validation and then be silently
    # ignored (only consulted inside the --maintain branch)
    import pytest as _pytest

    from feast_spark.cli import main
    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=1)
    with _pytest.raises(SystemExit):
        main(["doctor", "--index", path, "--vacuum"])


def test_advise_legacy_stampless_ivf_manifest(spark, emb, tmp_path):
    """A pre-stamp IVF manifest (no "kind", no "centroids" pointer,
    flat centroids/ dir) must produce a report, not a KeyError."""
    import json
    import os
    import shutil

    from feast_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=1)
    manifest = json.loads(open(os.path.join(path, "_MANIFEST.json")).read())
    # rewrite to the legacy layout the advisor claims to tolerate
    gen_dir = os.path.join(path, manifest["centroids"])
    flat = os.path.join(path, "centroids_flat")
    shutil.copytree(gen_dir, flat)
    shutil.rmtree(os.path.join(path, "centroids"))
    shutil.move(flat, os.path.join(path, "centroids"))
    legacy = {k: v for k, v in manifest.items()
              if k not in ("kind", "centroids")}
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(legacy, f)
    report = index_advise(spark, path, target_cell_size=1024)
    assert report["kind"] == "ivf"
    assert report["health"]["n_cells"] == 8


def test_bm25_hot_term_recommends_stopword(spark, tmp_path):
    """Skew caused by ONE dominant term -> the advisor recommends a
    concrete stopwords rebuild (more buckets cannot split a term), and
    rebuilding with it drops the hot bucket's read while non-stopword
    scores stay bit-identical (the build contract, pinned in
    test_bm25.py)."""
    from feast_spark.operators.bm25 import (
        _index_postings,
        bm25_index_topk,
        build_bm25_index,
    )

    # one term in EVERY doc (bucket volume is posting ROWS = doc
    # frequency, so the hot term must be the high-df one), unique
    # tails spread thin across the other buckets
    docs = spark.createDataFrame(
        [(i, "boiler " * 5 + f"u{i}") for i in range(200)],
        "doc_id BIGINT, text STRING",
    )
    path = str(tmp_path / "hot")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    report = index_advise(spark, path, skew_bound=2.0)
    recs = [a for a in report["advice"] if a.get("param") == "stopwords"]
    assert recs, report["advice"]
    assert recs[0]["recommended"] == ["boiler"]
    assert "boiler" in recs[0]["reason"]

    # applying the recommendation: hot term's postings gone, other
    # scores identical
    fixed = str(tmp_path / "fixed")
    build_bm25_index(
        docs, fixed, "doc_id", "text", n_term_buckets=16,
        stopwords=recs[0]["recommended"],
    )
    before, _, _, _ = _index_postings(spark, path, ["boiler"])
    after, _, _, _ = _index_postings(spark, fixed, ["boiler"])
    assert before.count() == 200 and after.count() == 0
    qa = [tuple(r) for r in bm25_index_topk(spark, path, ["u7", "u19"], k=10).collect()]
    qb = [tuple(r) for r in bm25_index_topk(spark, fixed, ["u7", "u19"], k=10).collect()]
    assert qa == qb


def test_bm25_collision_skew_recommends_more_buckets(spark, tmp_path):
    """Skew WITHOUT a dominant term (many distinct terms hashing into
    the same bucket) keeps the n_term_buckets recommendation."""
    from feast_spark.operators.bm25 import build_bm25_index

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}" for j in range(30)))
            for i in range(40)
        ],
        "doc_id BIGINT, text STRING",
    )
    path = str(tmp_path / "coll")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    # every term appears once, so no term can dominate its bucket;
    # skew_bound below 1x max/mean guarantees the branch runs
    report = index_advise(spark, path, skew_bound=0.99)
    recs = [a for a in report["advice"] if a["action"] == "rebuild"]
    assert recs and recs[0]["param"] == "n_term_buckets"
    assert recs[0]["recommended"] == 32


def test_minhash_boilerplate_vs_coarse_banding_profiles(spark, tmp_path):
    """The minhash branch now diagnoses WHICH profile blew the
    hot-bucket bound: a single boilerplate cluster (few hot buckets,
    at most one per band) -> investigate; hot-ish buckets across many
    signatures -> a concrete bands rebuild."""
    from feast_spark.operators.minhash_index import build_minhash_index

    base = "the quick brown fox jumps over the lazy dog near the river "
    # profile A: one cluster of 12 identical docs, rest unique
    docs_a = spark.createDataFrame(
        [(i, base * 3) for i in range(12)]
        + [
            (100 + i, f"doc{i} " + " ".join(f"t{i}a{j}" for j in range(20)))
            for i in range(30)
        ],
        "doc_id BIGINT, text STRING",
    )
    pa = str(tmp_path / "boiler")
    build_minhash_index(docs_a, pa, bands=4, num_hashes=16)
    ra = index_advise(spark, pa, hot_bucket_bound=10)
    acts = [a["action"] for a in ra["advice"]]
    assert "investigate" in acts, ra["advice"]
    assert not any(a.get("param") == "bands" for a in ra["advice"])

    # profile B: the same cluster PLUS many near-dup pairs — hot-ish
    # buckets across far more signatures than bands can explain
    docs_b = spark.createDataFrame(
        [(i, base * 3) for i in range(12)]
        + [
            (1000 + 2 * i + off,
             f"pair{i} shared content block number {i} repeated tokens "
             * 4 + f"tail{off}")
            for i in range(60)
            for off in (0, 1)
        ],
        "doc_id BIGINT, text STRING",
    )
    pb = str(tmp_path / "coarse")
    build_minhash_index(docs_b, pb, bands=4, num_hashes=16)
    rb = index_advise(spark, pb, hot_bucket_bound=10)
    recs = [a for a in rb["advice"] if a.get("param") == "bands"]
    assert recs, rb["advice"]
    assert recs[0]["recommended"] == 2
