"""Cross-index corpus alignment for the hybrid retrieval pair
(operators/paired_index.py + streaming.index_sink.hybrid_index_sink):
a crash between the paired appends must make hybrid queries fail
loudly (never silently fuse mismatched corpora), and the documented
repair paths must converge the pair."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.bm25 import (
    build_bm25_index,
    hybrid_index_topk,
    hybrid_index_topk_batch,
)
from feast_spark.operators.paired_index import (
    check_corpus_alignment,
    corpus_epoch,
    hybrid_index_append,
)
from feast_spark.operators.similarity import build_ivf_index
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

N_CENTROIDS = 4
TERMS = ["spark", "merge"]


def _tables(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return docs, emb


def _build_pair(spark, tmp_path, hi=100):
    docs, emb = _tables(spark)
    lex_path, vec_path = str(tmp_path / "bm25"), str(tmp_path / "ivf")
    build_bm25_index(
        docs.filter(F.col("doc_id") < hi), lex_path, "doc_id", "text",
        n_term_buckets=8,
    )
    build_ivf_index(
        emb.filter(F.col("vec_id") < hi), vec_path,
        n_centroids=N_CENTROIDS, iters=1,
    )
    return docs, emb, lex_path, vec_path


def _slice(docs, emb, lo, hi):
    return (
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
    )


def _qvec(emb):
    dim = len(emb.select("embedding").first()[0])
    return [float((i * 37) % 19) / 19.0 for i in range(dim)]


def _serve(spark, lex_path, vec_path, qvec, **kw):
    return hybrid_index_topk(
        spark, lex_path, None, TERMS, qvec, k=5,
        vec_index_path=vec_path, n_probe=N_CENTROIDS, **kw
    )


def test_paired_append_stamps_both_and_serves(spark, tmp_path):
    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    d1, e1 = _slice(docs, emb, 100, 130)
    tok = hybrid_index_append(spark, lex_path, vec_path, d1, e1)
    assert tok == 0
    assert corpus_epoch(lex_path) == 0 and corpus_epoch(vec_path) == 0
    d2, e2 = _slice(docs, emb, 130, 160)
    assert hybrid_index_append(spark, lex_path, vec_path, d2, e2) == 1
    rep = check_corpus_alignment(lex_path, vec_path)
    assert rep == {"bm25": 1, "vector": 1, "aligned": True}
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5


@pytest.mark.nightly
def test_crash_between_appends_fails_loudly_then_resume_repairs(
    spark, tmp_path, monkeypatch
):
    """The verdict contract: crash injected between the two appends ->
    hybrid fails loudly; resume with the SAME slice converges the pair
    and the repaired hybrid equals a crash-free pair row-for-row."""
    import feast_spark.operators.vector_index as vi

    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    d1, e1 = _slice(docs, emb, 100, 130)
    qvec = _qvec(emb)

    real_append = vi.vector_index_append
    monkeypatch.setattr(
        vi, "vector_index_append",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        hybrid_index_append(spark, lex_path, vec_path, d1, e1)
    monkeypatch.setattr(vi, "vector_index_append", real_append)

    # half-applied pair: bm25 committed token 0, vector stayed at -1
    assert corpus_epoch(lex_path) == 0 and corpus_epoch(vec_path) == -1
    with pytest.raises(ValueError, match="corpus-misaligned"):
        _serve(spark, lex_path, vec_path, qvec).count()
    with pytest.raises(ValueError, match="corpus-misaligned"):
        qs = spark.createDataFrame(
            [(1, TERMS, qvec)],
            "query_id LONG, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>",
        )
        hybrid_index_topk_batch(
            spark, lex_path, None, qs, k=5,
            vec_index_path=vec_path, n_probe=N_CENTROIDS,
        ).count()
    # degraded mode is opt-in and still audible
    with pytest.warns(UserWarning, match="corpus-misaligned"):
        assert _serve(
            spark, lex_path, vec_path, qvec, on_corpus_mismatch="warn"
        ).count() == 5

    # a fresh append over the diverged pair must refuse
    d2, e2 = _slice(docs, emb, 130, 160)
    with pytest.raises(ValueError, match="diverged"):
        hybrid_index_append(spark, lex_path, vec_path, d2, e2)

    # repair: SAME slice, resume=True -> only the vector side appends
    assert hybrid_index_append(
        spark, lex_path, vec_path, d1, e1, resume=True
    ) == 0
    assert corpus_epoch(lex_path) == 0 and corpus_epoch(vec_path) == 0
    repaired = _serve(spark, lex_path, vec_path, qvec).collect()

    # crash-free twin over the same corpus (full probe -> the IVF
    # channel is the brute scan, so quantizer differences are moot)
    docs2, emb2, lex2, vec2 = _build_pair(spark, tmp_path / "twin")
    hybrid_index_append(spark, lex2, vec2, d1, e1)
    clean = _serve(spark, lex2, vec2, qvec).collect()
    assert [tuple(r) for r in repaired] == [tuple(r) for r in clean]


def test_resume_on_aligned_pair_raises(spark, tmp_path):
    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    d1, e1 = _slice(docs, emb, 100, 130)
    hybrid_index_append(spark, lex_path, vec_path, d1, e1)
    with pytest.raises(ValueError, match="aligned pair"):
        hybrid_index_append(
            spark, lex_path, vec_path, d1, e1, resume=True
        )


def test_resume_refuses_unstamped_side(spark, tmp_path):
    """resume must not treat an UNSTAMPED side as 'one behind': a side
    rebuilt from the full corpus (rebuild drops the token) already
    contains the slice — resuming onto it would double-append (r12
    review finding)."""
    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    d1, e1 = _slice(docs, emb, 100, 130)
    hybrid_index_append(spark, lex_path, vec_path, d1, e1)
    build_ivf_index(  # rebuild over the full corpus: token dropped
        emb.filter(F.col("vec_id") < 130), vec_path,
        n_centroids=N_CENTROIDS, iters=1,
    )
    assert corpus_epoch(vec_path) is None
    with pytest.raises(ValueError, match="BOTH sides stamped"):
        hybrid_index_append(
            spark, lex_path, vec_path, d1, e1, resume=True
        )


def test_vector_rebuild_drops_token_and_pair_reinitializes(spark, tmp_path):
    """A vector-side rebuild (the advisor's drift remedy) drops the
    corpus token by the carried-meta allowlist; the check exempts the
    unstamped side and the next paired append re-adopts the BM25
    side's token instead of calling the pair diverged."""
    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    d1, e1 = _slice(docs, emb, 100, 130)
    hybrid_index_append(spark, lex_path, vec_path, d1, e1)
    build_ivf_index(  # rebuild over the full vector corpus
        emb.filter(F.col("vec_id") < 130), vec_path,
        n_centroids=N_CENTROIDS, iters=1,
    )
    assert corpus_epoch(vec_path) is None
    assert check_corpus_alignment(lex_path, vec_path)["aligned"]
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5
    d2, e2 = _slice(docs, emb, 130, 160)
    assert hybrid_index_append(spark, lex_path, vec_path, d2, e2) == 1
    assert corpus_epoch(vec_path) == 1


def test_all_blank_lexical_slice_still_advances_both_tokens(
    spark, tmp_path
):
    """A slice whose texts all tokenize to nothing no-ops the BM25
    epoch append; the token stamp must still advance on BOTH sides or
    the pair would read as diverged despite agreeing semantically."""
    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    blank_docs = spark.createDataFrame(
        [(10_000 + i, "   ") for i in range(5)], "doc_id BIGINT, text STRING"
    )
    dim = len(emb.select("embedding").first()[0])
    blank_emb = spark.createDataFrame(
        [(10_000 + i, [float(i + 1)] * dim) for i in range(5)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    assert hybrid_index_append(
        spark, lex_path, vec_path, blank_docs, blank_emb
    ) == 0
    assert corpus_epoch(lex_path) == 0 and corpus_epoch(vec_path) == 0
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5


def test_ivfpq_pair_dispatches_and_aligns(spark, tmp_path):
    """The paired append dispatches the vector side on the kind stamp:
    an IVFPQ pair stamps and validates identically."""
    from feast_spark.operators.pq_index import build_ivfpq_index

    docs, emb = _tables(spark)
    lex_path, vec_path = str(tmp_path / "bm25"), str(tmp_path / "pq")
    build_bm25_index(
        docs.filter(F.col("doc_id") < 100), lex_path, "doc_id", "text",
        n_term_buckets=8,
    )
    build_ivfpq_index(
        emb.filter(F.col("vec_id") < 100), vec_path,
        n_centroids=N_CENTROIDS, iters=1,
    )
    d1, e1 = _slice(docs, emb, 100, 130)
    assert hybrid_index_append(spark, lex_path, vec_path, d1, e1) == 0
    assert corpus_epoch(vec_path) == 0
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5


@pytest.mark.nightly
def test_hybrid_sink_streams_pair_and_repairs_crashed_batch(
    spark, tmp_path, monkeypatch
):
    """The streaming co-sink: batches advance one shared token per
    micro-batch; a crash between the two appends is repaired by the
    at-least-once redelivery (only the lagging side re-applies, under
    the leader's token); full replays are skipped on both sides."""
    import feast_spark.streaming.index_sink as sink_mod
    from feast_spark.streaming.index_sink import hybrid_index_sink

    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    both = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "vec_id", "embedding"
    )
    b0 = both.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 130))
    b1 = both.filter((F.col("doc_id") >= 130) & (F.col("doc_id") < 160))
    b2 = both.filter((F.col("doc_id") >= 160) & (F.col("doc_id") < 190))
    fn = hybrid_index_sink(spark, lex_path, vec_path)

    fn(b0, 0)
    fn(b1, 1)
    assert corpus_epoch(lex_path) == 1 and corpus_epoch(vec_path) == 1

    # full replay: skipped on both sides, tokens unchanged
    fn(b1, 1)
    assert corpus_epoch(lex_path) == 1 and corpus_epoch(vec_path) == 1

    # crash between the two appends of batch 2
    import feast_spark.operators.vector_index as vi

    real_append = vi.vector_index_append
    monkeypatch.setattr(
        vi, "vector_index_append",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        fn(b2, 2)
    monkeypatch.setattr(vi, "vector_index_append", real_append)
    assert corpus_epoch(lex_path) == 2 and corpus_epoch(vec_path) == 1
    with pytest.raises(ValueError, match="corpus-misaligned"):
        _serve(spark, lex_path, vec_path, _qvec(emb)).count()

    # at-least-once redelivery of the SAME batch repairs the pair
    fn(b2, 2)
    assert corpus_epoch(lex_path) == 2 and corpus_epoch(vec_path) == 2
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5

    # a deep divergence (one side lost its watermark entirely) refuses
    sink_mod.clear_stream_watermark(vec_path)
    with pytest.raises(ValueError, match="more than one in-flight"):
        fn(b1, 1)


@pytest.mark.nightly
def test_doctor_pair_cli(spark, tmp_path, capsys):
    """doctor --pair: 0 on aligned or unstamped pairs, 1 with the
    repair instruction on diverged tokens; --strict additionally exits
    3 on an unstamped side (the alignment-exemption window a rebuild
    opens — a cron watching a stamped production pair wants it loud);
    no Spark session needed."""
    from feast_spark.cli import main
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.paired_index import ensure_meta

    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    # state 1: unstamped pair — default exempt/ok, strict alarms
    rc = main(["doctor", "--pair", lex_path, vec_path])
    out = capsys.readouterr().out
    assert rc == 0 and "unstamped" in out
    rc = main(["doctor", "--pair", lex_path, vec_path, "--strict"])
    out = capsys.readouterr().out
    assert rc == 3 and "UNSTAMPED" in out

    # state 2: both stamped + aligned — 0 under both modes
    d1, e1 = _slice(docs, emb, 100, 130)
    hybrid_index_append(spark, lex_path, vec_path, d1, e1)
    for flags in ([], ["--strict"]):
        rc = main(["doctor", "--pair", lex_path, vec_path, *flags])
        out = capsys.readouterr().out
        assert rc == 0 and "corpus-aligned" in out, flags

    # state 2b: ONE side unstamped (rebuild window) — strict exits 3
    build_ivf_index(
        emb.filter(F.col("vec_id") < 130), vec_path,
        n_centroids=N_CENTROIDS, iters=1,
    )
    rc = main(["doctor", "--pair", lex_path, vec_path])
    out = capsys.readouterr().out
    assert rc == 0 and "unstamped" in out
    rc = main(["doctor", "--pair", lex_path, vec_path, "--strict"])
    out = capsys.readouterr().out
    assert rc == 3 and "UNSTAMPED" in out and "restamp_pair" in out

    # state 3: diverged — 1 under both modes (repair, not restamp)
    ensure_meta(vec_path, LocalFS(), {"corpus_epoch": 7})
    for flags in ([], ["--strict"]):
        rc = main(["doctor", "--pair", lex_path, vec_path, *flags])
        out = capsys.readouterr().out
        assert rc == 1 and "MISALIGNED" in out and "resume=True" in out, flags

    # missing path -> exit 2 (distinct from misalignment: a cron must
    # never run the repair against a typo), strict or not
    for flags in ([], ["--strict"]):
        rc = main(
            ["doctor", "--pair", lex_path, str(tmp_path / "nope"), *flags]
        )
        out = capsys.readouterr().out
        assert rc == 2 and "error" in out, flags

    with pytest.raises(SystemExit):
        main(["doctor", "--pair", lex_path, vec_path, "--index", lex_path])
    with pytest.raises(SystemExit):  # --strict without --pair is loud
        main(["doctor", "--strict"])


@pytest.mark.nightly
def test_restamp_pair_closes_rebuild_window(spark, tmp_path):
    """restamp_pair: after a rebuild of ONE side from the pair's
    corpus (caller-attested), the surviving token is copied over and
    alignment checking resumes immediately; every ambiguous state
    refuses."""
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.paired_index import ensure_meta, restamp_pair

    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)

    # neither side stamped: nothing to carry
    with pytest.raises(ValueError, match="neither side"):
        restamp_pair(lex_path, vec_path, attest_same_corpus=True)

    d1, e1 = _slice(docs, emb, 100, 130)
    hybrid_index_append(spark, lex_path, vec_path, d1, e1)

    # aligned pair: idempotent no-op
    assert restamp_pair(lex_path, vec_path, attest_same_corpus=True) == 0

    # the runbook: vector side rebuilt over the pair's full corpus
    build_ivf_index(
        emb.filter(F.col("vec_id") < 130), vec_path,
        n_centroids=N_CENTROIDS, iters=1,
    )
    assert corpus_epoch(vec_path) is None
    # attestation is mandatory — the stamp is a corpus-identity claim
    with pytest.raises(ValueError, match="attest_same_corpus"):
        restamp_pair(lex_path, vec_path)
    assert corpus_epoch(vec_path) is None  # refused == untouched
    assert restamp_pair(lex_path, vec_path, attest_same_corpus=True) == 0
    assert corpus_epoch(vec_path) == 0
    assert check_corpus_alignment(lex_path, vec_path) == {
        "bm25": 0, "vector": 0, "aligned": True,
    }
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5
    # and the next paired append advances normally
    d2, e2 = _slice(docs, emb, 130, 160)
    assert hybrid_index_append(spark, lex_path, vec_path, d2, e2) == 1

    # diverged pair: restamp refuses — that is a crash, not a rebuild
    ensure_meta(vec_path, LocalFS(), {"corpus_epoch": 9})
    with pytest.raises(ValueError, match="diverged"):
        restamp_pair(lex_path, vec_path, attest_same_corpus=True)


@pytest.mark.nightly
def test_hybrid_sink_through_real_readstream(spark, tmp_path):
    """The co-sink behind a REAL readStream + foreachBatch: one
    availableNow batch advances both watermarks and both corpus tokens
    together, and the pair serves."""
    from feast_spark.io import epochs as epochs_io
    from feast_spark.io.fs import LocalFS
    from feast_spark.streaming.index_sink import hybrid_index_sink

    docs, emb, lex_path, vec_path = _build_pair(spark, tmp_path)
    both = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "vec_id", "embedding"
    )
    schema = ("doc_id BIGINT, text STRING, vec_id BIGINT, "
              "embedding ARRAY<DOUBLE>")
    src = tmp_path / "in"
    src.mkdir()
    both.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 140)
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(src / "b1"))
    q = (
        stream.writeStream.foreachBatch(
            hybrid_index_sink(spark, lex_path, vec_path)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    fs = LocalFS()
    mb = epochs_io.read_manifest(lex_path, fs)
    mv = epochs_io.read_manifest(vec_path, fs)
    assert mb["stream_epoch"] == 0 and mv["stream_epoch"] == 0
    assert mb["corpus_epoch"] == mv["corpus_epoch"] == 0
    assert _serve(spark, lex_path, vec_path, _qvec(emb)).count() == 5
