"""End-to-end corpus pipeline: stage accounting + output invariants at
sf0.01, plus config toggles."""

import pytest
from pyspark.sql import functions as F

from feast_spark.pipelines import CorpusConfig, build_corpus
from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_MED}/documents.parquet")


def test_full_pipeline(spark, docs):
    eval_df = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    cfg = CorpusConfig(
        budgets={f"src{i}": 1_000 for i in range(20)},
        pack_max_tokens=256,
    )
    out, stages = build_corpus(docs, eval_df=eval_df, config=cfg, report=True)
    rows = out.collect()

    # stage accounting: monotone non-increasing through the filters
    order = [
        "input", "filtered", "exact_dedup", "near_dedup",
        "decontaminated", "mixed",
    ]
    for a, b in zip(order, order[1:]):
        assert stages[b] <= stages[a], stages
    assert stages["output"] == stages["mixed"] == len(rows)
    # decontamination must actually remove the planted eval overlap
    assert stages["decontaminated"] < stages["near_dedup"]

    # output invariants
    for r in rows:
        assert r.quality_score >= 0.5
        assert 10 <= r.n_tokens <= 5000
        assert r.split in ("train", "val", "test")
        assert r.seq_id is not None and r.seq_pos >= 0
    # per-source budget respected
    per_source = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + r.n_tokens
    assert all(v <= 1_000 for v in per_source.values()), per_source
    # no surviving doc shares an 8-gram with the eval set (spot-check
    # by construction: every eval doc's id was dropped — eval docs are
    # drawn from the corpus itself, so each survives only if filtered
    # out earlier for other reasons)
    eval_ids = {r.doc_id for r in eval_df.collect()}
    assert not eval_ids & {r.doc_id for r in rows}

    # a training sequence must never straddle splits: filtering one
    # split downstream would otherwise leave seq_pos gaps and leak
    # val/test text into packed train sequences
    splits_per_seq = {}
    for r in rows:
        splits_per_seq.setdefault(r.seq_id, set()).add(r.split)
    assert all(len(s) == 1 for s in splits_per_seq.values()), {
        k: v for k, v in splits_per_seq.items() if len(v) > 1
    }

    # determinism end-to-end
    out2 = build_corpus(
        docs.repartition(7), eval_df=eval_df, config=cfg
    )
    assert {(r.doc_id, r.split, r.seq_id, r.seq_pos) for r in out2.collect()} == {
        (r.doc_id, r.split, r.seq_id, r.seq_pos) for r in rows
    }


def test_pipeline_minimal_config(spark, docs):
    """All optional stages off: featurize -> filter -> exact dedup ->
    split only."""
    cfg = CorpusConfig(near_dedup=False)
    out = build_corpus(docs, config=cfg)
    cols = set(out.columns)
    assert {"quality_score", "n_tokens", "lang_pred", "split"} <= cols
    assert "seq_id" not in cols
    # exact dedup held: normalized fingerprints unique
    from feast_spark.functions.text import fingerprint_md5

    n = out.count()
    assert (
        out.select(fingerprint_md5(F.col("text")).alias("fp")).distinct().count()
        == n
    )


def test_pipeline_lang_gate(spark, docs):
    cfg = CorpusConfig(near_dedup=False, langs=("en",))
    out = build_corpus(docs, config=cfg)
    assert out.filter(F.col("lang_pred") != "en").count() == 0


def test_pipeline_html_and_boilerplate_stages(spark):
    """html_input extracts prose before featurization; the boilerplate
    stage removes cross-doc repeated lines before quality gating."""
    from pyspark.sql import Row

    from feast_spark.pipelines.corpus import CorpusConfig, build_corpus

    footer = "subscribe to our newsletter for weekly updates today"
    body = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps in the warm sun for a while longer than usual"
    )
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=(
                    f"<html><body><p>{body} variant {i}</p>"
                    f"<div>{footer}</div></body></html>"
                ),
                source="web",
            )
            for i in range(6)
        ]
    )
    out, report = build_corpus(
        docs,
        config=CorpusConfig(
            html_input=True,
            boilerplate_min_docs=3,
            min_quality=0.0,
            min_tokens=5,
            near_dedup=False,
        ),
        report=True,
    )
    rows = out.collect()
    assert len(rows) == 6
    for r in rows:
        assert "<p>" not in r["text"] and "<html>" not in r["text"]
        assert footer not in r["text"]          # boilerplate line removed
        assert "quick brown fox" in r["text"]   # prose kept
    assert report["line_dedup"] == 6


def test_portable_hashes_mode_matches_fast_path(spark, docs):
    """portable_hashes=True (md5 signatures/shingles — the oracle mode,
    now driver-gated as the corpus_pipeline query) must select the SAME
    surviving documents as the xxhash64 fast path: both candidate
    generators feed an exact-Jaccard verify, so results differ only if
    one hash family misses a true near-dup candidate."""
    eval_df = docs.filter(F.col("doc_id") % 29 == 0).select("doc_id", "text")
    cfg = dict(
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        budgets={"src0": 800, "src1": 400, "src2": 100000, "src3": 1200},
        n_shards=4,
    )
    fast = build_corpus(docs, eval_df=eval_df, config=CorpusConfig(**cfg))
    portable = build_corpus(
        docs, eval_df=eval_df,
        config=CorpusConfig(portable_hashes=True, **cfg),
    )
    cols = ["doc_id", "source", "lang_pred", "split"]
    a = sorted(tuple(r) for r in fast.select(*cols).collect())
    b = sorted(tuple(r) for r in portable.select(*cols).collect())
    assert a == b and len(a) > 0


def test_line_dedup_approx_knob_reaches_facade(spark):
    """line_dedup_approx=True must remove the same genuinely-frequent
    boilerplate as the exact mode through the facade (HLL counts are
    ±rsd, so only threshold-straddling lines may differ — the planted
    banner is in every doc, far above min_docs)."""
    import pandas as pd

    banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    rows = [
        {
            "doc_id": i,
            "text": f"{banner}\n" + " ".join(
                f"word{i}w{j} the a and of to in is it" for j in range(12)
            ),
            "source": "src0",
        }
        for i in range(40)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    cfg = dict(
        boilerplate_min_docs=5, near_dedup=False,
        budgets=None, pack_max_tokens=None,
    )
    exact, st_exact = build_corpus(
        docs, config=CorpusConfig(**cfg), report=True
    )
    approx, st_approx = build_corpus(
        docs, config=CorpusConfig(line_dedup_approx=True, **cfg), report=True
    )
    assert st_exact["line_dedup"] == st_approx["line_dedup"] == 40
    for out in (exact, approx):
        texts = [r.text for r in out.select("text").collect()]
        assert texts and all(banner not in t for t in texts)


def test_semantic_dedup_stage(spark, docs):
    """Passing embeddings_df activates the SemDeDup stage: docs whose
    embeddings are near-identical collapse to one representative even
    when their TEXTS share nothing (the paraphrase failure mode of
    shingle-based dedup)."""
    import numpy as np
    from pyspark.sql import Row

    ids = [r.doc_id for r in docs.select("doc_id").limit(40).collect()]
    rng = np.random.default_rng(11)
    rows = []
    base = rng.normal(0, 1, 16) * 8
    for i, did in enumerate(ids):
        if i < 2:  # first two docs: planted semantic dups of each other
            v = base + rng.normal(0, 1e-3, 16)
        else:
            v = rng.normal(0, 1, 16) * 8
        rows.append(Row(doc_id=did, embedding=[float(x) for x in v]))
    emb = spark.createDataFrame(rows)
    sub = docs.filter(F.col("doc_id").isin(ids))
    cfg = CorpusConfig(
        near_dedup=False, min_quality=0.0, min_tokens=1,
        semantic_clusters=8, semantic_threshold=0.999,
    )
    out, stages = build_corpus(
        sub, config=cfg, report=True, embeddings_df=emb
    )
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    lo, hi = sorted(ids[:2])
    assert lo in kept and hi not in kept  # min-id representative
    assert stages["semantic_dedup"] == stages["exact_dedup"] - 1


def test_substring_dedup_stage(spark):
    """substring_dedup_min_chars splices cross-doc verbatim runs out
    before featurization (quality/lang then score the cleaned prose)."""
    from pyspark.sql import Row

    shared = "this exact legal disclaimer paragraph is repeated verbatim in every document of the batch"
    rows = [
        Row(
            doc_id=i,
            text=" ".join(f"doc{i}word{j} the a of to in is it" for j in range(10))
            + " " + shared,
            source="src0",
        )
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows)
    out, stages = build_corpus(
        docs,
        config=CorpusConfig(
            substring_dedup_min_chars=40, near_dedup=False,
            min_quality=0.0, min_tokens=1,
        ),
        report=True,
    )
    assert stages["substring_dedup"] == 12
    assert stages["output"] == 12  # every doc survives (unique prefixes)
    assert all(
        shared in r.text for r in docs.collect()
    )  # sanity: planted everywhere
    # ...and the repeated run is gone from every output document
    out_texts = [r.text for r in out.select("text").collect()]
    assert out_texts and all(shared not in t for t in out_texts)


def test_chunk_stage(spark, docs):
    cfg = CorpusConfig(chunk_size=120, chunk_overlap=24, near_dedup=False)
    out, stages = build_corpus(docs, config=cfg, report=True)
    rows = out.collect()
    assert stages["output"] == len(rows) > stages["exact_dedup"]  # expansion
    cols = set(out.columns)
    assert {"doc_id", "chunk_id", "chunk_start", "chunk",
            "n_chunk_chars", "split"} <= cols
    # split label rides onto every chunk, consistent within a doc
    by_doc = {}
    for r in rows:
        assert r["split"] in ("train", "val", "test")
        by_doc.setdefault(r["doc_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_doc.values())
    # chunk length bounded by chunk_size
    assert all(r["n_chunk_chars"] <= 120 for r in rows)


def test_chunk_dedup_drops_boilerplate_chunks(spark):
    from pyspark.sql import Row

    # 40-char boilerplate prefix shared by all docs; chunk_size 40,
    # overlap 0 -> first window identical across docs
    boiler = "LICENSE HEADER COMMON TO EVERY DOCUMENT "  # 40 chars
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=boiler + f"unique body {i} " +
                " ".join(f"tok{i}w{j}" for j in range(30)))
            for i in range(6)
        ]
    )
    cfg = CorpusConfig(
        chunk_size=40, chunk_overlap=0, near_dedup=False,
        min_quality=0.0, min_tokens=1,
    )
    out = build_corpus(docs, config=cfg)
    first_windows = [r for r in out.collect() if r["chunk_id"] == 0]
    # only ONE copy of the boilerplate first window survives
    assert len([r for r in first_windows if r["chunk"] == boiler]) == 1
    # without chunk_dedup every copy survives
    cfg2 = CorpusConfig(
        chunk_size=40, chunk_overlap=0, near_dedup=False,
        min_quality=0.0, min_tokens=1, chunk_dedup=False,
    )
    out2 = build_corpus(docs, config=cfg2)
    kept = [r for r in out2.collect()
            if r["chunk_id"] == 0 and r["chunk"] == boiler]
    assert len(kept) == 6


def test_chunk_and_pack_mutually_exclusive(spark, docs):
    cfg = CorpusConfig(chunk_size=100, pack_max_tokens=256)
    with pytest.raises(ValueError):
        build_corpus(docs, config=cfg)


def test_scrub_pii_stage(spark):
    from pyspark.sql import Row

    body = " ".join(f"w{j}" for j in range(30))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"reach me at alice@example.com {body}"),
            Row(doc_id=2, text=f"server on 10.1.2.3 {body}"),
            Row(doc_id=3, text=f"plain document {body}"),
        ]
    )
    cfg = CorpusConfig(
        scrub_pii_kinds="all", near_dedup=False,
        min_quality=0.0, min_tokens=1,
    )
    out = {r["doc_id"]: r["text"] for r in build_corpus(docs, config=cfg).collect()}
    assert "<EMAIL>" in out[1] and "alice@example.com" not in out[1]
    assert "<IP>" in out[2] and "10.1.2.3" not in out[2]
    assert "plain document" in out[3]
    # restricted kinds: only email masked
    cfg2 = CorpusConfig(
        scrub_pii_kinds=("email",), near_dedup=False,
        min_quality=0.0, min_tokens=1,
    )
    out2 = {r["doc_id"]: r["text"] for r in build_corpus(docs, config=cfg2).collect()}
    assert "<EMAIL>" in out2[1]
    assert "10.1.2.3" in out2[2]  # ip left alone
    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_corpus(docs, config=CorpusConfig(scrub_pii_kinds=()))


def test_repetition_gate_stage(spark):
    from pyspark.sql import Row

    clean = " ".join(f"tok{j}" for j in range(40))
    spam = "buy now " * 30  # top bigram dominates
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=clean), Row(doc_id=2, text=spam)]
    )
    cfg = CorpusConfig(
        max_top_bigram_frac=0.2, near_dedup=False,
        min_quality=0.0, min_tokens=1,
    )
    out, stages = build_corpus(docs, config=cfg, report=True)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1}
    assert stages["repetition_gate"] == 1 < stages["filtered"]


def test_scrub_pii_kinds_validation(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(doc_id=1, text="x " * 20)])
    # a bare non-'all' string would iterate per-character and scrub
    # nothing; typo'd kinds likewise — both must raise
    with pytest.raises(ValueError, match="must be 'all'"):
        build_corpus(docs, config=CorpusConfig(scrub_pii_kinds="email"))
    with pytest.raises(ValueError, match="unknown"):
        build_corpus(docs, config=CorpusConfig(scrub_pii_kinds=("emails",)))


def test_quarantine_stage_reaches_facade(spark):
    """quarantine_rules splits dead-letter rows out before any other
    stage: malformed rows never reach featurize/dedup, the sink
    receives them annotated, and the report counts the stage."""
    from pyspark.sql import Row

    from feast_spark.operators.expectations import row_not_null

    good_text = " ".join(f"tok{j}" for j in range(30))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good_text),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text=good_text + " three"),
        ]
    )
    dead = []
    out, stages = build_corpus(
        docs,
        config=CorpusConfig(near_dedup=False, min_quality=0.0, min_tokens=1),
        report=True,
        quarantine_rules={"text_not_null": row_not_null("text")},
        quarantine_sink=lambda bad: dead.extend(bad.collect()),
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 3}
    assert stages["quarantine"] == 2 < stages["input"]
    assert [(r["doc_id"], list(r["violations"])) for r in dead] == [
        (2, ["text_not_null"])
    ]
