"""Text-analysis function tests."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    normalize_text,
    quality_features,
    quality_score,
    token_count,
)


def _one(spark, text, col):
    df = spark.createDataFrame([Row(text=text)])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "one two  three", token_count(F.col("text"))) == 3
    assert _one(spark, "", token_count(F.col("text"))) == 0
    assert _one(spark, "   ", token_count(F.col("text"))) == 0
    assert _one(spark, "single", token_count(F.col("text"))) == 1


def test_normalize_and_fingerprint(spark):
    import hashlib

    a = _one(spark, "  Hello   World ", fingerprint_md5(F.col("text")))
    assert a == hashlib.md5(b"hello world").hexdigest()
    b = _one(spark, "hello world", fingerprint_md5(F.col("text")))
    assert a == b


def test_quality_features_values(spark):
    text = "the cat sat on the mat."
    df = spark.createDataFrame([Row(text=text)])
    f = quality_features(F.col("text"))
    row = df.select(
        f["n_tokens"].alias("nt"),
        f["stopword_ratio"].alias("sr"),
        f["punct_ratio"].alias("pr"),
        f["distinct_ratio"].alias("dr"),
    ).collect()[0]
    assert row["nt"] == 6
    assert row["sr"] == pytest.approx(2 / 6)  # 'the' twice; 'on' not in list
    assert row["pr"] == pytest.approx(1 / len(text))
    assert row["dr"] == pytest.approx(5 / 6)  # 'the' repeated


def test_quality_score_bounds(spark):
    good = " ".join(["the quick brown fox jumps over a lazy dog"] * 3)
    s = _one(spark, good, quality_score(F.col("text")))
    assert 0.0 <= s <= 1.0
    empty = _one(spark, "", quality_score(F.col("text")))
    assert empty == pytest.approx(0.25)  # only the (1-punct_ratio) term


def test_lang_id_deterministic(spark):
    assert _one(spark, "the cat and the dog", lang_id(F.col("text"))) == "en"
    assert _one(spark, "el perro y la casa que se", lang_id(F.col("text"))) == "es"
    assert _one(spark, "der hund und die katze ist", lang_id(F.col("text"))) == "de"
    assert _one(spark, "les chiens et une maison des", lang_id(F.col("text"))) == "fr"
    # tie (no stopwords at all) -> priority order says 'en'
    assert _one(spark, "zzz qqq www", lang_id(F.col("text"))) == "en"


def test_repetition_stats_keeps_empty_docs(spark):
    """Null/empty texts must appear in the output with all-0.0 stats
    (the exploded empty gram array yields no rows; the join-back onto
    the input ids restores them)."""
    from pyspark.sql import Row

    from feast_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            Row(id=1, text="a a a a b"),
            Row(id=2, text=""),
            Row(id=3, text=None),
            Row(id=4, text="x"),  # 1 token: unigram stats, 0.0 bigram stats
        ],
        "id INT, text STRING",
    )
    out = {r["id"]: r for r in repetition_stats(df, "id", "text").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["top_token_frac"] == pytest.approx(0.8)
    # bigrams of "a a a a b": "a a" x3 (dup) + "a b" x1 -> 3/4
    assert out[1]["dup_bigram_frac"] == pytest.approx(0.75)
    for doc in (2, 3):
        assert out[doc]["top_token_frac"] == 0.0
        assert out[doc]["top_bigram_frac"] == 0.0
        assert out[doc]["dup_bigram_frac"] == 0.0
    assert out[4]["top_token_frac"] == 1.0
    assert out[4]["top_bigram_frac"] == 0.0


def test_scrub_pii_masks_each_kind(spark):
    from feast_spark.functions.text import with_scrubbed_text

    rows = [
        Row(id=1, text="mail me at jane.doe+spam@example.co.uk today"),
        Row(id=2, text="see https://example.com/a?b=c&user=x and www.foo.org/bar"),
        Row(id=3, text="server at 192.168.1.100 responded"),
        Row(id=4, text="ssn 123-45-6789 leaked"),
        Row(id=5, text="card 4111 1111 1111 1111 declined"),
        Row(id=6, text="call +1 (555) 123-4567 or 555-1234"),
        Row(id=7, text="nothing sensitive here, year 2024 is fine"),
    ]
    out = {
        r["id"]: r["text"]
        for r in with_scrubbed_text(
            spark.createDataFrame(rows), "text"
        ).collect()
    }
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "see <URL> and <URL>"
    assert out[3] == "server at <IP> responded"
    assert out[4] == "ssn <SSN> leaked"
    assert out[5] == "card <CARD> declined"
    assert "<PHONE>" in out[6] and "555" not in out[6]
    assert out[7] == "nothing sensitive here, year 2024 is fine"


def test_scrub_pii_kinds_subset_and_no_python(spark):
    from feast_spark.functions.text import with_scrubbed_text

    df = spark.createDataFrame(
        [Row(id=1, text="a@b.io at 10.0.0.1")]
    )
    out = with_scrubbed_text(df, "text", out_col="clean", kinds=["email"])
    row = out.collect()[0]
    assert row["clean"] == "<EMAIL> at 10.0.0.1"
    assert row["text"] == "a@b.io at 10.0.0.1"
    # pure column expressions: no BatchEvalPython / pandas UDF nodes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_bpe_ish_tokens_shape(spark):
    from feast_spark.functions.text import bpe_ish_token_count, bpe_ish_tokens
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("I'll say it's 42 dogs, really!",),
            ("",),
            ("   ",),
            ("hello",),
        ],
        "text string",
    )
    rows = df.select(
        bpe_ish_tokens(F.col("text")).alias("t"),
        bpe_ish_token_count(F.col("text")).alias("n"),
    ).collect()
    assert rows[0].t == [
        "I", "'ll", " say", " it", "'s", " 42", " dogs", ",", " really", "!",
    ]
    assert rows[0].n == 10
    assert rows[1].t == [] and rows[1].n == 0
    assert rows[2].t == ["   "] and rows[2].n == 1
    assert rows[3].t == ["hello"] and rows[3].n == 1


def test_bpe_ish_token_count_oracle(spark, duck):
    """Same pattern, same leftmost-first alternation in RE2: counts
    agree on the whole documents table."""
    from feast_spark.functions.text import BPE_ISH_PATTERN, bpe_ish_token_count
    from pyspark.sql import functions as F

    from tests.conftest import SF_MED

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_ish_token_count(F.col("text")).cast("long").alias("n")
        ).collect()
    }
    pat_sql = BPE_ISH_PATTERN.replace("'", "''")
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{pat_sql}')) AS BIGINT)
        FROM documents
        """
        ).fetchall()
    }
    assert got == want


def test_bpe_ish_vertical_tab_cross_engine(spark, duck):
    """Java \\s includes \\x0B, RE2's does not — the explicit
    whitespace class in BPE_ISH_PATTERN keeps both engines identical
    on vertical-tab text."""
    from feast_spark.functions.text import BPE_ISH_PATTERN, bpe_ish_token_count
    from pyspark.sql import functions as F

    samples = ["a\x0b b", "x\x0b", "\x0b\x0b", "tail \x0b "]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [
        r.n
        for r in df.select(
            bpe_ish_token_count(F.col("text")).cast("long").alias("n")
        ).collect()
    ]
    pat_sql = BPE_ISH_PATTERN.replace("'", "''")
    want = [
        duck.execute(
            f"SELECT CAST(len(regexp_extract_all(?, '{pat_sql}')) AS BIGINT)",
            [s],
        ).fetchone()[0]
        for s in samples
    ]
    assert got == want


def test_compression_ratio_quality_signal(spark):
    """Deflate ratio separates repetitive text (low), natural prose
    (mid-high), and incompressible noise (~1+); empty text -> NULL."""
    from pyspark.sql import Row

    from feast_spark.functions.text import with_compression_stats

    import hashlib

    noise = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(200)
    )
    df = spark.createDataFrame(
        [
            Row(id=1, text="spam spam spam " * 200),
            Row(id=2, text=("The committee reviewed seventeen distinct "
                            "architectural proposals before deciding on the "
                            "final structure of the bridge. ") * 5),
            Row(id=3, text=noise),
            Row(id=4, text=""),
            Row(id=5, text=None),
        ]
    )
    out = {r["id"]: r["deflate_ratio"]
           for r in with_compression_stats(df, "text").collect()}
    assert out[1] < 0.05                    # templated: collapses
    assert 0.05 < out[2] < 0.5              # repeated prose: mid
    assert out[3] > 0.5                     # hex noise: poorly compressible
    assert out[4] is None and out[5] is None
    assert out[1] < out[2] < out[3]


def test_url_domain_extraction(spark):
    from pyspark.sql import Row

    from feast_spark.functions.text import with_url_domain

    df = spark.createDataFrame(
        [
            Row(id=1, url="https://www.Example.com/page?q=1"),
            Row(id=2, url="http://user:pw@example.org:8080/x"),
            Row(id=3, url="example.org/path"),
            Row(id=4, url="ftp://sub.example.org/f#frag"),
            Row(id=5, url=""),
        ]
    )
    got = {r["id"]: r["domain"] for r in with_url_domain(df, "url").collect()}
    assert got == {
        1: "www.example.com",
        2: "example.org",
        3: "example.org",
        4: "sub.example.org",
        5: None,
    }


def test_html_to_text_extraction(spark):
    from pyspark.sql import Row

    from feast_spark.functions.text import with_extracted_text

    html = (
        "<html><head><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Title</h1><p>Hello &amp; welcome to the <b>site</b>.</p>"
        "<!-- hidden comment --><div>Second&nbsp;block</div>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    out = with_extracted_text(
        spark.createDataFrame([Row(id=1, html=html)]), "html"
    ).collect()[0]["text"]
    assert out.splitlines()[0] == "Title"
    assert "Hello & welcome to the site" in out
    assert "not text" not in out          # script content dropped
    assert "hidden comment" not in out    # comments dropped
    assert "color:red" not in out         # style dropped
    assert "Second block" in out          # entity decoded
    assert out.splitlines()[-2:] == ["one", "two"]
    assert not out.startswith("\n") and not out.endswith("\n")


# -- chunk_documents ----------------------------------------------------


def test_chunk_documents_semantics(spark):
    from feast_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [
            Row(id=1, text="abcdefghij"),     # 10 chars
            Row(id=2, text="abc"),            # shorter than size
            Row(id=3, text=""),               # empty -> no chunks
            Row(id=4, text=None),             # null -> no chunks
            Row(id=5, text="abcdefgh"),       # length == size -> one chunk
        ]
    )
    out = chunk_documents(df, "id", "text", size=8, overlap=2)
    rows = {(r["id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: step=6, starts = sequence(1, 10-2=8, 6) = [1, 7]
    assert rows[(1, 0)]["chunk"] == "abcdefgh"
    assert rows[(1, 0)]["chunk_start"] == 1
    assert rows[(1, 1)]["chunk"] == "ghij"
    assert rows[(1, 1)]["chunk_start"] == 7
    assert rows[(1, 1)]["n_chunk_chars"] == 4
    # short doc: single chunk, whole text
    assert rows[(2, 0)]["chunk"] == "abc"
    # exact-size doc: starts = sequence(1, 6, 6) = [1] -> one chunk
    assert rows[(5, 0)]["chunk"] == "abcdefgh"
    assert (5, 1) not in rows
    # empty/null docs contribute nothing
    assert not any(k[0] in (3, 4) for k in rows)
    # successive chunks overlap by exactly `overlap` chars
    assert rows[(1, 0)]["chunk"][-2:] == rows[(1, 1)]["chunk"][:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    from feast_spark.functions.text import chunk_documents

    df = spark.createDataFrame([Row(id=1, text="abc")])
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", size=10, overlap=10)


def test_chunk_documents_zero_shuffle_plan(spark):
    """The chunking plan must stay narrow: no Exchange, no Python."""
    from feast_spark.functions.text import chunk_documents

    df = spark.createDataFrame([Row(id=i, text="x" * 50) for i in range(4)])
    plan = chunk_documents(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF fell into the path


def test_chunk_documents_reassembles(spark):
    """Dropping each chunk's overlap prefix (except the first) and
    concatenating in chunk_id order reconstructs the document."""
    from feast_spark.functions.text import chunk_documents

    text = "the quick brown fox jumps over the lazy dog " * 7  # 308 chars
    df = spark.createDataFrame([Row(id=1, text=text)])
    out = chunk_documents(df, "id", "text", size=100, overlap=20).collect()
    parts = {r["chunk_id"]: r["chunk"] for r in out}
    rebuilt = parts[0] + "".join(
        parts[i][20:] for i in sorted(parts) if i > 0
    )
    assert rebuilt == text


def test_scrub_pii_masks_all_kinds(spark):
    from feast_spark.functions.text import scrub_pii

    raw = (
        "mail a.b+c@x-corp.io see https://ex.org/a?b=1 or www.foo.com "
        "host 192.168.0.1 ssn 123-45-6789 card 4111 1111 1111 1111 "
        "call (415) 555-0132 plain words stay"
    )
    got = _one(spark, raw, scrub_pii(F.col("text")))
    assert got == (
        "mail <EMAIL> see <URL> or <URL> "
        "host <IP> ssn <SSN> card <CARD> "
        "call <PHONE> plain words stay"
    )


def test_chunk_documents_unicode_codepoints(spark):
    """Chunk offsets count codepoints (Spark length/substr semantics),
    so multibyte text reassembles exactly like ASCII."""
    from feast_spark.functions.text import chunk_documents

    text = "héllo wörld 中文测试 🎉🚀 " * 10
    df = spark.createDataFrame([Row(id=1, text=text)])
    out = chunk_documents(df, "id", "text", size=16, overlap=4).collect()
    parts = {r["chunk_id"]: r["chunk"] for r in out}
    rebuilt = parts[0] + "".join(parts[i][4:] for i in sorted(parts) if i > 0)
    assert rebuilt == text


def test_scrub_pii_kinds_restriction(spark):
    from feast_spark.functions.text import scrub_pii

    raw = "mail a@b.co see https://x.io ssn 123-45-6789"
    only_email = _one(spark, raw, scrub_pii(F.col("text"), kinds=["email"]))
    assert only_email == "mail <EMAIL> see https://x.io ssn 123-45-6789"
    only_ssn = _one(spark, raw, scrub_pii(F.col("text"), kinds=["ssn"]))
    assert only_ssn == "mail a@b.co see https://x.io ssn <SSN>"


def test_chunk_documents_randomized_invariants(spark):
    """Seeded random corpus x (size, overlap) grid: chunks cover the
    doc exactly (reassembly), every chunk <= size, offsets align to
    the stride, and overlap prefixes match suffixes."""
    import random

    rng = random.Random(7)
    alphabet = "ab 中🎉xyz\n"
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 300))))
        for i in range(60)
    ]
    from feast_spark.functions.text import chunk_documents

    df = spark.createDataFrame(docs, "id long, text string")
    for size, overlap in [(10, 0), (16, 4), (50, 20), (300, 299)]:
        if overlap >= size:
            continue
        step = size - overlap
        out = chunk_documents(df, "id", "text", size=size, overlap=overlap)
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r["id"], {})[r["chunk_id"]] = r
            assert r["n_chunk_chars"] <= size
            assert (r["chunk_start"] - 1) % step == 0
        for i, text in docs:
            parts = by_doc[i]
            assert sorted(parts) == list(range(len(parts)))
            rebuilt = parts[0]["chunk"] + "".join(
                parts[j]["chunk"][overlap:] for j in sorted(parts) if j > 0
            )
            assert rebuilt == text, (i, size, overlap)
