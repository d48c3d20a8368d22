"""Dedup operator tests: handwritten cases + recall of the approximate
(LSH) paths against the exact Jaccard operator on driver testdata."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.docdedup import (
    exact_dedup,
    exact_dup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    simhash_pairs,
    with_shingles,
)
from tests.conftest import SF_MED


def test_exact_dedup_normalization(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="Hello  World"),
            Row(id=2, text="hello world"),   # same after normalization
            Row(id=3, text="HELLO\tWORLD "),  # same after normalization
            Row(id=4, text="different text"),
        ]
    )
    kept = exact_dedup(df, "id", "text")
    assert sorted(r["id"] for r in kept.collect()) == [1, 4]
    groups = exact_dup_groups(df, "id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3
    assert groups[0]["keep_id"] == 1


def test_exact_dedup_select_narrow_projection(spark):
    """select= keeps only id + requested columns through the shuffle;
    same winners as the full-row form."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            Row(id=2, text="hello world", extra="b"),
            Row(id=1, text="Hello  World", extra="a"),
            Row(id=5, text="other", extra="e"),
        ]
    ).withColumn("n_chars", F.length("text"))
    slim = exact_dedup(df, "id", "text", select=["n_chars"])
    assert set(slim.columns) == {"id", "n_chars"}
    rows = {r["id"]: r["n_chars"] for r in slim.collect()}
    # winner per group is the min id, carrying ITS OWN derived column
    assert rows == {1: len("Hello  World"), 5: len("other")}


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([Row(id=1, text="one two"), Row(id=2, text="a b c d")])
    sh = {r["id"]: r["shingles"] for r in with_shingles(df, "text", 3).collect()}
    assert sh[1] == ["one two"]          # shorter than n => whole text
    assert sh[2] == ["a b c", "b c d"]


def test_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="w1 w2 w3 w4 w5 w6"),
            Row(id=2, text="w1 w2 w3 w4 w5 w6"),     # identical -> jaccard 1.0
            Row(id=3, text="x1 x2 x3 x4 x5 x6"),     # disjoint
        ]
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(df, "id", "text", n=3, threshold=0.1).collect()}
    assert pairs == {(1, 2): 1.0}


def test_minhash_recall_vs_exact(spark):
    """LSH+verify must find every exact pair (verification step makes
    precision 1.0; banding with 32 hashes / 8 bands gives high recall at
    jaccard >= 0.5)."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert approx.issubset(exact)  # verified candidates can't be false
    recall = len(approx & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"LSH recall {recall} below 0.9 ({len(approx)}/{len(exact)})"


def test_simhash_fingerprint_locality(spark):
    """A 1-of-80-token edit moves the fingerprint a few bits; unrelated
    text moves it far.  (Pair search below only guarantees recall for
    hamming <= 3 via quadrant blocking.)"""
    from pyspark.sql import functions as F

    from feast_spark.operators.docdedup import hamming64, with_simhash

    words = [f"word{i}" for i in range(80)]
    base = " ".join(words)
    variant = base.replace("word40", "changed", 1)
    other = " ".join(f"thing{i}" for i in range(80))
    df = spark.createDataFrame(
        [Row(id=1, text=base), Row(id=2, text=variant), Row(id=3, text=other)]
    )
    sim = {r["id"]: r["simhash"] for r in with_simhash(df, "text").collect()}
    near = bin((sim[1] ^ sim[2]) & (2**64 - 1)).count("1")
    far = bin((sim[1] ^ sim[3]) & (2**64 - 1)).count("1")
    assert near <= 10
    assert far >= 20


def test_simhash_pairs_identical_docs(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="u v w x y z " * 10),
            Row(id=2, text="u v w x y z " * 10),
            Row(id=3, text="completely different content here " * 8),
        ]
    )
    pairs = simhash_pairs(df, "id", "text", max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got == {(1, 2): 0}


def test_lsh_candidates_include_identical(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="p q r s t u v w x y z " * 4),
            Row(id=2, text="p q r s t u v w x y z " * 4),
            Row(id=3, text="completely other content here now " * 4),
        ]
    )
    cands = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(df, "id", "text").collect()}
    assert (1, 2) in cands


def test_lsh_hot_bucket_capped_before_collect(spark):
    """A degenerate bucket (10k identical docs -> every band collides)
    must be dropped BEFORE collect_list materializes it: with the
    default finite cap the query completes without building a 10k-doc
    aggregation buffer or expanding ~50M in-bucket pairs."""
    df = spark.range(10_000).select(
        F.col("id"), F.lit("boilerplate header text").alias("text")
    )
    assert lsh_candidate_pairs(df, "id", "text").count() == 0
    # the plan must filter on the windowed bucket count upstream of the
    # collect_list aggregate (window + agg share one Exchange)
    plan = lsh_candidate_pairs(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan
    assert plan.index("Filter") < plan.index("collect_list") or "__bsz" in plan


def test_simhash_hot_bucket_capped(spark):
    df = spark.range(5_000).select(
        F.col("id"), F.lit("same same same words").alias("text")
    )
    assert simhash_pairs(df, "id", "text").count() == 0
    # cap disabled -> the pairs come back (semantics, not correctness loss)
    some = simhash_pairs(df.limit(50), "id", "text", max_bucket_size=None)
    assert some.count() == 50 * 49 // 2


def test_simhash_no_self_pairs_on_duplicate_ids(spark):
    """Duplicate doc ids with different text must never emit id==id."""
    df = spark.createDataFrame(
        [
            Row(id=1, text="alpha beta gamma delta " * 8),
            Row(id=1, text="alpha beta gamma delta epsilon " * 8),
            Row(id=2, text="alpha beta gamma delta " * 8),
        ]
    )
    pairs = simhash_pairs(df, "id", "text", max_hamming=8).collect()
    assert all(r["id_a"] != r["id_b"] for r in pairs)


def test_oph_pairs_match_kseed_fast_path(spark):
    """One-permutation hashing is a different permutation scheme, so
    signatures and candidate sets differ — but after exact-Jaccard
    verification both fast paths must resolve the SAME near-dup pairs
    on the sf0.01 corpus (precision is 1.0 by construction; this pins
    that OPH's recall matches K-seed's end-to-end)."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    kseed = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, method="kseed"
        ).collect()
    }
    oph = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, method="oph"
        ).collect()
    }
    assert kseed == oph


def test_oph_signature_shape_and_densification(spark):
    """OPH signatures: K slots, no nulls even for docs with fewer
    shingles than bins (rotation densification fills empty bins), and
    deterministic across evaluations."""
    from feast_spark.operators.docdedup import with_minhash_oph, with_shingles

    df = spark.createDataFrame(
        [
            Row(id=1, text="tiny doc"),  # 1 shingle -> 31 empty bins
            Row(id=2, text=" ".join(f"w{i}" for i in range(200))),
        ]
    )
    sh = with_shingles(df, "text", 3)
    sig = {
        r["id"]: r["minhash"]
        for r in with_minhash_oph(sh, num_hashes=32).collect()
    }
    for k, s in sig.items():
        assert len(s) == 32, k
        assert all(v is not None for v in s), k
    again = {
        r["id"]: r["minhash"]
        for r in with_minhash_oph(sh, num_hashes=32).collect()
    }
    assert sig == again


def test_oph_identical_docs_identical_signatures(spark):
    """Identical (normalized) texts must produce identical OPH
    signatures — the property banding relies on."""
    from feast_spark.operators.docdedup import with_minhash_oph, with_shingles

    df = spark.createDataFrame(
        [
            Row(id=1, text="The quick brown fox jumps over the lazy dog"),
            Row(id=2, text="the QUICK brown fox jumps over the lazy dog"),
            Row(id=3, text="an entirely different document body here"),
        ]
    )
    sig = {
        r["id"]: tuple(r["minhash"])
        for r in with_minhash_oph(with_shingles(df, "text", 3)).collect()
    }
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    """Lines repeated across >=3 docs vanish; unique content and line
    order survive; all-boilerplate docs come back empty."""
    from pyspark.sql import Row

    from feast_spark.operators.docdedup import dedup_lines, frequent_lines

    footer = "(c) 2021 ExampleCorp - all rights reserved"
    nav = "home | products | contact us today"
    docs = [
        Row(doc_id=1, text=f"{nav}\nunique alpha content here\n{footer}"),
        Row(doc_id=2, text=f"{nav}\nunique beta content here\n{footer}"),
        Row(doc_id=3, text=f"{nav}\nunique gamma content here\n{footer}"),
        Row(doc_id=4, text=f"{nav}\n{footer}"),
        Row(doc_id=5, text="entirely unique document text"),
    ]
    df = spark.createDataFrame(docs)
    freq = frequent_lines(df, min_occurrences=3).collect()
    assert len(freq) == 2  # nav + footer
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    assert out[1] == "unique alpha content here"
    assert out[2] == "unique beta content here"
    assert out[3] == "unique gamma content here"
    assert out[4] == ""  # everything was boilerplate
    assert out[5] == "entirely unique document text"


def test_dedup_lines_short_lines_exempt_and_order_kept(spark):
    from pyspark.sql import Row

    from feast_spark.operators.docdedup import dedup_lines

    # "yes" repeats everywhere but is under min_line_chars: kept
    docs = [
        Row(doc_id=i, text=f"yes\nline alpha {i}\nshared boilerplate line\nline beta {i}")
        for i in range(5)
    ]
    out = {r["doc_id"]: r["text"]
           for r in dedup_lines(spark.createDataFrame(docs)).collect()}
    for i in range(5):
        assert out[i] == f"yes\nline alpha {i}\nline beta {i}"


def test_dedup_lines_count_is_per_document(spark):
    """A line repeated many times INSIDE one doc doesn't count as
    cross-document boilerplate."""
    from pyspark.sql import Row

    from feast_spark.operators.docdedup import frequent_lines

    df = spark.createDataFrame(
        [Row(doc_id=1, text="repeated inside only\n" * 10 + "tail line here")]
    )
    assert frequent_lines(df, min_occurrences=3).count() == 0


def test_frequent_lines_approx_tracks_exact(spark):
    """The HLL approx mode finds the same boilerplate set as the exact
    path when counts are clearly above/below threshold, and its counts
    are within the documented rsd of the exact distinct-doc counts."""
    from pyspark.sql import Row

    from feast_spark.operators.docdedup import frequent_lines

    # 200 docs: a hot banner in all of them, a footer in 50, a line in
    # exactly 2 (below threshold), plus unique filler per doc
    docs = []
    for i in range(200):
        lines = [f"unique filler line number {i} padded out"]
        lines.append("ACCEPT OUR COOKIES TO CONTINUE BROWSING")
        if i < 50:
            lines.append("copyright footer all rights reserved")
        if i < 2:
            lines.append("a rare line that should not count")
        # within-doc repetition must not inflate the distinct-doc count
        lines.append("ACCEPT OUR COOKIES TO CONTINUE BROWSING")
        docs.append(Row(doc_id=i, text="\n".join(lines)))
    df = spark.createDataFrame(docs)

    exact = {r["line_hash"]: r["n_docs"]
             for r in frequent_lines(df, min_occurrences=3).collect()}
    approx = {r["line_hash"]: r["n_docs"]
              for r in frequent_lines(df, min_occurrences=3,
                                      approx=True).collect()}
    # same boilerplate set: counts here are far from the threshold
    assert set(approx) == set(exact)
    assert sorted(exact.values()) == [50, 200]
    for h, n in exact.items():
        assert abs(approx[h] - n) <= max(2, 0.15 * n), (n, approx[h])


def test_frequent_lines_approx_no_distinct_shuffle(spark):
    """Plan pin for the scale claim: the approx path has no
    (doc, line_hash) distinct aggregate — a single HLL aggregate pair
    (partial + final) replaces distinct+count, and partial_approx...
    runs map-side before the exchange."""
    from pyspark.sql import Row

    from feast_spark.operators.docdedup import frequent_lines
    from feast_spark.plans import explain_formatted

    df = spark.createDataFrame([Row(doc_id=1, text="hello world wide line")])
    exact_plan = explain_formatted(frequent_lines(df))
    approx_plan = explain_formatted(frequent_lines(df, approx=True))
    # exact needs two aggregate pairs (distinct, then count)
    assert exact_plan.count("HashAggregate") >= approx_plan.count("HashAggregate")
    # map-side sketch combine before the single exchange
    assert "partial_approx_count_distinct" in approx_plan
    # exactly one exchange node (formatted output names each node twice:
    # once in the tree, once in the details — count detail headers)
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", approx_plan, re.M)) == 1


def test_minhash_method_auto(spark):
    """method='auto' dispatches by the measured crossover (OPH iff mean
    shingles >= 4*num_hashes) and its verified pairs equal BOTH explicit
    methods' on short and long synthetic corpora (recall parity)."""
    from pyspark.sql import Row

    from feast_spark.operators.docdedup import (
        choose_minhash_method,
        minhash_dedup_pairs,
    )

    # the pure heuristic
    assert choose_minhash_method(50.0, 32) == "kseed"
    assert choose_minhash_method(127.9, 32) == "kseed"
    assert choose_minhash_method(128.0, 32) == "oph"
    assert choose_minhash_method(500.0, 32) == "oph"

    def corpus(words_per_doc):
        rows = []
        for i in range(60):
            base = [f"w{i}x{j}" for j in range(words_per_doc)]
            rows.append(Row(doc_id=2 * i, text=" ".join(base)))
            # near-dup: mutate one word in the middle
            mut = list(base)
            mut[words_per_doc // 2] = "MUT"
            rows.append(Row(doc_id=2 * i + 1, text=" ".join(mut)))
        return spark.createDataFrame(rows)

    for words in (30, 200):  # short -> kseed arm, long -> oph arm
        docs = corpus(words)
        got = {
            m: sorted(
                (r["id_a"], r["id_b"])
                for r in minhash_dedup_pairs(
                    docs, "doc_id", "text", threshold=0.5, method=m
                ).collect()
            )
            for m in ("auto", "kseed", "oph")
        }
        assert got["auto"] == got["kseed"] == got["oph"], words
        assert len(got["auto"]) >= 50, (words, len(got["auto"]))


def test_widen_parallelism_respects_byte_size(spark, tmp_path):
    """The r16 byte-size guard: few files does NOT imply few splits.
    When the scan's total bytes already yield >= target byte-range
    splits (the 10 x 10 GB case at cluster scale), repartitioning
    would shuffle the whole corpus for nothing — widen must no-op.
    A genuinely small scan still widens."""
    from feast_spark.operators.docdedup import widen_parallelism

    p = str(tmp_path / "docs.parquet")
    spark.range(2000).selectExpr(
        "id as doc_id", "repeat('word ', 50) as text"
    ).coalesce(1).write.parquet(p)

    def is_widened(df):
        return "RoundRobinPartitioning" in (
            df._jdf.queryExecution().executedPlan().toString()
        )

    df = spark.read.parquet(p)
    # small scan, default 128MB splits: one split, far under target
    assert is_widened(widen_parallelism(df, min_partitions=8))

    # shrink maxPartitionBytes so byte-range splitting alone reaches
    # the target on the very same file -> widen must back off
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        df2 = spark.read.parquet(p)
        assert not is_widened(widen_parallelism(df2, min_partitions=8))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
