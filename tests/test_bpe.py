"""Real BPE tokenizer: deterministic training, exact decode roundtrip,
distributed/driver training equivalence, and plan shape (encode is a
narrow map, training shuffles once)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.functions.bpe import (
    bpe_token_count,
    decode_tokens,
    encode_bpe,
    model_from_rows,
    train_bpe,
    train_bpe_from_counts,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "the dog and the fox are friends now",
    "quick quick quick the fox said",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [Row(id=i, text=t) for i, t in enumerate(CORPUS)]
    )


@pytest.fixture(scope="module")
def model(corpus_df):
    return train_bpe(corpus_df, "text", num_merges=50)


def test_training_learns_frequent_words(model):
    """' the' repeats 8x — its characters must merge into one token."""
    assert " the" in model.vocab or "the" in model.vocab
    products = {a + b for a, b in model.merges}
    assert any("the" in p for p in products)


def test_training_is_deterministic(corpus_df):
    m1 = train_bpe(corpus_df, "text", num_merges=30)
    m2 = train_bpe(corpus_df, "text", num_merges=30)
    assert m1.merges == m2.merges
    assert m1.vocab == m2.vocab


def test_driver_training_matches_distributed_counts(corpus_df, model):
    """train_bpe == train_bpe_from_counts over the same word-frequency
    table: the distributed part contributes ONLY counts."""
    from feast_spark.functions.text import bpe_ish_tokens

    rows = (
        corpus_df.select(F.explode(bpe_ish_tokens(F.col("text"))).alias("w"))
        .where(F.trim("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    local = train_bpe_from_counts(
        {r["w"]: r["count"] for r in rows}, num_merges=50
    )
    assert local.merges == model.merges


def test_encode_decode_roundtrip_exact(corpus_df, model):
    out = encode_bpe(corpus_df, "text", model).collect()
    by_id = {r["id"]: r for r in out}
    for i, text in enumerate(CORPUS):
        assert decode_tokens(by_id[i]["tokens"]) == text
        # every token the model trained on resolves to a real id
        assert len(by_id[i]["token_ids"]) == len(by_id[i]["tokens"])
        assert all(t >= 0 for t in by_id[i]["token_ids"])


def test_encode_compresses_vs_chars(corpus_df, model):
    out = encode_bpe(corpus_df, "text", model).collect()
    for r in out:
        text = CORPUS[r["id"]]
        assert len(r["tokens"]) < len(text)  # merges actually applied


def test_unknown_chars_get_minus_one(spark, model):
    df = spark.createDataFrame([Row(id=1, text="héllo ∑ world")])
    r = encode_bpe(df, "text", model).collect()[0]
    assert decode_tokens(r["tokens"]) == "héllo ∑ world"  # still lossless
    assert -1 in r["token_ids"]  # chars the model never saw


def test_token_count_and_proxy_direction(corpus_df, model):
    """Real counts <= pre-token-proxy char totals, > whitespace count."""
    out = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(corpus_df, "text", model).collect()
    }
    for i, text in enumerate(CORPUS):
        assert 0 < out[i] < len(text)


def test_model_rows_roundtrip(model):
    rebuilt = model_from_rows(model.to_rows())
    assert rebuilt.merges == model.merges
    # vocab ids for merge products agree (char seeding may differ for
    # never-merged chars, which to_rows doesn't carry)
    for a, b in model.merges:
        assert a + b in rebuilt.vocab


def test_encode_plan_is_narrow(corpus_df, model):
    """Encoding shuffles nothing: no Exchange in the plan."""
    from feast_spark.plans import count_exchanges, explain_formatted

    plan = explain_formatted(encode_bpe(corpus_df, "text", model))
    assert count_exchanges(plan) == 0


def test_training_plan_single_shuffle(corpus_df):
    """The corpus-side work is one partial-aggregated count: exactly
    one Exchange before the TakeOrdered boundary."""
    from feast_spark.functions.text import bpe_ish_tokens
    from feast_spark.plans import explain_formatted

    counts = (
        corpus_df.select(F.explode(bpe_ish_tokens(F.col("text"))).alias("w"))
        .where(F.trim("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(10)
    )
    plan = explain_formatted(counts)
    assert "HashAggregate" in plan
    assert "TakeOrderedAndProject" in plan  # never a full sort


def test_model_save_load_roundtrip(model, tmp_path, corpus_df):
    from feast_spark.functions.bpe import load_model, save_model

    path = str(tmp_path / "bpe.json")
    save_model(model, path)
    loaded = load_model(path)
    assert loaded.merges == model.merges
    assert loaded.vocab == model.vocab
    a = encode_bpe(corpus_df, "text", model).collect()
    b = encode_bpe(corpus_df, "text", loaded).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
