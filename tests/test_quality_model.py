"""Weak-label quality classifier (MLlib pipeline): separates its own
weak labels, orders obvious good/junk probes correctly, and scores
as a pure projection."""

import pytest
from pyspark.sql import functions as F

from feast_spark.functions.quality_model import (
    score_quality,
    train_quality_classifier,
)
from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def model_and_docs(spark):
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    model = train_quality_classifier(docs, "text")
    return model, docs


def test_separates_weak_labels(spark, model_and_docs):
    """The learned probability must track the heuristic ranking it was
    bootstrapped from: mean P(good) of the top quartile far above the
    bottom quartile."""
    model, docs = model_and_docs
    from feast_spark.functions.text import with_quality_features

    scored = score_quality(docs, model, "text")
    heur = with_quality_features(docs, "text").select(
        "doc_id", "quality_score"
    )
    joined = scored.join(heur, "doc_id")
    lo, hi = joined.select(
        F.percentile("quality_score", F.lit(0.25)),
        F.percentile("quality_score", F.lit(0.75)),
    ).first()
    means = joined.select(
        F.avg(F.when(F.col("quality_score") >= hi, F.col("quality_prob"))).alias("top"),
        F.avg(F.when(F.col("quality_score") <= lo, F.col("quality_prob"))).alias("bot"),
    ).first()
    assert means["top"] > 0.8
    assert means["bot"] < 0.2
    assert means["top"] - means["bot"] > 0.5


def test_probe_ordering_and_bounds(spark, model_and_docs):
    model, _ = model_and_docs
    probes = spark.createDataFrame(
        [
            (1, "The committee reviewed the proposal and found that it "
                "addressed the key concerns raised in the previous meeting "
                "of the board, with a clear plan for the next quarter."),
            (2, "buy buy buy !!! $$$ click click http spam spam spam "
                "!!! $$$ buy now !!!"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.quality_prob for r in
           score_quality(probes, model, "text").collect()}
    assert 0.0 <= out[1] <= 1.0 and 0.0 <= out[2] <= 1.0
    assert out[1] > out[2]


def test_scoring_is_projection_no_shuffle(spark, model_and_docs):
    model, docs = model_and_docs
    from feast_spark.plans import count_exchanges, explain_formatted

    plan = explain_formatted(score_quality(docs, model, "text"))
    assert count_exchanges(plan) == 0, plan


def test_validation(spark, model_and_docs):
    _, docs = model_and_docs
    with pytest.raises(ValueError):
        train_quality_classifier(docs, "text", label_frac=0.9)


def test_scoring_preserves_caller_feature_named_columns(spark, model_and_docs):
    """A caller column that happens to share a quality-feature name
    must come back with the CALLER's values, not the recomputed
    features the model scored on."""
    model, docs = model_and_docs
    from feast_spark.functions.quality_model import score_quality

    tagged = docs.withColumn("n_tokens", F.lit(-777).cast("long")) \
                 .withColumn("quality_score", F.lit(-1.5))
    out = score_quality(tagged, model, "text")
    rows = out.collect()
    assert set(out.columns) == set(tagged.columns) | {"quality_prob"}
    assert all(r["n_tokens"] == -777 for r in rows)
    assert all(r["quality_score"] == -1.5 for r in rows)
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_scoring_rejects_feature_named_text_col(spark, model_and_docs):
    model, docs = model_and_docs
    import pytest
    from feast_spark.functions.quality_model import score_quality

    renamed = docs.withColumnRenamed("text", "n_tokens")
    with pytest.raises(ValueError, match="collides"):
        score_quality(renamed, model, "n_tokens")
