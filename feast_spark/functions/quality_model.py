"""Learned quality classifier — the model-based stage of corpus
curation (the role a FastText/linear quality classifier plays in the
usual pre-training stack), as a Spark MLlib pipeline over the
package's own heuristic features.

Bootstrapping is weak supervision: the heuristic ``quality_score``
ranks the corpus, the top/bottom quantiles become positive/negative
labels, and a logistic regression learns to generalize from the full
feature vector (token stats, stopword/punct ratios, distinctness —
signals the single-number heuristic collapses).  Scoring then gives a
calibrated [0, 1] probability per document, which composes with the
rest of the pipeline as an ordinary column.

Scale: training aggregates feature vectors via MLlib's distributed
LBFGS (treeAggregate — no driver-side data); scoring is a pure
projection through the fitted pipeline, no shuffle.  Labels come from
exact quantile bounds computed with ``percentile`` (deterministic),
so the label set is reproducible; LBFGS convergence is deterministic
up to float reduction order.

Reference has no counterpart; BASELINE.json's north star names
"Spark DataFrames + MLlib pipelines" as the target shape — this is
the MLlib pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.functions.text import with_quality_features

__all__ = ["QUALITY_FEATURES", "train_quality_classifier", "score_quality"]

# column names as with_quality_features emits them (n_chars_q avoids
# clashing with a source table's own n_chars column)
QUALITY_FEATURES = [
    "n_chars_q",
    "n_tokens",
    "mean_token_len",
    "stopword_ratio",
    "punct_ratio",
    "distinct_ratio",
]


def _featurize(df: DataFrame, text_col: str) -> DataFrame:
    out = with_quality_features(df, text_col)
    # MLlib wants doubles
    for c in QUALITY_FEATURES:
        out = out.withColumn(c, F.col(c).cast("double"))
    return out


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_frac: float = 0.25,
    seed: int = 42,
):
    """Fit the weak-label quality pipeline and return the fitted
    MLlib PipelineModel.  The top ``label_frac`` of rows by heuristic
    ``quality_score`` become label 1, the bottom ``label_frac`` label
    0; the middle band is excluded from training (uncertain)."""
    if not 0 < label_frac <= 0.5:
        raise ValueError(f"label_frac must be in (0, 0.5], got {label_frac}")
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feat = _featurize(df, text_col)
    bounds = feat.select(
        F.percentile(F.col("quality_score"), F.lit(label_frac)).alias("lo"),
        F.percentile(F.col("quality_score"), F.lit(1.0 - label_frac)).alias(
            "hi"
        ),
    ).first()
    labeled = feat.withColumn(
        "label",
        F.when(F.col("quality_score") >= bounds["hi"], F.lit(1.0)).when(
            F.col("quality_score") <= bounds["lo"], F.lit(0.0)
        ),
    ).filter(F.col("label").isNotNull())
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=QUALITY_FEATURES, outputCol="__features"
            ),
            LogisticRegression(
                featuresCol="__features",
                labelCol="label",
                maxIter=50,
                regParam=0.01,
                standardization=True,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str,
    out_col: str = "quality_prob",
) -> DataFrame:
    """P(high quality) per document under the fitted pipeline —
    input columns + ``out_col``, everything else dropped.

    Scoring recomputes the quality features under their canonical
    names (the fitted VectorAssembler is bound to them), so caller
    columns that happen to share a feature name (``n_tokens``,
    ``quality_score``, ...) are first moved to temp names and restored
    on output — the caller's values come back untouched instead of
    being silently replaced by the recomputed ones."""
    from pyspark.ml.functions import vector_to_array

    reserved = set(QUALITY_FEATURES) | {
        "n_chars_q",
        "quality_score",
        "probability",
        "prediction",
        "rawPrediction",
        "__features",
    }
    if text_col in reserved:
        raise ValueError(
            f"text_col {text_col!r} collides with a quality feature name; "
            "rename the text column before scoring"
        )
    renames = {c: f"__orig_{c}" for c in df.columns if c in reserved}
    work = df.withColumnsRenamed(renames) if renames else df
    scored = model.transform(_featurize(work, text_col))
    prob = vector_to_array(F.col("probability")).getItem(1)
    keep = [F.col(renames.get(c, c)).alias(c) for c in df.columns]
    return scored.select(*keep, prob.alias(out_col))
