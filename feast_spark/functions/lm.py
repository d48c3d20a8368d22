"""Character n-gram language model for perplexity-style quality
filtering — the train-on-clean-corpus / score-every-document step of a
pre-training pipeline (CCNet-style filtering, with a char-level model
instead of KenLM so it is fully self-contained and engine-portable).

Train = one aggregation: count char n-grams over normalized text, keep
the top-V by (count desc, ngram asc) — a deterministic vocabulary —
and attach log-probabilities against the FULL observed total (kept
n-grams carry their true mass; everything outside the vocabulary
shares a half-count floor).  Score = mean log-probability of a
document's n-grams under that table; lower (more negative) means less
like the training corpus — the filtering signal.

Scale design:

* Counting is `explode → groupBy(ngram).count()` — map-side partial
  combine absorbs the per-document fan-out, and the n-gram space is
  charset-bounded (not corpus-bounded), so the shuffle is small and
  fixed regardless of corpus size.
* The model is top-V rows (default 10k) — always broadcastable; the
  scoring join is a broadcast hash join, so the corpus side never
  shuffles to be scored.
* N-gram extraction is a codegen `transform(sequence(...), substr)` —
  no Python, no UDFs, anywhere.

Everything is deterministic: ties in the vocabulary cut break on the
n-gram string, and all arithmetic is double-precision ln, reproducible
in DuckDB (pytest differential).

The reference has no counterpart (Feast computes no text features);
this extends the training-data pipeline per SURVEY §7 phase 5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_ngrams", "train_char_lm", "score_char_lm"]


def char_ngrams(text: Column, n: int = 3) -> Column:
    """All overlapping character n-grams of the normalized text
    (functions.text.normalize_text — the same canonical form the
    dedup fingerprints use), in order; empty array when shorter than
    n."""
    from feast_spark.functions.text import normalize_text

    t = normalize_text(text)
    # substr() inside transform takes a column position (F.substring
    # does not), so build the expression over a self-contained lambda.
    # NB: sequence(1, 0) counts DOWN in Spark — guard short strings.
    return F.when(
        F.length(t) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def train_char_lm(
    df: DataFrame,
    text_col: str,
    n: int = 3,
    vocab_size: int = 10_000,
) -> DataFrame:
    """Count char n-grams over the corpus and return the model table
    ``(ngram, logp)``: the top ``vocab_size`` n-grams by
    (count desc, ngram asc) with ``logp = ln(count / total)`` where
    ``total`` counts ALL observed n-grams (in and out of vocabulary).

    The result is `vocab_size` rows — collect/broadcast freely.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    from feast_spark.functions.text import explode_computed

    grams = explode_computed(df, [], char_ngrams(F.col(text_col), n), "ngram")
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    # tiny two-row frame: total mass over every observed n-gram
    total = counts.agg(F.sum("cnt").alias("total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(vocab_size)
    )
    return top.crossJoin(F.broadcast(total)).select(
        "ngram",
        F.log(F.col("cnt").cast("double") / F.col("total")).alias("logp"),
        (F.log(F.lit(0.5)) - F.log(F.col("total").cast("double"))).alias(
            "__oov_logp"
        ),
    )


def score_char_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    n: int = 3,
    out_col: str = "lm_logprob",
) -> DataFrame:
    """Mean log-probability of each document's char n-grams under the
    model (out-of-vocabulary n-grams take the model's floor).
    Documents with no n-grams (shorter than n after normalization)
    score NULL.  Higher = more like the training corpus.

    The model is broadcast and the per-doc mean is ONE aggregation:
    `explode_outer` keeps empty documents in the stream (NULL n-gram
    rows), so no corpus-vs-scores join-back — the only shuffle is the
    groupBy on the document id (plan-pinned)."""
    grams = df.select(
        F.col(id_col),
        F.explode_outer(char_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    # one-row floor constant, broadcast-nested-loop-joined onto the agg
    model_floor = model.select(F.max("__oov_logp").alias("__floor"))
    agg = (
        grams.join(F.broadcast(model.select("ngram", "logp")), "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("logp")).alias("__in_sum"),
            F.count(F.col("ngram")).alias("__n"),
            F.count(F.col("logp")).alias("__in_n"),
        )
    )
    mean = (
        F.coalesce(F.col("__in_sum"), F.lit(0.0))
        + (F.col("__n") - F.col("__in_n")) * F.col("__floor")
    ) / F.col("__n")
    return agg.crossJoin(F.broadcast(model_floor)).select(
        F.col(id_col),
        F.when(F.col("__n") > 0, mean).alias(out_col),
    )
