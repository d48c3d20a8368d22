"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection
via Importance Resampling", NeurIPS) — select raw-corpus documents
whose hashed n-gram distribution matches a target corpus.

The public method: featurize documents into a hashed bag of word
n-grams (the paper uses unigrams + bigrams; ``n_max`` here), fit
bucket distributions p_target / p_raw over the SAME hashed feature
space, score every raw document with its log importance weight

    log w(x) = sum_b  c_x[b] * (log p_target[b] - log p_raw[b])

and resample by Gumbel top-k, so the kept subset is approximately
distributed like the target while drawn from the raw pool.  This is
the distribution-MATCHING selector next to the budget-based
``operators/packing.mixture_by_source`` (which allocates token budgets
by source, not by content).

Spark shape (the 100 TB arguments):

* Featurization follows the ``docdedup.with_shingles`` discipline: the
  token array is materialized in its OWN projection (inlining it into
  the per-ngram lambda re-runs the tokenizer per ngram — the measured
  15x trap), n-grams hash to a 32-bit md5 bucket (engine-portable —
  the DuckDB twin in tests replays every weight bit-for-bit up to
  float summation order), and counts aggregate with map-side combine:
  the shuffle carries at most ``n_buckets`` rows per distribution and
  one row per (doc, distinct bucket) for the per-doc weights.
* The log-ratio table is ``n_buckets`` rows (default 8192, ~a few
  hundred KB) broadcast into the per-doc join — no shuffle of the
  corpus by bucket.
* Resampling is stateless Gumbel top-k keyed on md5(seed || id) (the
  ``functions/split.py`` discipline): deterministic, engine-portable,
  no driver-side sampling state; the global top-k is a
  TakeOrderedAndProject, never a full sort.

Smoothing: add-``smoothing`` on BOTH distributions over the same
``n_buckets`` domain keeps every log-ratio finite (a bucket seen only
in the target contributes a large-but-finite positive weight instead
of +inf).

Reference parity: Feast has no data-selection operators; this is a
training-data-pipeline extension (SURVEY §2.6) built from the public
paper only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ngram_bucket_histogram",
    "dsir_log_weights",
    "dsir_resample",
]


def _h32(s: Column) -> Column:
    """First 32 md5 bits as a long — the repo's engine-portable hash
    idiom (functions/split.hash_bucket)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _kgrams_sql(toks: str, k: int, n_buckets: int) -> str:
    """SQL text of the hashed k-gram buckets at one size (``toks`` =
    SQL expression text of the token array column)."""
    return (
        f"transform(sequence(0, size({toks}) - {k}), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', "
        f"slice({toks}, i + 1, {k}))), 1, 8), 16, 10) as bigint) "
        f"% {n_buckets})"
    )


def _bucket_array(toks: str, n_max: int, n_buckets: int) -> Column:
    """array<long> of hashed n-gram buckets (sizes 1..n_max, every
    OCCURRENCE kept — bag semantics, not a set).  ``toks`` is the NAME
    of a materialized token-array column, never an inline tokenizer
    expression: higher-order-function lambdas are interpreted, so an
    inline expression would re-tokenize once per n-gram (the
    with_shingles / substr_dedup O(len²) trap).  Assembled as ONE
    ``F.expr`` string — the per-k-gram Column DSL was hundreds of py4j
    round trips per call (see functions/text SQL-snippet note)."""
    from feast_spark.functions.text import sql_ident

    t = sql_ident(toks)
    parts = []
    for k in range(1, n_max + 1):
        # fewer than k tokens -> no k-grams (the sequence would wrap)
        parts.append(
            f"CASE WHEN size({t}) >= {k} THEN {_kgrams_sql(t, k, n_buckets)} "
            "ELSE cast(array() as array<bigint>) END"
        )
    out = parts[0]
    for p in parts[1:]:
        out = f"concat({out}, {p})"
    return F.expr(out)


def _exploded_buckets(
    df: DataFrame,
    cols: list[str],
    text_col: str,
    n_max: int,
    n_buckets: int,
    keep_featureless: bool = False,
) -> DataFrame:
    """One row per n-gram occurrence: (*cols, bucket).  Tokens
    materialize in their own projection (see :func:`_bucket_array`).
    Featurization is CPU-bound (one md5 per n-gram), so the scan is
    widened to the session parallelism when the input has fewer files
    than cores (the ``docdedup.widen_parallelism`` discipline — a no-op
    at 100 TB where splits already outnumber cores).

    ``keep_featureless=True`` keeps ONE ``bucket IS NULL`` row per
    featureless (blank-text) document — ``explode_outer`` emits exactly
    one null-element row for an empty array, and bucket arrays never
    contain null ELEMENTS (md5/concat outputs), so null bucket ⇔
    featureless doc.  That keeps every input id in the per-doc frame
    without a second corpus scan (see :func:`dsir_log_weights`)."""
    from feast_spark.operators.docdedup import widen_parallelism

    from feast_spark.functions.text import (
        explode_computed, normalize_text_sql, sql_ident, tokens_sql,
    )

    feat = widen_parallelism(df).select(
        *cols,
        F.expr(
            tokens_sql(normalize_text_sql(sql_ident(text_col)))
        ).alias("__toks"),
    )
    arr = _bucket_array("__toks", n_max, n_buckets)
    if keep_featureless:
        # explode_outer is already exempt from InferFiltersFromGenerate
        # (the explode_computed rationale); omitting the isNotNull
        # filter keeps the one null row per empty array.
        return feat.select(*cols, F.explode_outer(arr).alias("bucket"))
    return explode_computed(
        feat,
        cols,
        arr,
        "bucket",
    )


def ngram_bucket_histogram(
    df: DataFrame,
    text_col: str = "text",
    n_max: int = 2,
    n_buckets: int = 8192,
) -> DataFrame:
    """(bucket, cnt) — corpus-level hashed-ngram histogram: one
    tokenize pass, map-side combined aggregate, <= n_buckets output
    rows whatever the corpus size."""
    return (
        _exploded_buckets(df, [], text_col, n_max, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """(id, log_weight) for every raw document: the summed log ratio of
    smoothed target/raw bucket probabilities over the document's
    hashed-ngram bag.  Documents with no features (blank text) weigh
    0.0 — indifferent, not excluded.

    Cost: ONE tokenize pass over each corpus — the raw histogram is
    derived from the per-doc bucket counts (same aggregate subtree, so
    Spark reuses the exchange instead of re-scanning raw), the target
    histogram is its own pass, the n_buckets-row log-ratio table
    broadcasts into the per-doc join, one groupBy(id).  Nothing scales
    with corpus size except the linear passes.  Featureless documents
    ride the SAME pass: the explode keeps one null-bucket row per
    blank doc, so every raw id reaches the weights aggregate without
    the former third corpus scan + id join (their null log_ratio rows
    sum to NULL and coalesce to 0.0 exactly as the old left join did).
    One id each — a raw frame with duplicate ids yields one weight row
    per distinct id (they are indistinguishable feature-wise anyway),
    and NULL-id rows are dropped from the output (they could never be
    selected downstream anyway: semi-joins never match null keys).

    An EMPTY (or all-blank) target fails loudly in-plan
    (``raise_error``, the packing guard discipline): with no target
    features every ratio would be NULL and every weight would coalesce
    to 0.0 — 'distribution-matched' output that is actually a uniform
    hash sample, which must never ship silently."""
    if smoothing <= 0:
        # log(0) is NULL in Spark and F.sum SKIPS NULLs: one-sided
        # buckets would silently drop out of every document's sum
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    from feast_spark.operators.docdedup import _persist

    # ONE corpus exchange for the whole per-doc side: hash-partitioning
    # on the id alone satisfies the (id, bucket) count's clustering
    # requirement (subset partitioning) AND the per-doc weight
    # aggregation downstream, so the former second corpus-sized
    # exchange (groupBy(id) after the ratio join) disappears — the
    # weights aggregate reuses this partitioning.
    #
    # The counts frame is PERSISTED: it feeds both the raw histogram
    # (hr -> ratios) and the per-doc weights, and exchange reuse does
    # NOT materialize across AQE's independently-planned subqueries —
    # measured r16, the un-persisted plan held 15 Exchanges and ZERO
    # ReusedExchange, re-running the tokenize+hash pass (and its widen
    # exchange) three times.  (id, bucket, cnt) is the smallest
    # corpus-sized frame in the pipeline (distinct buckets per doc),
    # MEMORY_AND_DISK spills, and eviction is LRU — the docdedup
    # candidate-persist discipline.
    doc = _persist(
        _exploded_buckets(
            raw, [id_col], text_col, n_max, n_buckets,
            keep_featureless=True,
        )
        .repartition(F.col(id_col))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ht = ngram_bucket_histogram(target, text_col, n_max, n_buckets)
    # null bucket = featureless doc marker rows; they carry no n-grams
    hr = (
        doc.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    s = float(smoothing)
    b = float(n_buckets)
    # Corpus totals as ONE unbounded window over the joined histogram
    # instead of two scalar-aggregate subqueries.  The former tt/tr
    # cross-join subqueries were planned independently by AQE (no
    # exchange reuse across subqueries), so tt re-ran the WHOLE target
    # tokenize+histogram pass a second time and tr re-aggregated the
    # persisted counts — two extra serial jobs per call, one of them
    # corpus-sized.  Equivalence: bucket is unique on both join sides
    # (each is a groupBy(bucket) output), so summing ct/cr over the
    # full-outer join equals summing each histogram directly; the
    # single-partition window is bounded by 2*n_buckets rows, a
    # structural constant.  The empty-target guard is unchanged: any
    # raw feature produces a row whose __tt is NULL iff the target had
    # no features, which raises exactly where the old scalar tt did.
    joined = hr.withColumnRenamed("cnt", "cr").join(
        ht.withColumnRenamed("cnt", "ct"), "bucket", "full_outer"
    )
    wall = Window.partitionBy()
    tt_col = F.when(
        F.sum("ct").over(wall).isNull(),
        F.raise_error(
            "dsir: target corpus has no n-gram features (empty or "
            "all-blank texts) — weights would silently degrade to "
            "a uniform sample"
        ).cast("double"),
    ).otherwise(F.sum("ct").over(wall).cast("double"))
    tr_col = F.coalesce(F.sum("cr").over(wall), F.lit(0)).cast("double")
    ratios = joined.select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + s) / (tt_col + s * b)
            )
            - F.log(
                (F.coalesce(F.col("cr"), F.lit(0)) + s) / (tr_col + s * b)
            )
        ).alias("log_ratio"),
    )
    # LEFT join: featured buckets always match (ratios covers every hr
    # bucket by construction, so left == inner for them, same probe
    # order, bit-identical per-doc float sums); the null-bucket marker
    # rows survive with a null log_ratio, F.sum skips them, and the
    # coalesce lands the featureless docs on exactly the 0.0 the old
    # raw-ids left join produced — one corpus scan and one id exchange
    # cheaper (guide §2.2/§5: don't rescan what the plan already holds).
    # NULL ids are dropped rather than collapsed: groupBy would merge
    # every NULL-id row into one pseudo-doc whose combined weight could
    # outrank real docs (and then vanish in any downstream semi-join on
    # the id — null keys never match).
    return (
        doc.filter(F.col(id_col).isNotNull())
        .join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(
                F.sum(F.col("cnt") * F.col("log_ratio")), F.lit(0.0)
            ).alias("log_weight")
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
    seed: str = "",
) -> DataFrame:
    """``n_docs`` raw documents resampled toward the target
    distribution: Gumbel top-k over the log weights — the LOG-SPACE
    form of ``packing.weighted_sample``'s A-ES key (argmax of
    log w + Gumbel(u) selects the same set as argmin of -ln(u)/w for
    the same u, but survives |log w| > 709 where exp() would
    overflow on long documents).  Stateless and deterministic per
    ``seed``: the noise comes from the SAME ``packing._uniform01``
    md5(seed || id) draw weighted_sample uses, so the two samplers
    share one randomness discipline.  All raw columns pass through."""
    if n_docs <= 0:
        raise ValueError(f"n_docs must be positive, got {n_docs}")
    from feast_spark.operators.packing import _uniform01

    w = dsir_log_weights(
        raw, target, id_col, text_col, n_max, n_buckets, smoothing
    )
    # _uniform01 draws in (0, 1]; at u == 1.0 (an md5 draw of exactly
    # 2^32-1, probability 2^-32 per doc) ln(u) is 0.0 and -ln(0.0) is
    # NULL (Spark ln returns NULL out of domain, even under ANSI), so
    # the key would be NULL, sort LAST, and the doc could never be
    # selected regardless of its weight — at multi-billion-doc scale a
    # few docs per corpus hit this.  Clamp into the open interval;
    # 1 - 2^-33 is exact in a double and keeps the draw uniform to
    # within one half-ulp of the lattice.
    u = F.least(
        _uniform01(F.col(id_col), seed), F.lit(1.0 - 2.0**-33)
    )
    gumbel = -F.log(-F.log(u))
    keyed = w.withColumn("__key", F.col("log_weight") + gumbel)
    top = (
        keyed.orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(n_docs)
        .select(id_col)
    )
    return raw.join(top, id_col, "leftsemi")
