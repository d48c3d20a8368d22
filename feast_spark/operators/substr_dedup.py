"""Exact-substring deduplication (the ExactSubstr pass of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"),
distributed via winnowing fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm).  Both methods are public; the
reference repo has no counterpart.

Lee et al. remove every substring duplicated verbatim across the
corpus (they used a single-machine suffix array — unusable at 100
TB).  Winnowing is the distributable formulation: hash every char
k-gram of a document, slide a window of ``w`` consecutive hashes,
select the minimum per window.  The selection is a pure function of
local content, so **any substring of length >= k + w - 1 duplicated
verbatim selects at least one identical (fingerprint) in every
occurrence** — the detection guarantee — while only ~2/(w+1) of
positions are selected (the storage/shuffle density knob).

Spark shape:

* Fingerprinting is ONE narrow projection per document —
  `transform(sequence(...), i -> xxhash64(substr(i, k)))` then a
  windowed `array_min` scan, all inside whole-stage codegen; no
  Python, no shuffle, O(len * w) cheap long ops per doc.
* Duplicate detection: `groupBy(fp).count_distinct(doc)` — map-side
  partial combine, shuffle O(selected fingerprints) = O(corpus chars
  * 2/(w+1)), NOT O(corpus chars).
* Span removal: hits shuffle once by doc id; span merge + cut are
  `aggregate` folds over the per-doc span array — still no Python.

Boundary honesty: occurrences of a duplicated run lose the characters
covered by their SHARED selected fingerprints (expanded to the k-gram
width).  Near the run's edges, up to ~k + w - 2 characters of the
duplicated text can survive (no shared fingerprint selected there),
and the cut never removes text outside the duplicated run.  This is
the standard fidelity trade-off of fingerprint-grid dedup; the
suffix-array method cuts exact boundaries but does not distribute.

Case/whitespace are significant (exact means exact) — normalize
upstream if you want case-insensitive semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_substring_fingerprints",
    "duplicate_substring_stats",
    "strip_duplicate_substrings",
]


def _kgram_hashes(text: Column, k: int, portable: bool = False) -> Column:
    """array<long> of char k-gram hashes (one per position; a doc
    shorter than k hashes its whole text once).

    ``portable`` swaps xxhash64 for the md5-prefix 32-bit hash every
    other portable mode uses — bit-identical in any engine with md5,
    so a DuckDB oracle can replay the whole selection
    (tests/test_substr_dedup.py's differential test and the driver
    gate's substr_dedup oracle)."""
    if portable:
        def _h(c):
            return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    else:
        _h = F.xxhash64
    n = F.length(text)
    return F.when(
        n < k, F.array(_h(text))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: _h(text.substr(i + 1, F.lit(k))),
        )
    )


def _winnow(hashes: Column, w: int) -> Column:
    """array<struct<pos:int, fp:long>> of winnowing-selected
    fingerprints over a MATERIALIZED hash-array column (pos is
    0-based; ties pick the leftmost min — any deterministic rule
    preserves the identical-content guarantee).

    ``hashes`` must be a column reference, not an inline expression:
    higher-order-function lambdas are evaluated interpreted, outside
    whole-stage codegen's subexpression elimination, so an inlined
    hash expression would be RE-HASHED once per window reference —
    O(len * w * len) k-gram hashes per document instead of O(len).
    Each window folds its slice exactly once (min + leftmost argmin
    in one ``aggregate`` pass), keeping the whole selection at
    O(len * w) cheap long ops per document."""
    m = F.size(hashes)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(m - w, F.lit(0))),
            lambda j: F.aggregate(
                F.slice(hashes, j + 1, w),
                F.struct(
                    F.lit(None).cast("long").alias("fp"),
                    F.lit(-1).alias("rel"),
                    F.lit(0).alias("i"),
                ),
                lambda acc, x: F.struct(
                    F.when(acc["rel"] < 0, x)
                    .when(x < acc["fp"], x)
                    .otherwise(acc["fp"])
                    .alias("fp"),
                    F.when(acc["rel"] < 0, acc["i"])
                    .when(x < acc["fp"], acc["i"])
                    .otherwise(acc["rel"])
                    .alias("rel"),
                    (acc["i"] + F.lit(1)).alias("i"),
                ),
                lambda acc: F.struct(
                    (j + acc["rel"]).cast("int").alias("pos"),
                    acc["fp"].alias("fp"),
                ),
            ),
        )
    )


def with_substring_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    window: int = 30,
    portable: bool = False,
) -> DataFrame:
    """(id, pos, fp) rows of winnowing-selected fingerprints — the
    shared substrate of detection and removal.  Docs shorter than k
    chars contribute their whole text as one fingerprint at pos 0
    (exact-match-only semantics for tiny docs, like the shingle
    guard).  The k-gram hash array is materialized as its own column
    before the window scan — see ``_winnow`` for why inlining it is
    quadratic.

    The k-gram + winnow scan is CPU-bound (O(len * w) per doc), so a
    small-file scan is widened to the session parallelism first (the
    ``docdedup.widen_parallelism`` discipline — a no-op whenever the
    input already has >= cores files, i.e. always at real scale)."""
    from feast_spark.operators.docdedup import widen_parallelism

    from feast_spark.functions.text import explode_computed

    hashed = widen_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        _kgram_hashes(F.col(text_col), k, portable).alias("__hs"),
    )
    # explode_computed: InferFiltersFromGenerate would otherwise inline
    # the whole winnow scan into an inferred size() > 0 filter and
    # predicate pushdown would run it a second time below the exchange
    return explode_computed(
        hashed, [F.col(id_col)], _winnow(F.col("__hs"), window), "__s"
    ).select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"))


def _dup_fps(fps: DataFrame, id_col: str, min_dup_docs: int) -> DataFrame:
    return (
        fps.groupBy("fp")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_dup_docs)
        .select("fp")
    )


def duplicate_substring_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    window: int = 30,
    min_dup_docs: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Per-doc duplication profile: ``n_fps`` selected fingerprints,
    ``n_dup_fps`` of them shared with >= min_dup_docs - 1 other docs,
    and ``dup_frac`` — the filter-mode signal ('drop docs that are
    mostly duplicated text' without editing any document).
    ``portable`` swaps the fingerprint hash for the md5-prefix form so
    an external SQL engine can replay the whole profile (the driver
    hash gate's oracle does; xxhash64 default for production — faster,
    same selection guarantees)."""
    fps = with_substring_fingerprints(
        df, id_col, text_col, k, window, portable
    )
    dup = _dup_fps(fps, id_col, min_dup_docs)
    marked = fps.join(dup.withColumn("__d", F.lit(1)), "fp", "left")
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.sum(F.coalesce(F.col("__d"), F.lit(0))).alias("n_dup_fps"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .fillna({"n_fps": 0, "n_dup_fps": 0})
        .withColumn(
            "dup_frac",
            F.when(F.col("n_fps") > 0, F.col("n_dup_fps") / F.col("n_fps"))
            .otherwise(F.lit(0.0)),
        )
    )


def strip_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    window: int = 30,
    min_dup_docs: int = 2,
    out_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Remove cross-document duplicated runs from every document
    (ExactSubstr cut mode): characters covered by fingerprints shared
    with >= min_dup_docs - 1 other documents are spliced out; all
    other columns and untouched documents pass through byte-identical.

    Entirely JVM-side: the per-doc span list (bounded by the ~2/(w+1)
    selection density) is collected in one doc-keyed shuffle, merged
    with an ``aggregate`` fold, and the cut is a second fold splicing
    the kept segments — no Python anywhere."""
    out_col = out_col or text_col
    fps = with_substring_fingerprints(df, id_col, text_col, k, window, portable)
    dup = _dup_fps(fps, id_col, min_dup_docs)
    hits = fps.join(dup, "fp").select(id_col, "pos")
    spans = hits.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("__starts")
    )
    base = df.join(spans, id_col, "left")
    text = F.col(text_col)
    empty_spans = F.array().cast("array<struct<s:int,e:int>>")
    merged = F.aggregate(
        F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
        empty_spans,
        lambda acc, p: F.when(
            p <= F.coalesce(
                F.try_element_at(acc, F.lit(-1))["e"], F.lit(-1)
            ),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.try_element_at(acc, F.lit(-1))["s"].alias("s"),
                        F.greatest(
                            F.try_element_at(acc, F.lit(-1))["e"],
                            p + F.lit(k),
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.alias("s"), (p + F.lit(k)).alias("e")
                    )
                ),
            )
        ),
    )
    cut = F.aggregate(
        merged,
        F.struct(F.lit(0).alias("c"), F.lit("").alias("o")),
        lambda acc, sp: F.struct(
            F.least(sp["e"], F.length(text)).alias("c"),
            F.concat(
                acc["o"], text.substr(acc["c"] + 1, sp["s"] - acc["c"])
            ).alias("o"),
        ),
        lambda acc: F.concat(
            acc["o"], text.substr(acc["c"] + 1, F.length(text) - acc["c"])
        ),
    )
    result = base.withColumn(
        "__cut", F.when(F.col("__starts").isNull(), text).otherwise(cut)
    ).drop("__starts")
    if out_col == text_col:
        result = result.drop(text_col)
    return result.withColumnRenamed("__cut", out_col)
