"""Train/eval n-gram contamination check (benchmark decontamination).

The standard pre-training hygiene pass: flag evaluation documents whose
word n-grams appear anywhere in the training corpus (the GPT-3 appendix
C / PaLM style n-gram-overlap decontamination — public methodology, no
reference-repo counterpart).  Everything is native DataFrame ops:

    train ─ shingle ─ explode ──────────┐
                                        ├─ inner join on shingle ─ per-doc agg
    eval  ─ shingle ─ explode ─ (bcast) ┘

Scale shape (100 TB train corpus, small eval set):

* The eval side is typically tiny (benchmarks: 1e3–1e6 docs).  With
  ``broadcast_eval=True`` (default) its exploded shingle frame
  broadcasts, so the 100 TB train side NEVER shuffles: each train
  partition probes the hash map and emits only hits, and train-side
  duplicate shingles collapse in the count-distinct aggregate
  (map-side partial) instead of a global ``distinct()``.
* The aggregate keyspace is the eval doc ids — small — so the final
  exchange is negligible regardless of train size.
* Hot shingles (boilerplate) inflate the hit frame but never an
  aggregation buffer: counts are additive — no collect_list anywhere.

``portable=True`` keeps string shingles (reproducible in DuckDB SQL for
the differential oracle); the fast path joins on xxhash64 longs
(8-byte compares, collision p ~ 2^-64 per pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feast_spark.functions.text import explode_computed
from feast_spark.operators.docdedup import (
    widen_parallelism,
    with_hashed_shingles,
    with_shingles,
)


def ngram_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    threshold: float = 0.0,
    portable: bool = False,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-eval-document contamination against the training corpus.

    Returns ``(id_col, total_ngrams, contaminated_ngrams,
    contamination_frac)`` — distinct n-grams of the eval doc, how many
    of them occur in ANY train doc, and the fraction.  ``threshold``
    keeps only rows with ``contamination_frac > threshold`` (0.0 keeps
    every eval doc, including clean ones — the left join preserves
    them with 0 hits).

    Docs shorter than ``n`` tokens contribute their whole text as one
    shingle (the ``with_shingles`` guard), so short eval docs are
    still checked — exact-match only, the honest semantics for them.
    """
    shingler = with_shingles if portable else with_hashed_shingles
    # shingling is CPU-bound: widen a small-file scan to the session
    # parallelism before it (the docdedup discipline — round-robin of
    # RAW text rows, a no-op whenever the scan already has >= cores
    # input files, i.e. always at real scale)
    from feast_spark.operators.docdedup import _persist

    # the eval shingle frame feeds two consumers (the broadcast build
    # side and the totals aggregate); it is small by contract, so
    # persist the (id, shingles) projection and shingle eval ONCE
    ev_sh = _persist(
        shingler(
            widen_parallelism(eval_df.select(id_col, text_col)), text_col, n
        ).select(id_col, "shingles")
    )
    ev = explode_computed(ev_sh, [id_col], "shingles", "__sh")
    tr = explode_computed(
        shingler(widen_parallelism(train_df.select(text_col)), text_col, n),
        [],
        "shingles",
        "__sh",
    )
    # inner-join the train stream against the (broadcast) eval shingle
    # set, then count DISTINCT hit shingles per eval doc: train-side
    # duplicates collapse in the aggregate (map-side partial), so the
    # train corpus needs neither a global distinct() nor any shuffle —
    # each partition probes the broadcast map and emits only hits.
    build = F.broadcast(ev) if broadcast_eval else ev
    hits = tr.join(build, "__sh").groupBy(id_col).agg(
        F.count_distinct("__sh").alias("contaminated_ngrams")
    )
    # shingle arrays are already distinct (array_distinct in the
    # shingler), so the per-doc total is the array size — no explode
    # pass over the eval side (3.5x at sf0.1: the exploded aggregate
    # was the dominant stage).  The groupBy runs over one row per
    # INPUT row (not per shingle) and keeps the output at id grain
    # when the eval frame carries duplicate ids, preserving the
    # hits-side aggregate's grain (frac stays <= 1).
    totals = ev_sh.select(
        id_col, F.size("shingles").cast("long").alias("__n")
    ).groupBy(id_col).agg(F.sum("__n").alias("total_ngrams"))
    out = (
        totals.join(hits, id_col, "left")
        .withColumn(
            "contaminated_ngrams",
            F.coalesce(F.col("contaminated_ngrams"), F.lit(0)),
        )
        .withColumn(
            "contamination_frac",
            F.col("contaminated_ngrams") / F.col("total_ngrams"),
        )
    )
    if threshold > 0.0:
        out = out.filter(F.col("contamination_frac") > threshold)
    return out


def contaminated_spans(
    train_df: DataFrame,
    eval_df: DataFrame,
    eval_id_col: str,
    train_id_col: str,
    text_col: str,
    n: int = 8,
    portable: bool = False,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Which train documents contaminate which eval documents.

    Returns columns literally named ``(eval_id, train_id,
    shared_ngrams)`` — one row per (eval doc, train doc) pair sharing
    at least one n-gram, the audit trail behind
    :func:`ngram_contamination`'s counts.  Output names are fixed (not
    the input column names) so the two sides may share an id column
    name without ambiguity.

    Unlike the count variant this keeps train doc ids through the join,
    so a boilerplate n-gram shared by k train docs fans out k rows per
    eval hit.  ``max_shingle_freq`` drops shingles occurring in more
    than that many train docs before the join (they identify nothing —
    same reasoning as the LSH hot-bucket cap, enforced with a pre-agg
    count, never a materialized bucket).  The frequency pass runs
    AFTER a broadcast left-semi probe against the eval shingles, so it
    aggregates hit shingles only and the train corpus never
    shuffles."""
    shingler = with_shingles if portable else with_hashed_shingles
    from feast_spark.operators.docdedup import _persist

    # the exploded eval shingles feed TWO broadcast builds (the
    # left-semi probe and the final join); eval-bounded — small — so
    # persist and shingle the eval side once
    ev = _persist(
        explode_computed(
            shingler(
                widen_parallelism(
                    eval_df.select(
                        F.col(eval_id_col).alias("eval_id"), text_col
                    )
                ),
                text_col,
                n,
            ),
            ["eval_id"],
            "shingles",
            "__sh",
        )
    )
    tr = explode_computed(
        shingler(
            widen_parallelism(
                train_df.select(
                    F.col(train_id_col).alias("train_id"), text_col
                )
            ),
            text_col,
            n,
        ),
        ["train_id"],
        "shingles",
        "__sh",
    )
    # Only shingles that appear in the (small) eval set can ever reach
    # the output, so probe the train stream against the broadcast eval
    # shingles FIRST: a left-semi broadcast join runs partition-local,
    # and the 100 TB train corpus never shuffles — the same posture as
    # the gated count variant above.  Per-hit-shingle frequency is
    # unchanged by the probe (every train row of a hit shingle survives
    # the semi-join; non-hit shingles were doomed to be dropped by the
    # final eval join anyway), so the max_shingle_freq aggregate below
    # runs over hit shingles only: O(hits), not O(train shingles).
    # The build side skips distinct(): the broadcast hash relation
    # dedups keys itself, and skipping it keeps the eval branch free of
    # a shuffle exchange.
    tr = tr.join(F.broadcast(ev.select("__sh")), "__sh", "left_semi")
    if max_shingle_freq is not None:
        # the hit stream is consumed twice (frequency cap + final
        # join); it is eval-bounded — small — so persist it and the
        # 100 TB train corpus is scanned ONCE, not once per consumer
        # (the docdedup._persist discipline: LRU + ContextCleaner
        # eviction, nothing leaks from a one-shot query)
        from feast_spark.operators.docdedup import _persist

        tr = _persist(tr)
        freq = tr.groupBy("__sh").agg(
            F.count(F.lit(1)).alias("__freq")
        )
        # freq is keyed by hit shingles — bounded by the eval set we
        # already broadcast — so it broadcasts too: no train-side
        # exchange anywhere in the audit path.
        tr = (
            tr.join(
                F.broadcast(freq.filter(F.col("__freq") <= max_shingle_freq)),
                "__sh",
            )
            .drop("__freq")
        )
    # (eval_id, __sh) and (train_id, __sh) are each unique post
    # array_distinct, so plain count(*) counts distinct shared shingles
    return (
        tr.join(F.broadcast(ev), "__sh")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
