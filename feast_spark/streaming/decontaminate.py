"""Streaming benchmark decontamination — decontaminate-on-ingest.

The batch pipeline decontaminates once, after the fact
(``operators.contamination`` / ``build_corpus`` stage 4).  A
never-stopping ingest pipeline wants the same gate at the door: each
micro-batch of incoming documents probed against the evaluation
n-gram set BEFORE the doc can enter the corpus or any index — a
contaminated doc that reaches an index must otherwise be hunted down
by a later batch audit.

Split of responsibilities (the ``streaming.dedup`` discipline):

* :func:`eval_shingles` is the BATCH-side product: the distinct
  shingle set of the eval suites, built once (and rebuilt only when a
  new benchmark is added).  Eval suites are small (1e3–1e6 docs), so
  the frame broadcasts; ``.cache()`` it in long-lived drivers so the
  per-micro-batch broadcast rebuild reads memory, not the source.
* :func:`mark_contaminated` is a stateless BATCH function applied per
  micro-batch from ``foreachBatch``.  No streaming state store is
  involved: the only long-lived state is the eval shingle frame,
  a side input exactly like the dedup band index — which is what
  makes the stage restart-safe for free (a replayed micro-batch
  recomputes identical flags).

Scale shape: the eval side broadcasts, the incoming docs probe the
hash map partition-locally, and the only aggregation keyspace is the
micro-batch's own doc ids — the identical plan posture as the gated
batch operator (``test_plan_hygiene.py``), applied to a batch that is
micro-batch-sized by construction.

Same public methodology as the batch operator (GPT-3 appendix C /
PaLM n-gram overlap); no reference-repo counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feast_spark.operators.docdedup import (
    widen_parallelism,
    with_hashed_shingles,
    with_shingles,
)

__all__ = ["eval_shingles", "mark_contaminated"]


def eval_shingles(
    eval_df: DataFrame,
    text_col: str,
    n: int = 8,
    portable: bool = False,
) -> DataFrame:
    """The distinct eval shingle set — one ``__sh`` column — for
    :func:`mark_contaminated`.  Build it with the SAME ``n`` and
    ``portable`` flag as the marking call: the shingle identity
    (xxhash64 longs vs strings) must match or nothing ever hits."""
    shingler = with_shingles if portable else with_hashed_shingles
    # one-shot batch build, CPU-bound shingling: widen a small-file
    # eval scan to the session parallelism (no-op at real file counts)
    from feast_spark.functions.text import explode_computed

    return explode_computed(
        shingler(
            widen_parallelism(eval_df.select(text_col)), text_col, n
        ),
        [],
        "shingles",
        "__sh",
    ).distinct()


def mark_contaminated(
    batch_df: DataFrame,
    eval_shingle_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    portable: bool = False,
    threshold: float = 0.0,
) -> DataFrame:
    """Flag incoming documents whose n-grams appear in the eval set.

    Returns ``batch_df``'s rows with four added columns —
    ``total_ngrams``, ``contaminated_ngrams``, ``contamination_frac``
    (the exact :func:`~feast_spark.operators.contamination.\
ngram_contamination` numbers, train/eval roles swapped: here the
    INCOMING side is scored) and boolean ``contaminated``
    (``frac > threshold``).  Route on the flag in the handler —
    quarantine the hits, let the clean side proceed to dedup/index
    appends.

    Stateless per batch: apply from ``foreachBatch``.  Doc ids are
    assumed unique within a micro-batch (upstream exact dedup's
    output contract); duplicate ids would pool their hit counts.
    """
    from feast_spark.functions.text import explode_computed

    shingler = with_shingles if portable else with_hashed_shingles
    sh = shingler(batch_df, text_col, n)
    hits = (
        explode_computed(sh, [id_col], "shingles", "__sh")
        .join(F.broadcast(eval_shingle_df.select("__sh")), "__sh")
        .groupBy(id_col)
        .agg(F.count_distinct("__sh").alias("contaminated_ngrams"))
    )
    return (
        sh.withColumn("total_ngrams", F.size("shingles").cast("long"))
        .drop("shingles")
        .join(hits, id_col, "left")
        .withColumn(
            "contaminated_ngrams",
            F.coalesce(F.col("contaminated_ngrams"), F.lit(0)),
        )
        .withColumn(
            "contamination_frac",
            F.col("contaminated_ngrams") / F.col("total_ngrams"),
        )
        .withColumn(
            "contaminated", F.col("contamination_frac") > F.lit(threshold)
        )
    )
