"""Streaming decontamination stage: per micro-batch marking against
the broadcast eval shingle set, pinned stream≡batch — the flags the
stream accumulates across slices (including one delivered via a
checkpoint restart) equal the batch operator's numbers on the union
of slices, contaminated docs never reach the corpus sink, and an idle
re-run emits/writes nothing new (the test_streaming.py discipline)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_spark.operators.contamination import ngram_contamination
from feast_spark.streaming.decontaminate import (
    eval_shingles,
    mark_contaminated,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_EVAL = [
    (1, "the secret benchmark answer is forty two exactly"),
    (2, "another held out evaluation question about prime numbers"),
]

# slice 1: 101 copies an eval passage (contaminated), 100/102 fresh
_B1 = [
    (100, "fresh streamed document about alpha beta gamma delta"),
    (101, "copied: the secret benchmark answer is forty two exactly"),
    (102, "totally unrelated text epsilon zeta eta theta"),
]

# slice 2 (late, delivered after a restart): 200 contaminated, 201 fresh
_B2 = [
    (200, "another held out evaluation question about prime numbers verbatim"),
    (201, "late fresh doc iota kappa lambda mu"),
]


@pytest.mark.parametrize(
    "portable",
    # the portable variant exercises the same stream==batch identity
    # through a second hash family — depth coverage, nightly-only
    [False, pytest.param(True, marks=pytest.mark.nightly)],
)
def test_streaming_decontamination_equals_batch(spark, tmp_path, portable):
    n = 5
    eval_df = spark.createDataFrame(_EVAL, DOC_SCHEMA)
    ev_sh = eval_shingles(eval_df, "text", n=n, portable=portable).cache()

    flags = []
    corpus_dir = tmp_path / f"corpus_{int(portable)}"

    def handler(batch_df, epoch_id):
        marked = mark_contaminated(
            batch_df, ev_sh, "doc_id", "text", n=n, portable=portable
        )
        flags.extend(marked.collect())
        # the gate: only clean docs enter the corpus
        marked.filter(~F.col("contaminated")).select(
            "doc_id", "text"
        ).write.mode("append").parquet(str(corpus_dir))

    src = tmp_path / f"in_{int(portable)}"
    src.mkdir()

    def write_slice(name, rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    def run_stream():
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(str(src) + "/*")
        q = (
            stream.writeStream.foreachBatch(handler)
            .option(
                "checkpointLocation",
                str(tmp_path / f"ckpt_{int(portable)}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_slice("b1", _B1)
    run_stream()
    write_slice("b2", _B2)  # late slice, delivered via restart
    run_stream()
    n_flags_after_two = len(flags)
    run_stream()  # idle re-run: nothing new -> nothing emitted
    assert len(flags) == n_flags_after_two

    # stream≡batch: the accumulated per-batch numbers equal the batch
    # operator on the union of slices (roles: incoming docs scored
    # against the eval suite as corpus)
    union = spark.createDataFrame(_B1 + _B2, DOC_SCHEMA)
    batch = {
        r["doc_id"]: (
            r["total_ngrams"],
            r["contaminated_ngrams"],
            round(r["contamination_frac"], 12),
        )
        for r in ngram_contamination(
            eval_df, union, "doc_id", "text", n=n, portable=portable
        ).collect()
    }
    got = {
        r["doc_id"]: (
            r["total_ngrams"],
            r["contaminated_ngrams"],
            round(r["contamination_frac"], 12),
        )
        for r in flags
    }
    assert got == batch
    # the planted structure: the two eval copies are flagged, rest clean
    flagged = sorted(r["doc_id"] for r in flags if r["contaminated"])
    assert flagged == [101, 200]
    # every input column survives the marking projection
    assert {"doc_id", "text"}.issubset({f for f in flags[0].asDict()})

    # contaminated docs never reached the corpus
    corpus_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(str(corpus_dir)).collect()
    )
    assert corpus_ids == [100, 102, 201]
