"""Streaming corpus dedup — the stream twin of ``operators.docdedup``.

A document firehose (crawl ingest, user uploads) deduplicated online so
downstream consumers see each distinct text once:

* :func:`streaming_exact_dedup` — first-seen-wins on the normalized
  md5 fingerprint, the same identity as the batch ``exact_dedup``
  (``fingerprint_md5``), so a stream and its batch backfill agree on
  which texts are duplicates.  Built on
  ``dropDuplicatesWithinWatermark``: state per distinct fingerprint is
  retained only within the watermark horizon — bounded memory at any
  stream length, the honest streaming contract (a dup arriving later
  than the watermark is re-emitted; batch reconciliation catches it,
  the same late-data stance as stream-to-online ingestion).

* :func:`mark_near_dup_candidates` — MinHash+LSH marking against a
  FIXED reference corpus's precomputed band buckets (broadcast),
  applied per micro-batch from ``foreachBatch``: each incoming doc is
  marked with whether it collides with a known document.  The
  reference index is corpus-sized state that does NOT belong in a
  streaming operator's state store; keeping it a broadcast side input
  (refreshed by the batch pipeline) is the scale-correct split between
  stream and batch responsibilities.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, functions as F

from feast_spark.functions.text import fingerprint_md5


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: timedelta = timedelta(hours=1),
    fingerprint_col: str = "__fp",
) -> DataFrame:
    """First occurrence of each distinct (normalized) text passes;
    duplicates within the watermark horizon are dropped.

    State is one row per distinct fingerprint seen within the horizon
    — O(distinct recent texts), never O(stream).  The fingerprint
    column is left in the output so downstream joins/audits can key on
    it; drop it if not wanted.
    """
    return (
        stream_df.withColumn(fingerprint_col, fingerprint_md5(F.col(text_col)))
        .withWatermark(ts_col, f"{int(watermark.total_seconds())} seconds")
        .dropDuplicatesWithinWatermark([fingerprint_col])
    )


_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(conf_value: str) -> int:
    """Spark size-conf string ('10485760b', '10MB', '-1') -> bytes."""
    import re

    m = re.fullmatch(r"(-?\d+)\s*([a-z]*)", str(conf_value).strip().lower())
    if not m or m.group(2) not in _BYTE_SUFFIX:
        raise ValueError(f"unparseable size conf {conf_value!r}")
    return int(m.group(1)) * _BYTE_SUFFIX[m.group(2)]


def _band_structs(num_hashes: int, bands: int) -> F.Column:
    """(band, bucket) structs from a ``minhash`` column — the same
    xxhash64-over-signature-slice keys as the batch
    ``lsh_candidate_pairs`` fast path, so stream and batch agree on
    bucket identity."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.slice("minhash", b * rows_per_band + 1, rows_per_band)
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def mark_near_dup_candidates(
    batch_df: DataFrame,
    reference_buckets: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    broadcast_index: bool | str = "auto",
) -> DataFrame:
    """Mark documents that LSH-collide with a reference corpus.

    ``reference_buckets`` is the batch-side product
    ``lsh_band_buckets(corpus)`` — ``(band, bucket)`` distinct rows —
    or a bucketed-table read of it (:func:`publish_band_index` /
    :func:`read_band_index`).  The incoming docs' band keys come from
    the SAME signature pipeline; a hit on any band sets
    ``near_dup_candidate`` (exact verification, if needed, happens
    downstream against the batch store — candidates are rare by
    construction).

    ``broadcast_index``: ``True`` forces a broadcast join (right for
    indexes into the hundreds of millions of docs — O(docs x bands)
    longs); ``False`` forces a shuffle join, which is the 100-TB-corpus
    path: with the index published bucketed on (band, bucket), its
    Exchange is dropped at read time (plan-pinned), so per micro-batch
    only the SMALL incoming side shuffles.  ``"auto"`` (default)
    dispatches on the index's optimizer size estimate vs
    ``spark.sql.autoBroadcastJoinThreshold`` — parquet/bucketed-table
    reads carry real sizes; in-memory frames report unknown (huge) and
    so take the shuffle path.

    This is a BATCH function on purpose: in a stream, apply it per
    micro-batch from ``foreachBatch`` (the test shows the wiring).  An
    in-plan streaming groupBy would keep one state row per doc id
    forever — unbounded state; per-micro-batch application is
    stateless, so the only long-lived state is the published index,
    refreshed whenever the batch pipeline republishes it.
    """
    if broadcast_index == "auto":
        threshold = _parse_bytes(
            batch_df.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        )
        stats_size = (
            reference_buckets._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .sizeInBytes()
        )
        broadcast_index = threshold > 0 and 0 <= stats_size <= threshold
    mh = _banded_docs(batch_df, id_col, text_col, n, num_hashes, bands)
    ref = reference_buckets.withColumn("__hit", F.lit(True))
    if broadcast_index:
        ref = F.broadcast(ref)
    marked = mh.join(ref, ["band", "bucket"], "left")
    return marked.groupBy(id_col, text_col).agg(
        F.max(F.coalesce(F.col("__hit"), F.lit(False))).alias(
            "near_dup_candidate"
        )
    )


def _banded_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    from feast_spark.operators.docdedup import with_hashed_shingles, with_minhash

    mh = with_minhash(
        with_hashed_shingles(df.select(id_col, text_col), text_col, n),
        num_hashes=num_hashes,
        prehashed=True,
    )
    from feast_spark.functions.text import explode_computed

    return explode_computed(
        mh, [id_col, text_col], _band_structs(num_hashes, bands), "bb"
    ).select(id_col, text_col, "bb.band", "bb.bucket")


def lsh_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Batch-side reference index for :func:`mark_near_dup_candidates`:
    the distinct ``(band, bucket)`` keys of a corpus, with the same
    shingle/signature/banding parameters.  Size is O(docs x bands)
    distinct longs — pairs of longs, not text — compact enough to
    broadcast for corpora into the hundreds of millions of docs; past
    that, :func:`publish_band_index` persists it bucketed-by-key so
    the per-micro-batch join needs no broadcast AND no index-side
    shuffle."""
    return (
        _banded_docs(df, id_col, text_col, n, num_hashes, bands)
        .select("band", "bucket")
        .distinct()
    )


def publish_band_index(
    df: DataFrame,
    table: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    n_buckets: int = 64,
) -> None:
    """Publish the reference band index as a table BUCKETED on
    (band, bucket) — the 100-TB-corpus path for
    :func:`mark_near_dup_candidates`: the per-micro-batch left join
    then reads the index co-located (its Exchange is dropped,
    plan-pinned in tests), so each micro-batch shuffles only the
    incoming docs' band rows, and nothing is ever broadcast.  This
    retires the ~1e8-doc broadcast bound the pure-broadcast path
    carries.

    Republish (overwrite) whenever the batch dedup pipeline refreshes
    the corpus — the same refresh cadence as the broadcast variant.
    ``n_buckets`` sizes write-task memory exactly like
    ``skew.write_bucketed`` (one file per bucket)."""
    from feast_spark.operators.skew import write_bucketed

    write_bucketed(
        lsh_band_buckets(df, id_col, text_col, n, num_hashes, bands),
        table,
        bucket_cols=["band", "bucket"],
        n_buckets=n_buckets,
    )


def read_band_index(spark, table: str) -> DataFrame:
    """Read a :func:`publish_band_index` table for
    :func:`mark_near_dup_candidates` (auto mode sees its real size
    stats; the bucketed scan joins without an index-side Exchange)."""
    return spark.table(table)
