"""Versioned training datasets: the offline half of run provenance.

A training run's ONLINE state, index commits and registry version are
all replayable (provenance.py) — but the training DataFrame itself
(the point-in-time join output a model actually fit on) is usually
written as a loose parquet directory that the next run overwrites.
``commit_dataset`` writes it through the same manifest-flip snapshot
store the online layer uses (io/manifest.py): every commit is an
immutable ``v_<n>`` directory published by one atomic manifest write,
with a seq'd commit log, ``keep_versions`` GC, and GC-exempt tags —
so "the exact rows the June model trained on" is an ``as_of=`` read,
not a hope that nobody re-ran the pipeline.

This mirrors the reference's SavedDataset direction (the reference
v0.11 has no dataset persistence verb; its successor added one) with
the commit discipline the rest of this repo uses.  At 100 TB the
mechanics hold: a commit is one parquet write of the dataset plus one
JSON flip; readers resolve the manifest first and never see a partial
write; retention bounds storage to ``keep_versions`` datasets plus
tagged pins (which a reproducible run must keep by definition).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.io.fs import StoreFS
from feast_spark.io.manifest import ManifestedParquetTable


#: the datasets-layer default GC window (the pre-r15 commit default)
DATASET_KEEP_VERSIONS = 3


def _dataset_table(
    root: str, fs: StoreFS | None, keep_versions: int | None
) -> ManifestedParquetTable:
    """The manifest table with the dataset-layer retention default:
    an explicit window wins; otherwise the window stored by the last
    commit; otherwise 3 — including for a table committed BEFORE
    window persistence existed, whose manifest has no stored key (the
    global manifest default of 2 would silently shrink such a
    dataset's historical retention and delete a snapshot it kept)."""
    t = ManifestedParquetTable(root, fs=fs, keep_versions=keep_versions)
    if keep_versions is None and t.stored_keep_versions() is None:
        t = ManifestedParquetTable(
            root, fs=fs, keep_versions=DATASET_KEEP_VERSIONS
        )
    return t


def commit_dataset(
    df: DataFrame,
    root: str,
    fs: StoreFS | None = None,
    keep_versions: int | None = None,
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the next snapshot of the dataset at ``root``;
    returns the commit seq (the coordinate to record in a provenance
    snapshot).  ``meta`` (feature refs, entity-df description, code
    version) merges into the manifest for ``dataset_meta`` readers.

    ``keep_versions=None`` (default) honors the window the dataset was
    committed with (persisted in the manifest; 3 when the manifest
    stores none — brand-new datasets and tables committed before
    window persistence) — a re-committing pipeline whose config
    drifted from the original committer's must not silently shrink
    retention.  An explicit int overrides and becomes the new stored
    window."""
    t = _dataset_table(root, fs, keep_versions)
    # commit() returns the seq it minted under the manifest lock —
    # re-reading history()[-1] here could hand back a CONCURRENT
    # committer's seq, recording the wrong rows in a provenance pin
    return t.commit(df, meta=meta)


def read_dataset(
    spark: SparkSession,
    root: str,
    as_of: int | str | datetime | None = None,
    fs: StoreFS | None = None,
) -> DataFrame:
    """The dataset at ``root`` — head, or the snapshot at commit seq /
    tag name / wall-clock instant ``as_of``.  Raises the manifest's
    honest retention-window error for expired targets."""
    df = ManifestedParquetTable(root, fs=fs).read(spark, as_of=as_of)
    if df is None:
        raise ValueError(f"no committed dataset at {root}")
    return df


def dataset_history(root: str, fs: StoreFS | None = None) -> list[dict]:
    """The retained commit log (oldest first) — the resolvable
    ``as_of=`` targets."""
    return ManifestedParquetTable(root, fs=fs).history()


def dataset_meta(root: str, fs: StoreFS | None = None) -> dict:
    """The last commit's merged metadata."""
    return ManifestedParquetTable(root, fs=fs).current_meta()


def tag_dataset(
    root: str, name: str, seq: int | None = None,
    fs: StoreFS | None = None,
) -> int:
    """Pin a dataset commit (default head) under ``name`` — GC-exempt
    until :func:`delete_dataset_tag`; readable via
    ``read_dataset(as_of=name)``."""
    return ManifestedParquetTable(root, fs=fs).tag(name, seq)


def delete_dataset_tag(
    root: str, name: str, fs: StoreFS | None = None
) -> None:
    """Unpin ``name``; its snapshot rejoins the GC window at the next
    commit (or :func:`vacuum_dataset`)."""
    ManifestedParquetTable(root, fs=fs).delete_tag(name)


def diff_dataset(
    spark: SparkSession,
    root: str,
    a: int | str,
    b: int | str,
    key_cols: list[str] | None = None,
    fs: StoreFS | None = None,
    sample: int = 5,
) -> dict:
    """What changed between dataset commits ``a`` and ``b`` (seq or
    tag) — the audit question versioned training sets exist to answer
    ("what moved between the June and July training runs?").

    Returns a driver-side dict of COUNTS plus up to ``sample`` example
    keys per bucket — never the rows themselves:

    * without ``key_cols``: multiset row diff — ``{"added": n,
      "removed": n}``, where a row duplicated k times in ``b`` and
      j times in ``a`` contributes ``max(0, k-j)`` to added (the
      EXCEPT ALL semantics).
    * with ``key_cols``: ``{"added", "removed", "changed",
      "sample_added", "sample_removed", "sample_changed"}`` — keys
      only in ``b``, only in ``a``, and in both with different
      non-identical row content.

    Scale shape (100 TB dataset versions): each side collapses to its
    16-byte md5 row fingerprint (the ``dedup_exact`` identity) in a
    narrow map, so the one shuffle moves (key, hash) — never feature
    columns; the keyed variant folds duplicate-key groups into one
    order-insensitive group fingerprint via a commutative
    (sum, xor, count) fold over a 64-bit rehash — O(1) aggregation
    state per key, so a pathologically hot key (millions of duplicate
    rows) folds map-side instead of materializing a collect_list
    buffer on one executor.  Counts aggregate map-side; samples are
    ``LIMIT sample`` collects.

    Top-level map-typed columns are canonicalized (entries sorted by
    key) before fingerprinting, so two commits holding the same map
    contents in different internal order compare equal; maps NESTED
    inside arrays/structs are fingerprinted in their serialized order
    and may report a spurious change if an engine reorders them."""
    if not key_cols:
        df_a, df_b, cols, map_cols = _diff_inputs(spark, root, a, b, fs)

        def _hashed(df):
            return _hashed_rows(df, cols, [], map_cols)

        ca = _hashed(df_a).groupBy("__h").agg(F.count(F.lit(1)).alias("__na"))
        cb = _hashed(df_b).groupBy("__h").agg(F.count(F.lit(1)).alias("__nb"))
        joined = ca.join(cb, "__h", "full_outer").select(
            F.coalesce("__na", F.lit(0)).alias("na"),
            F.coalesce("__nb", F.lit(0)).alias("nb"),
        )
        row = joined.agg(
            F.sum(F.greatest(F.col("nb") - F.col("na"), F.lit(0))).alias("added"),
            F.sum(F.greatest(F.col("na") - F.col("nb"), F.lit(0))).alias("removed"),
        ).collect()[0]
        return {"added": int(row["added"] or 0),
                "removed": int(row["removed"] or 0)}

    full = diff_dataset_frame(spark, root, a, b, key_cols, fs=fs)
    full = full.persist()
    try:
        counts = {
            r["status"]: r["n"]
            for r in full.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        out: dict = {
            "added": int(counts.get("added", 0)),
            "removed": int(counts.get("removed", 0)),
            "changed": int(counts.get("changed", 0)),
        }
        for status in ("added", "removed", "changed"):
            out[f"sample_{status}"] = [
                tuple(r[c] for c in key_cols) if len(key_cols) > 1
                else r[key_cols[0]]
                for r in full.where(F.col("status") == status)
                .select(*key_cols)
                .orderBy(*key_cols)
                .limit(sample)
                .collect()
            ]
        return out
    finally:
        full.unpersist()


def _diff_inputs(spark, root, a, b, fs):
    """Resolve both commits and the shared fingerprint column set."""
    t = ManifestedParquetTable(root, fs=fs)
    df_a, df_b = t.read(spark, as_of=a), t.read(spark, as_of=b)
    if sorted(df_a.columns) != sorted(df_b.columns):
        raise ValueError(
            f"dataset commits {a} and {b} at {root} have different "
            f"columns: {sorted(df_a.columns)} vs {sorted(df_b.columns)}"
        )
    from pyspark.sql import types as T

    map_cols = {
        f.name for f in df_a.schema.fields
        if isinstance(f.dataType, T.MapType)
    }
    return df_a, df_b, sorted(df_a.columns), map_cols


def _hashed_rows(df, cols, key_cols, map_cols):
    # to_json canonicalizes every type (timestamps, arrays, structs)
    # into one string to fingerprint; column order fixed by the sorted
    # projection so both sides agree.  MapType serializes in internal
    # entry order, so maps are sorted into entry arrays first —
    # identical contents, identical bytes.
    return df.select(
        *key_cols,
        F.md5(
            F.to_json(
                F.struct(
                    *[
                        F.array_sort(F.map_entries(F.col(c))).alias(c)
                        if c in map_cols
                        else F.col(c)
                        for c in cols
                    ]
                )
            )
        ).alias("__h"),
    )


def diff_dataset_frame(
    spark: SparkSession,
    root: str,
    a: int | str,
    b: int | str,
    key_cols: list[str],
    fs: StoreFS | None = None,
) -> DataFrame:
    """The keyed diff classification as a DATAFRAME — one row per key
    whose content differs between commits ``a`` and ``b``, columns
    ``(*key_cols, status)`` with ``status`` in added / removed /
    changed.  :func:`diff_dataset` derives its counts and samples from
    this frame; it is exposed so the classification itself can feed
    downstream plans (re-embed only the changed keys, re-train when
    the changed set crosses a threshold) and be value-gated.

    Same scale shape as the counts: each side collapses to (key,
    16-byte hash) in a narrow map; duplicate-key groups fold into ONE
    order-insensitive fingerprint via a commutative (sum, xor, count)
    of a 64-bit rehash — O(1) aggregation state per key, partials
    combine map-side, a false group match needs sum AND xor AND count
    to collide simultaneously.  The sum runs in decimal(38,0) (exact,
    no ANSI long overflow at any multiplicity)."""
    df_a, df_b, cols, map_cols = _diff_inputs(spark, root, a, b, fs)

    def _per_key(df):
        h = _hashed_rows(df, cols, key_cols, map_cols).withColumn(
            "__h64", F.xxhash64("__h")
        )
        return h.groupBy(*key_cols).agg(
            F.struct(
                F.sum(F.col("__h64").cast("decimal(38,0)")).alias("s"),
                F.expr("bit_xor(__h64)").alias("x"),
                F.count(F.lit(1)).alias("n"),
            ).alias("__h")
        )

    pa = _per_key(df_a).withColumnsRenamed({"__h": "__ha"})
    pb = _per_key(df_b).withColumnsRenamed({"__h": "__hb"})
    # null-safe equality: a plain key join never matches NULL keys, so
    # an unchanged NULL-keyed group would surface as added+removed
    cond = None
    for k in key_cols:
        c = pa[k].eqNullSafe(pb[k])
        cond = c if cond is None else cond & c
    return pa.join(pb, cond, "full_outer").select(
        *[F.coalesce(pa[k], pb[k]).alias(k) for k in key_cols],
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("status"),
    ).where(F.col("status") != "same")


def vacuum_dataset(
    root: str, fs: StoreFS | None = None,
    keep_versions: int | None = None,
) -> list[str]:
    """Reclaim dataset versions outside the keep window NOW — e.g.
    after a retired run's tag was deleted on a dataset nobody re-runs
    (commit-path GC would otherwise never fire again).  Returns the
    deleted version dirs.

    The window defaults to the one the dataset was COMMITTED with
    (persisted in the manifest) — a vacuum run from a process with a
    smaller default must not delete snapshots the committer's
    retention meant to keep.  An explicit ``keep_versions`` overrides,
    deliberately."""
    return _dataset_table(root, fs, keep_versions).vacuum()
