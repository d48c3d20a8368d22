"""Batch changelog application: compact a CDC/upsert stream onto a
base snapshot (the batch twin of ``streaming.stateful.latest_changelog``
and the offline analog of the online store's newest-wins upsert,
online/store.py:141-178).

A change row is (keys, ts [, created], op, payload...) with ``op`` in
{upsert, delete} (aliases: insert/update/u/c -> upsert; d/remove ->
delete).  Applying a changelog means: per key, the newest change by
(ts, created) decides — an upsert contributes its payload, a delete
removes the key — and a base row survives only if no newer change
exists.  This is MERGE INTO semantics (Delta/Iceberg's
whenMatched/whenNotMatched), expressed engine-neutrally:

    union(base tagged ts, changes) -> latest_per_key -> drop deletes

ONE hash aggregate with map-side partial combine (the latest_per_key
`agg` strategy): shuffle O(distinct keys), never O(change rows) — a
key with a million updates ships one candidate per task.  No window,
no join.  Idempotent and order-insensitive: replaying the same
changelog, or applying it in any order, yields the same snapshot
(the property that makes checkpoint-replay and at-least-once delivery
safe).

Ties: an upsert and a delete with identical (ts, created) resolve to
the DELETE (op sorts into the tie-break as a last resort so replays
stay deterministic; pick later timestamps if you need the opposite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.operators.dedup import latest_per_key

__all__ = ["apply_changelog"]

_UPSERTS = ("upsert", "insert", "update", "u", "c", "i")
_DELETES = ("delete", "remove", "d")


def apply_changelog(
    base: DataFrame | None,
    changes: DataFrame,
    join_keys: list[str],
    ts_col: str,
    op_col: str = "op",
    created_col: str | None = None,
) -> DataFrame:
    """Return the new snapshot: base ⊕ changes under newest-wins +
    delete semantics.  ``base`` rows must carry ``ts_col`` (their
    materialization ts); pass ``base=None`` to compact a bare
    changelog into a snapshot.  Output columns = payload columns
    (base schema without ``op``), one row per surviving key."""
    norm_op = F.when(
        F.lower(F.col(op_col)).isin(list(_UPSERTS)), F.lit("upsert")
    ).when(
        F.lower(F.col(op_col)).isin(list(_DELETES)), F.lit("delete")
    )
    # unknown ops are dropped (data-dependent validation cannot fail
    # at plan-build time; run an expectations values_in_set check
    # upstream to gate instead)
    ch = (
        changes.withColumn("__op", norm_op)
        .filter(F.col("__op").isNotNull())
        .drop(op_col)
    )
    payload_cols = [c for c in ch.columns if c != "__op"]
    if base is not None:
        missing = [c for c in payload_cols if c not in base.columns]
        if missing:
            raise ValueError(
                f"base is missing changelog columns {missing}"
            )
        b = base.select(*payload_cols).withColumn("__op", F.lit("upsert"))
        ch = b.unionByName(ch)
    # deletes win full ties: rank delete=1 > upsert=0 and fold the op
    # into the tie-break after (ts, created).  latest_per_key's
    # created slot takes one column; pack (created, rank) into a
    # struct — struct ordering is field-by-field, exactly the
    # (created DESC, delete-first) tie-break needed.
    tie = F.struct(
        (
            F.col(created_col)
            if created_col
            else F.lit(None).cast("timestamp")
        ).alias("c"),
        F.when(F.col("__op") == "delete", F.lit(1))
        .otherwise(F.lit(0))
        .alias("o"),
    )
    packed = ch.withColumn("__tie", tie)
    latest = latest_per_key(
        packed, join_keys, ts_col, created_col="__tie"
    )
    return (
        latest.filter(F.col("__op") == "upsert")
        .drop("__op", "__tie")
        .select(*payload_cols)
    )
