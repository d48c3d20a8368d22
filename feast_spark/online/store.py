"""S8/S9 — online KV store as a keyed columnar table.

The reference's online stores are row-oriented KV engines (sqlite DDL at
infra/online_stores/sqlite.py:166-187, Redis HSET redis.py:133-168) keyed
by a canonical serialized entity key (infra/key_encoding_utils.py:22-48:
sorted join keys, deterministic encoding).  Spark-native design: one
columnar table per (project, view), keyed by a deterministic string
encoding of the sorted join keys; upsert = union + latest-per-key +
atomic directory swap.  On a production deployment the same plan targets
Delta ``MERGE INTO`` or an external KV via ``foreachBatch``; the storage
format is pluggable, the plan identical.

Key encoding: ``k1=v1|k2=v2`` over join keys sorted by name —
order-insensitive and deterministic across partitions, mirroring the
reference's sorted length-prefixed binary encoding without wire compat
(not needed: helpers.py murmur3 keys are a Redis-specific detail).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.dedup import latest_per_key

_KEY = "__entity_key"
_EVENT_TS = "__event_ts"
_CREATED_TS = "__created_ts"


def encode_entity_key(join_keys: list[str]) -> F.Column:
    """Deterministic, order-insensitive key column (key_encoding_utils.py:22-48)."""
    parts = []
    for k in sorted(join_keys):
        parts.append(F.concat(F.lit(f"{k}="), F.col(k).cast("string")))
    return F.concat_ws("|", *parts)


class OnlineStore:
    def __init__(self, root: str):
        self.root = root

    def _table_path(self, project: str, view_name: str) -> str:
        return os.path.join(self.root, project, view_name)

    def online_write_batch(
        self,
        spark: SparkSession,
        project: str,
        view_name: str,
        df: DataFrame,
        join_keys: list[str],
        ts_col: str,
        created_col: str | None,
        feature_cols: list[str],
    ) -> None:
        """Per-key upsert: newest (event_ts, created_ts) wins, matching
        the sqlite UPDATE + INSERT-OR-IGNORE semantics (sqlite.py:76-128)."""
        path = self._table_path(project, view_name)
        incoming = df.select(
            encode_entity_key(join_keys).alias(_KEY),
            *[F.col(k) for k in join_keys],
            F.col(ts_col).alias(_EVENT_TS),
            (
                F.col(created_col) if created_col else F.lit(None).cast("timestamp")
            ).alias(_CREATED_TS),
            *[F.col(f) for f in feature_cols],
        )
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            # schema evolution: tolerate new feature columns
            for c in incoming.columns:
                if c not in existing.columns:
                    existing = existing.withColumn(
                        c, F.lit(None).cast(incoming.schema[c].dataType)
                    )
            incoming = existing.select(*incoming.columns).unionByName(incoming)
        merged = latest_per_key(
            incoming, [_KEY], _EVENT_TS, created_col=_CREATED_TS
        )
        # atomic replace: write beside, then swap
        os.makedirs(os.path.dirname(path), exist_ok=True)
        staging = path + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        merged.write.mode("overwrite").parquet(staging)
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def online_read(
        self,
        spark: SparkSession,
        project: str,
        view_name: str,
        entity_rows_df: DataFrame,
        join_keys: list[str],
        feature_cols: list[str],
    ) -> DataFrame:
        """J4 — multiget as a broadcast semi-join of request keys against
        the KV table (feature_store.py:568-587).  Returns one row per
        request row with NULL features on miss, plus ``__found``."""
        path = self._table_path(project, view_name)
        keyed = entity_rows_df.withColumn(_KEY, encode_entity_key(join_keys))
        if not os.path.exists(path):
            out = keyed
            for f in feature_cols:
                out = out.withColumn(f, F.lit(None))
            return (
                out.withColumn("__found", F.lit(False))
                .withColumn(_EVENT_TS, F.lit(None).cast("timestamp"))
                .drop(_KEY)
            )
        store = spark.read.parquet(path).select(
            _KEY, _EVENT_TS, *[F.col(f) for f in feature_cols]
        )
        # Scale path: broadcast the SMALL request-key set to semi-filter the
        # (potentially huge) store; the surviving rows are at most one per
        # request key, so they in turn broadcast for the left join.  The
        # store side streams — it is never shuffled or collected.
        hits = store.join(
            F.broadcast(keyed.select(_KEY).distinct()), on=_KEY, how="leftsemi"
        )
        out = keyed.join(F.broadcast(hits), on=_KEY, how="left")
        return out.withColumn("__found", F.col(_EVENT_TS).isNotNull()).drop(_KEY)
