"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implemented operators are inventoried in SURVEY.md §2; each entry here
cites the operator ids it covers.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.asof_join import AsOfJoinSpec, as_of_join
from feast_spark.operators.dedup import latest_per_key, time_range_filter
from feast_spark.sources.testdata import load_table

SF_SMALL = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _entity_and_feature_frames(spark: SparkSession, sf_dir: str):
    """purchases = the entity frame (the 'query'); views = the feature
    stream, keyed by user_id."""
    events = load_table(spark, sf_dir, "events")
    entity = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return entity, views, clicks


# ---------------------------------------------------------------------------
# queries (J1/J2/A1/A2/P1/P2/P3 ...)
# ---------------------------------------------------------------------------

def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — single-view point-in-time join with ttl (SURVEY §2.1)."""
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
            )
        ],
    ).select("event_id", "user_id", "ts", F.col("value").alias("view_value"))


def q_pit_join_no_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — as-of join, unbounded lower bound (ttl=None)."""
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
            )
        ],
    ).select("event_id", "user_id", "ts", F.col("value").alias("view_value"))


def q_pit_join_multiview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — multi-view composition with full_feature_names prefixes (P2)."""
    entity, views, clicks = _entity_and_feature_frames(spark, sf_dir)
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
                prefix="views",
            ),
            AsOfJoinSpec(
                feature_df=clicks,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=7),
                prefix="clicks",
            ),
        ],
    ).select("event_id", "user_id", "ts", "views__value", "clicks__value")


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — latest-per-key dedup (materialization pull-latest)."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(
        events.select("user_id", "event_type", "ts", "value"),
        ["user_id", "event_type"],
        "ts",
    )


def q_latest_per_key_created(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 — created_timestamp tie-break: union the events with a
    doctored copy at the SAME event_ts but later created_ts; the copy
    must win."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    v1 = events.withColumn("created", F.lit(1).cast("long"))
    v2 = events.withColumn("value", F.col("value") * 2).withColumn(
        "created", F.lit(2).cast("long")
    )
    both = v1.unionByName(v2)
    return latest_per_key(both, ["user_id"], "ts", created_col="created")


def q_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — half-open time-range filter [start, end)."""
    from datetime import datetime

    events = load_table(spark, sf_dir, "events")
    return time_range_filter(
        events.select("event_id", "ts", "user_id", "value"),
        "ts",
        start=datetime(2024, 1, 10),
        end=datetime(2024, 1, 20),
    )


def q_field_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 — field_mapping rename + feature selection."""
    from feast_spark.data_source import FileSource

    src = FileSource(
        path=f"{sf_dir}/customer.parquet",
        field_mapping={"c_custkey": "customer_id", "c_acctbal": "balance"},
    )
    df = src.load(spark)
    return df.select("customer_id", "balance", "c_mktsegment")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pit_join_multiview(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pit_join": q_pit_join,
        "pit_join_no_ttl": q_pit_join_no_ttl,
        "pit_join_multiview": q_pit_join_multiview,
        "latest_per_key": q_latest_per_key,
        "latest_per_key_created": q_latest_per_key_created,
        "time_range_filter": q_time_range_filter,
        "field_mapping": q_field_mapping,
    }


# All oracle timestamps are CAST to µs-precision TIMESTAMP up front so the
# comparison domain matches Spark's (which truncates the parquet ns column).
_PIT_ORACLE = """
WITH entity AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), feat AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'view'
), ranked AS (
  SELECT e.event_id, e.user_id, e.ts,
         f.value, f.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY f.ts DESC) rn
  FROM entity e
  LEFT JOIN feat f
    ON e.user_id = f.user_id AND f.ts <= e.ts {ttl_pred}
)
SELECT event_id, user_id, ts,
       CASE WHEN fts IS NULL THEN NULL ELSE value END AS view_value
FROM ranked WHERE rn = 1
"""


def oracle_sql() -> dict[str, str]:
    return {
        "pit_join": _PIT_ORACLE.format(
            ttl_pred="AND f.ts >= e.ts - INTERVAL 2 DAY"
        ),
        "pit_join_no_ttl": _PIT_ORACLE.format(ttl_pred=""),
        "pit_join_multiview": """
WITH entity AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'),
rv AS (
  SELECT e.event_id, v.value, v.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY v.ts DESC) rn
  FROM entity e
  LEFT JOIN v ON e.user_id = v.user_id AND v.ts <= e.ts
             AND v.ts >= e.ts - INTERVAL 2 DAY
),
rc AS (
  SELECT e.event_id, c.value, c.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY c.ts DESC) rn
  FROM entity e
  LEFT JOIN c ON e.user_id = c.user_id AND c.ts <= e.ts
             AND c.ts >= e.ts - INTERVAL 7 DAY
)
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN rv.fts IS NULL THEN NULL ELSE rv.value END AS views__value,
       CASE WHEN rc.fts IS NULL THEN NULL ELSE rc.value END AS clicks__value
FROM entity e
LEFT JOIN rv ON rv.event_id = e.event_id AND rv.rn = 1
LEFT JOIN rc ON rc.event_id = e.event_id AND rc.rn = 1
""",
        "latest_per_key": """
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
FROM (
  SELECT user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC) rn
  FROM events
) WHERE rn = 1
""",
        "latest_per_key_created": """
WITH both_v AS (
  SELECT user_id, ts, value, CAST(1 AS BIGINT) AS created FROM events
  UNION ALL
  SELECT user_id, ts, value * 2 AS value, CAST(2 AS BIGINT) AS created FROM events
)
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, created
FROM (
  SELECT user_id, ts, value, created,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, created DESC) rn
  FROM both_v
) WHERE rn = 1
""",
        "time_range_filter": """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
""",
        "field_mapping": """
SELECT c_custkey AS customer_id, c_acctbal AS balance, c_mktsegment
FROM customer
""",
    }
