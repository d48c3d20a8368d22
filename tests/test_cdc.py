"""Changelog application: MERGE-INTO semantics vs a DuckDB oracle,
idempotence/order-insensitivity, delete-wins ties, and the
map-side-combine plan shape."""

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import Row

from feast_spark.operators.cdc import apply_changelog


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def data(spark):
    base = spark.createDataFrame(
        [
            Row(k=1, v="base1", ts=ts("2024-01-01 00:00:00")),
            Row(k=2, v="base2", ts=ts("2024-01-01 00:00:00")),
            Row(k=3, v="base3", ts=ts("2024-01-01 00:00:00")),
        ]
    )
    changes = spark.createDataFrame(
        [
            # k=1: update then delete -> gone
            Row(k=1, v="u1", ts=ts("2024-01-02 00:00:00"), op="update"),
            Row(k=1, v=None, ts=ts("2024-01-03 00:00:00"), op="delete"),
            # k=2: two updates -> newest wins
            Row(k=2, v="u2a", ts=ts("2024-01-02 00:00:00"), op="upsert"),
            Row(k=2, v="u2b", ts=ts("2024-01-04 00:00:00"), op="u"),
            # k=3: stale change OLDER than base -> base survives
            Row(k=3, v="old", ts=ts("2023-12-01 00:00:00"), op="update"),
            # k=4: insert of a new key
            Row(k=4, v="new4", ts=ts("2024-01-02 00:00:00"), op="insert"),
            # k=5: delete of a key that never existed -> nothing
            Row(k=5, v=None, ts=ts("2024-01-02 00:00:00"), op="d"),
        ]
    )
    return base, changes


def test_apply_changelog_matches_duckdb_merge(spark, data):
    base, changes = data
    got = sorted(
        (r["k"], r["v"]) for r in
        apply_changelog(base, changes, ["k"], "ts").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (k BIGINT, v VARCHAR, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO base VALUES (?, ?, ?)",
        [(r["k"], r["v"], r["ts"]) for r in base.collect()],
    )
    con.execute(
        "CREATE TABLE ch (k BIGINT, v VARCHAR, ts TIMESTAMP, op VARCHAR)"
    )
    con.executemany(
        "INSERT INTO ch VALUES (?, ?, ?, ?)",
        [(r["k"], r["v"], r["ts"], r["op"]) for r in changes.collect()],
    )
    want = sorted(
        con.execute(
            """
WITH u AS (
  SELECT k, v, ts, 'upsert' AS op FROM base
  UNION ALL
  SELECT k, v, ts,
         CASE WHEN lower(op) IN ('delete','remove','d') THEN 'delete'
              ELSE 'upsert' END
  FROM ch
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY k
    ORDER BY ts DESC, (op = 'delete') DESC) rn
  FROM u
)
SELECT k, v FROM ranked WHERE rn = 1 AND op = 'upsert'
"""
        ).fetchall()
    )
    assert got == want
    assert got == [(2, "u2b"), (3, "base3"), (4, "new4")]


def test_idempotent_and_order_insensitive(spark, data):
    base, changes = data
    once = sorted(
        map(tuple, apply_changelog(base, changes, ["k"], "ts").collect())
    )
    # replay the changelog onto the already-applied snapshot
    snap = apply_changelog(base, changes, ["k"], "ts")
    twice = sorted(
        map(tuple, apply_changelog(snap, changes, ["k"], "ts").collect())
    )
    assert once == twice
    # shuffled application order
    reordered = sorted(
        map(
            tuple,
            apply_changelog(
                base, changes.orderBy("v"), ["k"], "ts"
            ).collect(),
        )
    )
    assert once == reordered


def test_delete_wins_full_tie(spark):
    base = None
    changes = spark.createDataFrame(
        [
            Row(k=1, v="up", ts=ts("2024-01-01 00:00:00"), op="upsert"),
            Row(k=1, v=None, ts=ts("2024-01-01 00:00:00"), op="delete"),
        ]
    )
    out = apply_changelog(base, changes, ["k"], "ts").collect()
    assert out == []


def test_no_base_compacts_changelog(spark, data):
    _, changes = data
    got = sorted(
        (r["k"], r["v"]) for r in
        apply_changelog(None, changes, ["k"], "ts").collect()
    )
    # without a base, k=3's lone (previously-stale) upsert IS the
    # newest change for its key and survives; k=1's delete still wins
    assert got == [(2, "u2b"), (3, "old"), (4, "new4")]
