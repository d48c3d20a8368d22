"""Time-series subsequence search vs a DuckDB oracle (same window
frames, same sequential folds, same z-normalization), plus edge
cases."""

import math

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.timeseries import (
    sliding_windows,
    ts_topk_similar,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED

QUERY = [1.0, 2.0, 4.0, 8.0, 4.0, 2.0, 1.0, 0.0]  # a spike pattern
N = len(QUERY)


def test_sliding_windows_shape(spark):
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(5)] + [(2, 0, 9.0)],
        "k long, t long, v double",
    )
    out = sliding_windows(df, "k", "t", "v", 3).collect()
    by = {(r.k, r.t): r["values"] for r in out}
    assert by[(1, 0)] == [0.0, 1.0, 2.0]
    assert by[(1, 2)] == [2.0, 3.0, 4.0]
    assert (1, 3) not in by  # short tail dropped
    assert (2, 0) not in by  # key with < window_len events yields none


def test_ts_topk_oracle(spark, duck):
    ev = load_table(spark, SF_MED, "events")
    out = ts_topk_similar(
        ev, "user_id", "ts", "value", QUERY, k=20, tiebreak_col="event_id"
    ).collect()
    got = [(r.user_id, r.ts.isoformat()) for r in out]

    qm = sum(QUERY) / N
    qs = math.sqrt(sum((x - qm) ** 2 for x in QUERY) / N)
    qn = [(x - qm) / qs for x in QUERY]
    qlit = "[" + ", ".join(repr(x) for x in qn) + "]"
    rows = duck.execute(
        f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(value AS DOUBLE) AS value
      FROM events
    ), w AS (
      SELECT user_id, ts,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND {N - 1} FOLLOWING) AS vals
      FROM e
    ), f AS (
      SELECT * FROM w WHERE len(vals) = {N}
    ), m AS (
      SELECT user_id, ts, vals, list_sum(vals) / {N}.0 AS mu FROM f
    ), s AS (
      SELECT user_id, ts, vals, mu,
             sqrt(list_sum(list_transform(vals, x -> (x - mu) * (x - mu)))
                  / {N}.0) AS sd
      FROM m
    ), nz AS (
      SELECT user_id, ts,
             CASE WHEN sd = 0 THEN list_transform(vals, x -> 0.0)
                  ELSE list_transform(vals, x -> (x - mu) / sd) END AS nv
      FROM s
    )
    SELECT user_id, ts,
           list_sum(list_transform(list_zip(nv, {qlit}),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM nz
    ORDER BY dist, user_id, ts
    LIMIT 20
    """
    ).fetchall()
    want = [(r[0], r[1].isoformat()) for r in rows]
    assert got == want
    # distances agree numerically too
    for spark_row, duck_row in zip(out, rows):
        assert math.isclose(spark_row.dist, duck_row[2], rel_tol=1e-9)


def test_ts_topk_finds_planted_pattern(spark):
    base = [(1, i, 0.5) for i in range(50)]
    planted = list(enumerate(QUERY))
    rows = [
        (k, t, v)
        for k, t, v in base
        if not (10 <= t < 10 + N)
    ] + [(1, 10 + i, v) for i, v in planted] + [(2, i, 3.0) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = ts_topk_similar(df, "user_id", "ts", "value", QUERY, k=1).collect()
    assert out[0].user_id == 1 and out[0].ts == 10
    assert out[0].dist == pytest.approx(0.0, abs=1e-12)


def test_ts_validation(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, v double")
    with pytest.raises(ValueError):
        sliding_windows(df, "k", "t", "v", 0)
    with pytest.raises(ValueError):
        ts_topk_similar(df, "k", "t", "v", [], k=1)
    with pytest.raises(ValueError):
        ts_topk_similar(df, "k", "t", "v", [1.0], k=0)


QUERY2 = [5.0, 1.0, 5.0, 1.0, 5.0, 1.0, 5.0, 1.0]  # alternating pattern


@pytest.mark.nightly
def test_ts_topk_batch_matches_single_query_oracle(spark):
    """The batch API must reproduce the single-query operator's exact
    results per query id (same windows, same normalization, same
    ordering) — the single-query path is itself DuckDB-differentialed
    above, so equality here chains the oracle through."""
    from feast_spark.operators.timeseries import ts_topk_similar_batch

    ev = load_table(spark, SF_MED, "events")
    queries = spark.createDataFrame(
        [("spike", QUERY), ("alt", QUERY2)], "query_id string, pattern array<double>"
    )
    out = ts_topk_similar_batch(
        ev, "user_id", "ts", "value", queries, window_len=N, k=20,
        tiebreak_col="event_id",
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"spike", "alt"}
    for qid, pattern in (("spike", QUERY), ("alt", QUERY2)):
        got = [
            (r["user_id"], r["ts"], round(r["dist"], 9), r["rank"])
            for r in sorted(by_q[qid], key=lambda r: r["rank"])
        ]
        want = [
            (r["user_id"], r["ts"], round(r["dist"], 9), i + 1)
            for i, r in enumerate(
                ts_topk_similar(
                    ev, "user_id", "ts", "value", pattern, k=20,
                    tiebreak_col="event_id",
                ).collect()
            )
        ]
        assert got == want, qid


def test_ts_topk_batch_rejects_mislength_pattern(spark):
    from feast_spark.operators.timeseries import ts_topk_similar_batch

    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(10)], "k long, t long, v double"
    )
    queries = spark.createDataFrame(
        [("bad", [1.0, 2.0])], "query_id string, pattern array<double>"
    )
    with pytest.raises(Exception, match="pattern length"):
        ts_topk_similar_batch(
            df, "k", "t", "v", queries, window_len=4, k=3
        ).collect()


# -- decayed aggregates -------------------------------------------------


def test_decayed_agg_vs_duckdb(spark, duck):
    from datetime import timedelta

    from feast_spark.operators.timeseries import decayed_agg
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    at = "2024-01-20 00:00:00"
    out = {
        r["user_id"]: r
        for r in decayed_agg(
            ev, ["user_id"], "ts", "value",
            half_life=timedelta(days=7), at_time=at,
        ).collect()
    }
    oracle = duck.execute(
        f"""
SELECT user_id,
       sum(value * power(0.5, (epoch(TIMESTAMP '{at}')
           - epoch(CAST(ts AS TIMESTAMP))) / (7*86400.0))) AS s,
       sum(power(0.5, (epoch(TIMESTAMP '{at}')
           - epoch(CAST(ts AS TIMESTAMP))) / (7*86400.0))) AS c
FROM '{SF_SMALL}/events.parquet'
WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '{at}'
GROUP BY user_id
"""
    ).fetchall()
    assert len(oracle) == len(out) > 0
    for uid, s, c in oracle:
        assert out[uid]["decayed_sum"] == pytest.approx(s, rel=1e-9)
        assert out[uid]["decayed_count"] == pytest.approx(c, rel=1e-9)


def test_decayed_agg_mergeable_and_rebase(spark):
    from datetime import timedelta

    from feast_spark.operators.timeseries import decayed_agg, rebase_decayed
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    hl = timedelta(days=7)
    t1, t2 = "2024-01-15 00:00:00", "2024-01-20 00:00:00"

    # partial sums from any slicing add up (at_time fixed)
    full = {
        r["user_id"]: r["decayed_sum"]
        for r in decayed_agg(ev, ["user_id"], "ts", "value", hl, t1).collect()
    }
    a = decayed_agg(
        ev.filter(F.col("event_id") % 2 == 0),
        ["user_id"], "ts", "value", hl, t1,
    )
    b = decayed_agg(
        ev.filter(F.col("event_id") % 2 == 1),
        ["user_id"], "ts", "value", hl, t1,
    )
    merged = (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(F.sum("decayed_sum").alias("s"))
    )
    for r in merged.collect():
        assert r["s"] == pytest.approx(full[r["user_id"]], rel=1e-12)

    # rebasing t1 -> t2 == recomputing at t2 over events up to t1
    upto_t1 = ev.filter(F.col("ts") <= F.lit(t1).cast("timestamp"))
    direct_t2 = {
        r["user_id"]: r["decayed_sum"]
        for r in decayed_agg(
            upto_t1, ["user_id"], "ts", "value", hl, t2
        ).collect()
    }
    rebased = rebase_decayed(
        decayed_agg(upto_t1, ["user_id"], "ts", "value", hl, t1),
        ["decayed_sum", "decayed_count"], t1, t2, hl,
    )
    for r in rebased.collect():
        assert r["decayed_sum"] == pytest.approx(
            direct_t2[r["user_id"]], rel=1e-12
        )


def test_decayed_agg_excludes_future(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    from feast_spark.operators.timeseries import decayed_agg

    df = spark.createDataFrame(
        [
            Row(k=1, ts=datetime(2024, 1, 1), v=10.0),
            Row(k=1, ts=datetime(2024, 1, 8), v=20.0),   # == at_time
            Row(k=1, ts=datetime(2024, 2, 1), v=999.0),  # future: excluded
        ]
    )
    row = decayed_agg(
        df, ["k"], "ts", "v",
        half_life=timedelta(days=7), at_time=datetime(2024, 1, 8),
    ).collect()[0]
    # 10 * 0.5^(7d/7d) + 20 * 0.5^0 = 5 + 20
    assert row["decayed_sum"] == pytest.approx(25.0, rel=1e-12)
    assert row["decayed_count"] == pytest.approx(1.5, rel=1e-12)


@pytest.mark.nightly
def test_decayed_feature_table_stream_equals_batch(spark, tmp_path):
    """Any batching of the same events — chronological increments,
    micro-batches, or a late out-of-order slice — converges to the
    one-shot decayed_agg state at the same evaluation point."""
    from datetime import timedelta

    from feast_spark.operators.timeseries import (
        DecayedFeatureTable,
        decayed_agg,
    )
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    hl = timedelta(days=7)
    final_at = ev.agg(F.max("ts")).collect()[0][0]
    want = {
        r["user_id"]: r["decayed_sum"]
        for r in decayed_agg(
            ev, ["user_id"], "ts", "value", hl, final_at
        ).collect()
    }

    # chronological thirds via foreach_batch_writer
    t1 = DecayedFeatureTable(
        str(tmp_path / "a"), ["user_id"], "ts", "value", hl
    )
    fn = t1.foreach_batch_writer(spark)
    fn(ev.filter(F.col("ts") < F.lit("2024-01-10").cast("timestamp")), 0)
    fn(ev.filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))), 1)
    fn(ev.filter(F.col("ts") >= F.lit("2024-01-20").cast("timestamp")), 2)
    got1 = {r["user_id"]: r["decayed_sum"]
            for r in t1.features(spark).collect()}
    assert set(got1) == set(want)
    for k, v in want.items():
        assert got1[k] == pytest.approx(v, rel=1e-9)

    # out-of-order: the middle slice arrives LAST (late data)
    t2 = DecayedFeatureTable(
        str(tmp_path / "b"), ["user_id"], "ts", "value", hl
    )
    t2.update(spark, ev.filter(F.col("ts") < F.lit("2024-01-10").cast("timestamp")))
    t2.update(spark, ev.filter(F.col("ts") >= F.lit("2024-01-20").cast("timestamp")))
    t2.update(spark, ev.filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))))
    got2 = {r["user_id"]: r["decayed_sum"]
            for r in t2.features(spark).collect()}
    for k, v in want.items():
        assert got2[k] == pytest.approx(v, rel=1e-9)


@pytest.mark.nightly
def test_decayed_feature_table_serve_forward_only(spark, tmp_path):
    from datetime import timedelta

    from feast_spark.operators.timeseries import (
        DecayedFeatureTable,
        decayed_agg,
    )
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    hl = timedelta(days=7)
    table = DecayedFeatureTable(
        str(tmp_path / "sv"), ["user_id"], "ts", "value", hl
    )
    with pytest.raises(ValueError):
        table.features(spark)
    table.update(spark, ev)
    as_of = ev.agg(F.max("ts")).collect()[0][0]
    later = "2024-02-15 00:00:00"
    served = {r["user_id"]: r["decayed_sum"]
              for r in table.features(spark, later).collect()}
    direct = {r["user_id"]: r["decayed_sum"]
              for r in decayed_agg(
                  ev, ["user_id"], "ts", "value", hl, later
              ).collect()}
    for k, v in direct.items():
        assert served[k] == pytest.approx(v, rel=1e-9)
    # rewinding before as_of is refused
    with pytest.raises(ValueError):
        table.features(spark, "2024-01-01 00:00:00")


@pytest.mark.nightly
def test_decayed_table_string_at_time_and_future_guard(spark, tmp_path):
    from datetime import timedelta

    from feast_spark.operators.timeseries import DecayedFeatureTable
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    table = DecayedFeatureTable(
        str(tmp_path / "st"), ["user_id"], "ts", "value", timedelta(days=7)
    )
    early = ev.filter(F.col("ts") < F.lit("2024-01-10").cast("timestamp"))
    # ISO-string at_time works on the FIRST and SECOND update (the
    # second compares against the stored datetime as_of)
    table.update(spark, early, at_time="2024-01-10 00:00:00")
    table.update(spark, early, at_time="2024-01-12 00:00:00")
    assert table.features(spark).count() > 0
    # an at_time earlier than the slice's max event is rejected, not
    # silently dropped
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precedes the slice"):
        table.update(spark, ev, at_time="2024-01-05 00:00:00")


@pytest.mark.nightly
def test_decayed_foreach_batch_replay_is_idempotent(spark, tmp_path):
    """At-least-once epoch replay must not double-count."""
    from datetime import timedelta

    from feast_spark.operators.timeseries import DecayedFeatureTable

    ev_small = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-02 00:00:00", 20.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    table = DecayedFeatureTable(
        str(tmp_path / "rp"), ["user_id"], "ts", "value", timedelta(days=7)
    )
    fn = table.foreach_batch_writer(spark)
    fn(ev_small, 0)
    once = table.features(spark).collect()[0]["decayed_sum"]
    fn(ev_small, 0)  # crash-restart replay of the same epoch
    again = table.features(spark).collect()[0]["decayed_sum"]
    assert once == again
    fn(ev_small, 1)  # a genuinely new epoch DOES fold in
    assert table.features(spark).collect()[0]["decayed_sum"] > once
