"""Grid resampling + gap fill: DuckDB differential over the events
table, hand-built gap/ffill fixtures, validation."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.resample import resample
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED


def _rows(df):
    return sorted(
        (
            tuple(
                round(v, 6) if isinstance(v, float) else v for v in r
            )
        )
        for r in ((row[c] for c in df.columns) for row in df.collect())
    )


def test_resample_matches_duckdb(spark, duck):
    """Hourly per-user grid over real events: bucket floor, sum/avg/
    count/last aggregates, dense per-key sequence — all mirrored in
    DuckDB SQL."""
    events = load_table(spark, SF_MED, "events")
    got = resample(
        events,
        ["user_id"],
        "ts",
        3600,
        {
            "total": ("value", "sum"),
            "mean_v": ("value", "avg"),
            "n": ("value", "count"),
            "last_v": ("value", "last"),
        },
    )
    want = duck.execute("""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600)::BIGINT * 3600 AS b
      FROM events WHERE ts IS NOT NULL
    ),
    per_bucket AS (
      SELECT user_id, b,
             SUM(value) AS total,
             AVG(value) AS mean_v,
             COUNT(value) AS n,
             LAST(value ORDER BY ts, value) AS last_v
      FROM ev GROUP BY user_id, b
    ),
    bounds AS (
      SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM per_bucket
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, UNNEST(generate_series(lo, hi, 3600)) AS b
      FROM bounds
    )
    SELECT g.user_id, to_timestamp(g.b) AS bucket_ts,
           p.total, p.mean_v, p.n, p.last_v
    FROM grid g LEFT JOIN per_bucket p USING (user_id, b)
    """).fetchall()

    got_rows = sorted(
        (
            r["user_id"],
            r["bucket_ts"],
            round(r["total"], 6) if r["total"] is not None else None,
            round(r["mean_v"], 6) if r["mean_v"] is not None else None,
            r["n"],
            round(r["last_v"], 6) if r["last_v"] is not None else None,
        )
        for r in got.collect()
    )
    want_rows = sorted(
        (
            u,
            ts.replace(tzinfo=None),
            round(t, 6) if t is not None else None,
            round(m, 6) if m is not None else None,
            n,
            round(lv, 6) if lv is not None else None,
        )
        for (u, ts, t, m, n, lv) in want
    )
    assert len(got_rows) == len(want_rows) > 0
    assert got_rows == want_rows
    # the grid is genuinely dense: more rows than observed buckets
    observed = (
        events.filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / 3600)).alias("b"),
        )
        .distinct()
        .count()
    )
    assert len(got_rows) >= observed


def test_resample_ffill_and_zero(spark):
    rows = [
        (1, "2024-01-01 00:00:05", 10.0),
        (1, "2024-01-01 00:00:55", 20.0),  # same bucket as above
        (1, "2024-01-01 00:03:10", 7.0),   # 2-bucket gap before this
        (2, "2024-01-01 00:01:30", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    plain = {
        (r["k"], r["bucket_ts"].isoformat()): (r["total"], r["last_v"])
        for r in resample(
            df, ["k"], "ts", 60,
            {"total": ("v", "sum"), "last_v": ("v", "last")},
        ).collect()
    }
    assert plain[(1, "2024-01-01T00:00:00")] == (30.0, 20.0)
    assert plain[(1, "2024-01-01T00:01:00")] == (None, None)  # gap
    assert plain[(1, "2024-01-01T00:02:00")] == (None, None)  # gap
    assert plain[(1, "2024-01-01T00:03:00")] == (7.0, 7.0)
    assert plain[(2, "2024-01-01T00:01:00")] == (5.0, 5.0)
    assert len(plain) == 5  # key 2's grid is its single bucket

    ff = {
        (r["k"], r["bucket_ts"].isoformat()): r["last_v"]
        for r in resample(
            df, ["k"], "ts", 60, {"last_v": ("v", "last")}, fill="ffill"
        ).collect()
    }
    assert ff[(1, "2024-01-01T00:01:00")] == 20.0  # carried forward
    assert ff[(1, "2024-01-01T00:02:00")] == 20.0
    assert ff[(1, "2024-01-01T00:03:00")] == 7.0   # real value wins

    z = {
        (r["k"], r["bucket_ts"].isoformat()): r["total"]
        for r in resample(
            df, ["k"], "ts", 60, {"total": ("v", "sum")}, fill="zero"
        ).collect()
    }
    assert z[(1, "2024-01-01T00:01:00")] == 0.0
    assert z[(1, "2024-01-01T00:02:00")] == 0.0


def test_resample_explicit_bounds_align_keys(spark):
    from datetime import datetime

    rows = [
        (1, "2024-01-01 00:00:30", 1.0),
        (2, "2024-01-01 00:02:30", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(
        df, ["k"], "ts", 60, {"n": ("v", "count")},
        start=datetime(2024, 1, 1, 0, 0),
        end=datetime(2024, 1, 1, 0, 4),  # exclusive -> buckets 0..3
        fill="zero",
    ).collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r["bucket_ts"].isoformat())
    assert len(per_key[1]) == len(per_key[2]) == 4  # identical grids
    assert min(per_key[1]) == "2024-01-01T00:00:00"
    assert max(per_key[1]) == "2024-01-01T00:03:00"
    # counts: key 1 only in bucket 0, key 2 only in bucket 2, zeros elsewhere
    n = {(r["k"], r["bucket_ts"].minute): r["n"] for r in out}
    assert n[(1, 0)] == 1 and n[(1, 1)] == 0
    assert n[(2, 2)] == 1 and n[(2, 3)] == 0


def test_resample_validation(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="interval_seconds"):
        resample(df, ["k"], "ts", 0, {"n": ("v", "count")})
    with pytest.raises(ValueError, match="fill"):
        resample(df, ["k"], "ts", 60, {"n": ("v", "count")}, fill="bfill")
    with pytest.raises(ValueError, match="at least one"):
        resample(df, ["k"], "ts", 60, {})
    with pytest.raises(ValueError, match="unknown agg fn"):
        resample(df, ["k"], "ts", 60, {"n": ("v", "median")})
    with pytest.raises(ValueError, match="collides"):
        resample(df, ["k"], "ts", 60, {"k": ("v", "sum")})
    with pytest.raises(ValueError, match="both start and end"):
        from datetime import datetime

        resample(
            df, ["k"], "ts", 60, {"n": ("v", "count")},
            start=datetime(2024, 1, 1),
        )


def test_resample_interp(spark):
    rows = [
        (1, "2024-01-01 00:00:30", 10.0),
        (1, "2024-01-01 00:03:30", 40.0),  # buckets 1,2 are gaps
        (1, "2024-01-01 00:04:30", None),  # null value: bucket exists, no obs
    ]
    df = spark.createDataFrame(
        rows, "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["bucket_ts"].minute: r["lv"]
        for r in resample(
            df, ["k"], "ts", 60, {"lv": ("v", "last")}, fill="interp"
        ).collect()
    }
    assert got[0] == 10.0
    assert got[1] == pytest.approx(20.0)  # linear between 10@b0 and 40@b3
    assert got[2] == pytest.approx(30.0)
    assert got[3] == 40.0
    assert got[4] == 40.0  # trailing gap carries last value

    # leading gap stays NULL under explicit bounds
    from datetime import datetime

    got2 = {
        r["bucket_ts"].minute: r["lv"]
        for r in resample(
            df, ["k"], "ts", 60, {"lv": ("v", "last")},
            start=datetime(2024, 1, 1, 0, 0) - __import__("datetime").timedelta(minutes=2),
            end=datetime(2024, 1, 1, 0, 5),
            fill="interp",
        ).collect()
    }
    assert got2[58] is None and got2[59] is None  # leading
    assert got2[1] == pytest.approx(20.0)


def test_resample_properties(spark):
    """Property sweep over random event sets: the grid is dense and
    contiguous per key, un-filled sums are preserved, and ffill never
    changes observed buckets."""
    import random

    rng = random.Random(7)
    rows = [
        (
            rng.randrange(5),
            f"2024-01-0{rng.randrange(1, 5)} "
            f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:00",
            round(rng.uniform(-100, 100), 3),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        rows, "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(
        df, ["k"], "ts", 3600, {"s": ("v", "sum"), "n": ("v", "count")}
    )
    rows_out = out.collect()
    # sum preserved
    total = sum(r["s"] for r in rows_out if r["s"] is not None)
    assert total == pytest.approx(sum(v for _, _, v in rows), abs=1e-6)
    assert sum(r["n"] or 0 for r in rows_out) == len(rows)
    # dense + contiguous per key
    per_key = {}
    for r in rows_out:
        per_key.setdefault(r["k"], []).append(int(r["bucket_ts"].timestamp()))
    for k, bs in per_key.items():
        bs = sorted(bs)
        assert bs == list(range(bs[0], bs[-1] + 3600, 3600)), k
    # ffill preserves observed buckets
    ff = {
        (r["k"], r["bucket_ts"]): r["s"]
        for r in resample(
            df, ["k"], "ts", 3600, {"s": ("v", "sum")}, fill="ffill"
        ).collect()
    }
    for r in rows_out:
        if r["s"] is not None:
            assert ff[(r["k"], r["bucket_ts"])] == pytest.approx(r["s"])


def test_resample_rejects_inverted_bounds(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="must be after"):
        resample(
            df, ["k"], "ts", 60, {"n": ("v", "count")},
            start=datetime(2024, 1, 2), end=datetime(2024, 1, 1),
        )
    with pytest.raises(ValueError, match="must be after"):
        resample(
            df, ["k"], "ts", 60, {"n": ("v", "count")},
            start=datetime(2024, 1, 1), end=datetime(2024, 1, 1),
        )


def test_resample_string_bounds_not_lexicographically_rejected(spark):
    """Non-zero-padded date strings ('2024-9-01' < '2024-10-01'
    chronologically but not lexicographically) must reach Spark's
    cast, not the driver-side guard."""
    df = spark.createDataFrame(
        [(1, "2024-09-15 00:00:30", 1.0)], "k INT, ts STRING, v DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(
        df, ["k"], "ts", 86400, {"n": ("v", "count")},
        start="2024-9-01", end="2024-10-01", fill="zero",
    )
    assert out.count() == 30  # September days
