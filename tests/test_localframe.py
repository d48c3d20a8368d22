"""Round-16 session-2 pins: LocalRelation request frames
(io/localframe.local_df) and the DataFrame-level read memo
(io/pread.read_parquet_memo).

Both are pure performance rewrites — rows, schema and downstream
results must be identical to the classic paths, and the memo must
invalidate on ANY out-of-band change under a memoized path.
"""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from feast_spark.io.localframe import local_df


def _plan_name(df) -> str:
    return df._jdf.queryExecution().logical().getClass().getSimpleName()


def test_local_df_matches_classic_rows_and_schema(spark):
    schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("v", ArrayType(DoubleType())),
            StructField("name", StringType()),
            StructField("cell", IntegerType()),
            StructField("ts", TimestampType()),
        ]
    )
    rows = [
        (1, [1.0, 2.5], "a", 3, datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (None, None, None, None, None),
        (2, [0.5, None], "", 0, datetime.datetime(2021, 6, 7)),
    ]
    a = local_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert a.schema == b.schema
    assert sorted(a.collect(), key=str) == sorted(b.collect(), key=str)
    # the whole point: a LocalRelation, not a pickled-RDD plan
    assert _plan_name(a) == "LocalRelation"


def test_local_df_ddl_empty_and_nested(spark):
    # DDL-string schema
    d = local_df(spark, [(3, 0.5)], "n_docs LONG, avg_len DOUBLE")
    assert _plan_name(d) == "LocalRelation"
    assert d.collect() == [Row(n_docs=3, avg_len=0.5)]
    # empty rows keep the schema
    e = local_df(spark, [], "x LONG, y STRING")
    assert e.collect() == [] and e.columns == ["x", "y"]
    # array<struct> (the probe_cells_df centroid frame shape)
    s = local_df(
        spark,
        [([{"cell": 1, "vec": [1.0, 2.0]}],)],
        "__cents ARRAY<STRUCT<cell: INT, vec: ARRAY<DOUBLE>>>",
    )
    got = s.collect()[0]["__cents"][0]
    assert got["cell"] == 1 and got["vec"] == [1.0, 2.0]
    assert _plan_name(s) == "LocalRelation"


def test_local_df_joins_like_classic(spark):
    """Downstream semantics: broadcast-joining the LocalRelation frame
    gives the same result as the classic frame."""
    schema = "query_id LONG, w DOUBLE"
    rows = [(i, float(i) / 7.0) for i in range(32)]
    big = spark.range(100).select(
        F.col("id").alias("query_id"), (F.col("id") % 7).alias("x")
    )
    a = big.join(F.broadcast(local_df(spark, rows, schema)), "query_id")
    b = big.join(
        F.broadcast(spark.createDataFrame(rows, schema)), "query_id"
    )
    assert sorted(a.collect()) == sorted(b.collect())


def test_local_df_timestamp_values_match_classic_non_utc_session(spark):
    """r17: tz-naive datetimes must mean the same instant on both
    paths.  to_arrow_schema maps TimestampType to timestamp(us, UTC),
    under which pyarrow reads naive datetimes as UTC wall clock while
    classic createDataFrame reads them in the SESSION tz — so under a
    non-UTC session the arrow path must fall back to classic."""
    schema = StructType(
        [StructField("k", LongType()), StructField("ts", TimestampType())]
    )
    rows = [(1, datetime.datetime(2024, 1, 2, 3, 4, 5))]
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        a = local_df(spark, rows, schema)
        b = spark.createDataFrame(rows, schema)
        assert a.collect() == b.collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    # nested timestamps hit the same gate
    from feast_spark.io.localframe import _has_tz_timestamp

    nested = StructType.fromDDL("s STRUCT<t: TIMESTAMP>, a ARRAY<TIMESTAMP>")
    assert _has_tz_timestamp(nested)
    assert not _has_tz_timestamp(StructType.fromDDL("x LONG, t TIMESTAMP_NTZ"))


def test_local_df_wrong_length_rows_raise_like_classic(spark):
    """r17: dict(zip(...)) silently truncated long rows / null-filled
    short ones; malformed caller data must raise like classic."""
    import pytest

    with pytest.raises(Exception):
        local_df(spark, [(1, 2.0, "extra")], "a LONG, b DOUBLE").collect()
    with pytest.raises(Exception):
        local_df(spark, [(1,)], "a LONG, b DOUBLE").collect()


def test_ensure_local_caps_oversized_frames(spark, monkeypatch):
    """r17: a frame past the row cap comes back UNCHANGED (distributed
    plan) instead of being collected onto the driver."""
    import feast_spark.io.localframe as lf

    monkeypatch.setattr(lf, "_ENSURE_LOCAL_MAX_ROWS", 50)
    big = spark.range(51).select(F.col("id").alias("user_id"))
    out = lf.ensure_local(big)
    assert out is big  # untouched: no collect, original plan
    small = spark.range(10).select(F.col("id").alias("user_id"))
    loc = lf.ensure_local(small)
    assert _plan_name(loc) == "LocalRelation"
    assert sorted(r["user_id"] for r in loc.collect()) == list(range(10))


def test_read_memo_returns_same_df_and_sees_new_files(spark, tmp_path):
    from feast_spark.io.pread import read_parquet_memo

    p = str(tmp_path / "t")
    spark.range(5).select(F.col("id").alias("x")).write.parquet(p)
    r1 = read_parquet_memo(spark, p)
    r2 = read_parquet_memo(spark, p)
    # unchanged path: the SAME resolved DataFrame (listing skipped)
    assert r2 is r1
    assert r1.count() == 5

    # out-of-band append INTO the same dir (no overwrite): the memo
    # key walks every file, so the new rows must be visible
    spark.range(3).select((F.col("id") + 100).alias("x")).write.mode(
        "append"
    ).parquet(p)
    r3 = read_parquet_memo(spark, p)
    assert r3 is not r1
    assert r3.count() == 8


def test_read_memo_multi_path_epoch_shape(spark, tmp_path):
    from feast_spark.io.pread import read_parquet_memo

    base = tmp_path / "vectors"
    for e in (0, 1):
        spark.range(4).select(
            F.col("id").alias("v"), F.lit(e).alias("c")
        ).write.parquet(str(base / f"epoch={e}"))
    paths = [str(base / "epoch=0"), str(base / "epoch=1")]
    a = read_parquet_memo(spark, *paths, base_path=str(base))
    b = read_parquet_memo(spark, *paths, base_path=str(base))
    assert b is a
    assert a.count() == 8
    assert "epoch" in a.columns  # partition discovery still applies
