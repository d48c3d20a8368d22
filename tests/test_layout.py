"""Layout maintenance: compaction file counts, clustering produces
disjoint per-file key ranges (the min/max pruning precondition), and
z-order gives every participating column locality for equality
predicates."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.layout import (
    cluster_by,
    compact,
    layout_stats,
    overlap_fraction,
    zorder_key,
)


@pytest.fixture(scope="module")
def scattered(spark, tmp_path_factory):
    """200 tiny files, each containing rows across the whole key
    range — the worst layout for pruning."""
    path = str(tmp_path_factory.mktemp("layout") / "scattered")
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("user_id"),
        (F.col("id") % 37).alias("day"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(200).write.mode("overwrite").parquet(path)
    return path


def test_compact_reduces_file_count(spark, scattered, tmp_path):
    out = str(tmp_path / "compacted")
    n = compact(spark, scattered, out, target_file_mb=512)
    assert n <= 4  # ~2 MB of data: far fewer than 200 files
    a = spark.read.parquet(scattered).orderBy("k").collect()
    b = spark.read.parquet(out).orderBy("k").collect()
    assert a == b  # rewrite is content-preserving


def test_cluster_by_makes_disjoint_ranges(spark, scattered, tmp_path):
    out = str(tmp_path / "clustered")
    cluster_by(spark.read.parquet(scattered), out, ["k"], n_files=8)
    stats = layout_stats(spark, out, ["k"])
    assert stats.count() >= 2
    # each file covers a narrow k-range: pairwise overlap ~ 0
    assert overlap_fraction(stats, "k") == 0.0
    # the scattered input, for contrast, overlaps everywhere
    base = layout_stats(spark, scattered, ["k"])
    assert overlap_fraction(base, "k") == 1.0


def test_cluster_by_prunes_row_groups(spark, scattered, tmp_path):
    """A point predicate on the cluster key reads back correctly and
    the scan carries the pushed filter (file skipping happens below
    the plan via parquet min/max)."""
    from feast_spark.plans import explain_formatted

    out = str(tmp_path / "clustered2")
    cluster_by(spark.read.parquet(scattered), out, ["k"], n_files=8)
    q = spark.read.parquet(out).where(F.col("k") == 12345)
    plan = explain_formatted(q)
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,12345)]" in plan
    assert q.count() == 1


def test_zorder_equality_locality(spark, scattered, tmp_path):
    """Z-order on (user_id, day): rows sharing either key value land
    in few files — both dimensions get pruning leverage."""
    out = str(tmp_path / "zordered")
    cluster_by(
        spark.read.parquet(scattered), out, ["user_id", "day"],
        n_files=16, zorder=True,
    )
    df = spark.read.parquet(out).withColumn("f", F.input_file_name())
    total_files = df.select("f").distinct().count()
    assert total_files >= 8
    # every row of one user_id sits in a small file subset
    files_per_user = (
        df.groupBy("user_id").agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf")).collect()[0][0]
    )
    files_per_day = (
        df.groupBy("day").agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf")).collect()[0][0]
    )
    assert files_per_user < total_files
    assert files_per_day < total_files
    # content preserved
    assert df.count() == 20_000


def test_zorder_key_determinism_and_bounds(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    out1 = df.select(zorder_key(["a", "b"]).alias("z")).collect()
    out2 = df.select(zorder_key(["a", "b"]).alias("z")).collect()
    assert out1 == out2
    assert all(r["z"] >= 0 for r in out1)
    with pytest.raises(ValueError, match="zorder"):
        zorder_key(["a", "b", "c", "d", "e"])  # 5 * 16 > 63 bits
