

def test_staleness_profile(spark, tmp_path):
    """Serving-freshness quantiles over the snapshot: deterministic
    given an explicit now; empty/missing views report zero keys."""
    from datetime import datetime

    from pyspark.sql import Row

    from feast_spark.online.store import OnlineStore

    store = OnlineStore(str(tmp_path / "os"))
    df = spark.createDataFrame(
        [Row(k=i, v=float(i), ts=datetime(2024, 1, 1, i)) for i in range(10)]
    )
    store.online_write_batch(spark, "p", "v1", df, ["k"], "ts", None, ["v"])
    prof = store.staleness(spark, "p", "v1", datetime(2024, 1, 2))
    assert prof["n_keys"] == 10
    # ages span [15h, 24h]; quantiles ordered and bounded
    assert 15 * 3600 <= prof["age_p50_s"] <= prof["age_p90_s"]
    assert prof["age_p90_s"] <= prof["age_p99_s"] <= prof["age_max_s"]
    assert prof["age_max_s"] == 24 * 3600
    empty = store.staleness(spark, "p", "missing", datetime(2024, 1, 2))
    assert empty == {
        "n_keys": 0, "age_p50_s": None, "age_p90_s": None,
        "age_p99_s": None, "age_max_s": None,
    }
