"""SQLite / Redis online stores: newest-wins upsert, typed payload
roundtrip, multiget point lookups, and end-to-end offline/online
consistency through the FeatureStore facade (the reference's
test_online_retrieval + test_offline_online_store_consistency patterns
against infra/online_stores/{sqlite,redis}.py)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from feast_spark.online.kv import RedisOnlineStore, SqliteOnlineStore


def _ts(s):
    return datetime.fromisoformat(s)


class FakeRedis:
    """Dict-backed redis-py subset: pipeline/hset/hget/get/set."""

    def __init__(self):
        self.kv: dict = {}
        self.hashes: dict = {}

    def set(self, k, v):
        self.kv[k] = v

    def get(self, k):
        return self.kv.get(k)

    def pipeline(self):
        return FakePipeline(self)


class FakePipeline:
    def __init__(self, r):
        self.r = r
        self.ops = []

    def hget(self, k, f):
        self.ops.append(("hget", k, f))
        return self

    def hset(self, k, mapping):
        self.ops.append(("hset", k, mapping))
        return self

    def execute(self):
        out = []
        for op in self.ops:
            if op[0] == "hget":
                out.append(self.r.hashes.get(op[1], {}).get(op[2]))
            else:
                self.r.hashes.setdefault(op[1], {}).update(op[2])
                out.append(True)
        self.ops = []
        return out


def _mk_store(kind, tmp_path):
    if kind == "sqlite":
        return SqliteOnlineStore(str(tmp_path / "online.db"))
    return RedisOnlineStore(FakeRedis())


def _write(store, spark, rows, features=("value",)):
    df = spark.createDataFrame(rows)
    store.online_write_batch(
        spark, "p", "v", df, ["driver_id"], "ts", None, list(features)
    )


def _read(store, spark, ids, features=("value",)):
    req = spark.createDataFrame([Row(driver_id=i) for i in ids])
    out = store.online_read(spark, "p", "v", req, ["driver_id"], list(features))
    return {r["driver_id"]: r for r in out.collect()}


@pytest.mark.parametrize("kind", ["sqlite", "redis"])
def test_newest_wins_upsert(spark, tmp_path, kind):
    store = _mk_store(kind, tmp_path)
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-02T00:00"), value=2.0)])
    # older batch arrives late: must NOT overwrite
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-01T00:00"), value=1.0)])
    # newer batch: must overwrite
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-03T00:00"), value=3.0),
                          Row(driver_id=2, ts=_ts("2024-01-01T00:00"), value=9.0)])
    got = _read(store, spark, [1, 2, 7])
    assert got[1]["value"] == pytest.approx(3.0)
    assert got[1]["__found"] is True
    assert got[2]["value"] == pytest.approx(9.0)
    assert got[7]["value"] is None
    assert got[7]["__found"] is False


@pytest.mark.parametrize("kind", ["sqlite", "redis"])
def test_typed_payload_roundtrip(spark, tmp_path, kind):
    """Arrays, strings and timestamps survive the JSON payload."""
    store = _mk_store(kind, tmp_path)
    rows = [
        Row(
            driver_id=1,
            ts=_ts("2024-01-01T10:30:15.123456"),
            emb=[1.5, -2.25],
            tag="a|b",
        )
    ]
    _write(store, spark, rows, features=("emb", "tag"))
    got = _read(store, spark, [1], features=("emb", "tag"))
    assert got[1]["emb"] == [1.5, -2.25]
    assert got[1]["tag"] == "a|b"
    assert got[1]["__event_ts"] == _ts("2024-01-01T10:30:15.123456")


@pytest.mark.parametrize("kind", ["sqlite", "redis"])
def test_batch_collapses_before_driver(spark, tmp_path, kind):
    """Many source rows per key -> exactly the latest lands in the KV
    (the distributed latest_per_key ran before toLocalIterator)."""
    store = _mk_store(kind, tmp_path)
    rows = [
        Row(driver_id=1, ts=_ts("2024-01-01T00:00") + timedelta(minutes=m),
            value=float(m))
        for m in range(50)
    ]
    _write(store, spark, rows)
    assert _read(store, spark, [1])[1]["value"] == pytest.approx(49.0)
    if kind == "sqlite":
        n = store._get_conn().execute('SELECT COUNT(*) FROM "p_v"').fetchone()[0]
        assert n == 1


def test_sqlite_feature_store_e2e(spark, tmp_path):
    """Full facade flow on online_store_type='sqlite': materialize then
    serve, matching the parquet-backed answers."""
    from feast_spark import (
        Entity,
        FeatureStore,
        FeatureView,
        FileSource,
        RepoConfig,
        ValueType,
    )

    now = _ts("2021-06-01T12:00:00")
    rows = [
        Row(id=1, value=0.1, ts_1=now - timedelta(hours=4)),
        Row(id=1, value=0.3, ts_1=now - timedelta(hours=3)),
        Row(id=3, value=4.0, ts_1=now - timedelta(hours=4)),
        Row(id=3, value=5.0, ts_1=now - timedelta(hours=1)),
    ]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows).write.parquet(src)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="t",
            registry_path=str(tmp_path / "registry.json"),
            online_store_path=str(tmp_path / "online.db"),
            online_store_type="sqlite",
        ),
    )
    st.apply(
        [
            Entity(name="driver", join_key="driver_id", value_type=ValueType.INT64),
            FeatureView(
                name="simple_fv",
                entities=["driver"],
                ttl=timedelta(days=5),
                batch_source=FileSource(
                    path=src,
                    event_timestamp_column="ts",
                    field_mapping={"ts_1": "ts", "id": "driver_id"},
                ),
            ),
        ]
    )
    st.materialize(now - timedelta(hours=5), now - timedelta(hours=2))
    resp = st.get_online_features(
        ["simple_fv:value"], [{"driver_id": 1}, {"driver_id": 3}]
    )
    assert resp["value"][0] == pytest.approx(0.3)
    assert resp["value"][1] == pytest.approx(4.0)  # 5.0 outside window
    st.materialize_incremental(now)
    resp2 = st.get_online_features(["simple_fv:value"], [{"driver_id": 3}])
    assert resp2["value"][0] == pytest.approx(5.0)


def test_unknown_backend_rejected(spark, tmp_path):
    from feast_spark import FeatureStore, RepoConfig

    with pytest.raises(ValueError, match="online_store_type"):
        FeatureStore(
            spark,
            RepoConfig(
                registry_path=str(tmp_path / "r.json"),
                online_store_type="dynamo",
            ),
        )


def test_delete_feature_view_and_teardown(spark, tmp_path):
    """delete_feature_view drops the view's online state; teardown
    empties the project (reference feature_store.py:175-184,259-274)."""
    from feast_spark import (
        Entity,
        FeatureStore,
        FeatureView,
        FileSource,
        RepoConfig,
        ValueType,
    )
    from feast_spark.errors import FeatureViewNotFoundError

    now = _ts("2021-06-01T12:00:00")
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [Row(driver_id=1, value=1.0, ts=now - timedelta(hours=1))]
    ).write.parquet(src)

    for kind, path in [
        ("parquet", str(tmp_path / "online")),
        ("sqlite", str(tmp_path / "online.db")),
    ]:
        st = FeatureStore(
            spark,
            RepoConfig(
                project="t",
                registry_path=str(tmp_path / f"reg_{kind}.json"),
                online_store_path=path,
                online_store_type=kind,
            ),
        )
        st.apply(
            [
                Entity(name="driver", join_key="driver_id",
                       value_type=ValueType.INT64),
                FeatureView(
                    name="fv",
                    entities=["driver"],
                    ttl=timedelta(days=5),
                    batch_source=FileSource(path=src,
                                            event_timestamp_column="ts"),
                ),
            ]
        )
        st.materialize_incremental(now)
        assert st.get_online_features(["fv:value"], [{"driver_id": 1}])["value"][0] \
            == pytest.approx(1.0)
        st.delete_feature_view("fv")
        with pytest.raises(FeatureViewNotFoundError):
            st.get_feature_view("fv")
        # online state gone: a fresh store of the same view serves a miss
        assert (
            st.online_store.online_read(
                spark, "t", "fv",
                spark.createDataFrame([Row(driver_id=1)]),
                ["driver_id"], ["value"],
            ).collect()[0]["__found"]
            is False
        )
        st.teardown()
        assert st.list_entities() == []
        assert st.list_feature_views() == []


def test_redis_teardown_fake_client(spark, tmp_path):
    store = _mk_store("redis", tmp_path)
    store.client.keys_list = None  # ensure fallback path exercised

    def keys(pattern):
        import fnmatch

        return [k for k in store.client.hashes if fnmatch.fnmatch(k, pattern)] + [
            k for k in store.client.kv if fnmatch.fnmatch(k, pattern)
        ]

    def delete(k):
        store.client.hashes.pop(k, None)
        store.client.kv.pop(k, None)

    store.client.keys = keys
    store.client.delete = delete
    _write(store, spark, [Row(driver_id=1, ts=_ts("2024-01-01T00:00"), value=1.0)])
    assert _read(store, spark, [1])[1]["value"] == pytest.approx(1.0)
    store.teardown("p")
    assert _read(store, spark, [1])[1]["value"] is None


def test_ttl_expiry_sweep_parquet_and_sqlite(spark, tmp_path):
    """expire_online_features reclaims storage for rows outside the
    ttl window on both the parquet-snapshot and sqlite backends; fresh
    rows and reads survive the sweep."""
    from feast_spark import (
        Entity,
        FeatureStore,
        FeatureView,
        FileSource,
        RepoConfig,
        ValueType,
    )

    now = _ts("2021-06-10T12:00:00")
    rows = [
        Row(driver_id=1, value=1.0, ts=now - timedelta(days=30)),  # stale
        Row(driver_id=2, value=2.0, ts=now - timedelta(hours=1)),  # fresh
    ]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows).write.parquet(src)

    for kind, path in [
        ("parquet", str(tmp_path / "online")),
        ("sqlite", str(tmp_path / "online.db")),
    ]:
        st = FeatureStore(
            spark,
            RepoConfig(
                project="t",
                registry_path=str(tmp_path / f"reg_{kind}.json"),
                online_store_path=path,
                online_store_type=kind,
            ),
        )
        st.apply(
            [
                Entity(name="driver", join_key="driver_id",
                       value_type=ValueType.INT64),
                FeatureView(
                    name="fv",
                    entities=["driver"],
                    ttl=timedelta(days=5),
                    batch_source=FileSource(path=src,
                                            event_timestamp_column="ts"),
                ),
            ]
        )
        st.materialize(now - timedelta(days=60), now)
        swept = st.expire_online_features(now=now)
        assert swept == {"fv": 1}, kind
        # fresh row still serves; stale key is now a miss at the store
        got = st.online_store.online_read(
            spark, "t", "fv",
            spark.createDataFrame([Row(driver_id=1), Row(driver_id=2)]),
            ["driver_id"], ["value"],
        ).collect()
        by_id = {r["driver_id"]: r for r in got}
        assert by_id[2]["value"] == pytest.approx(2.0)
        assert by_id[1]["__found"] is False
        # idempotent: second sweep finds nothing
        assert st.expire_online_features(now=now) == {"fv": 0}


def test_sqlite_accepts_timestamp_ntz_source(spark, tmp_path):
    """Parquet feature tables read back as TIMESTAMP_NTZ (the repo's
    naive-UTC convention, e.g. sources.testdata.load_table) must write
    through the KV snapshot path — unix_micros rejects NTZ without the
    cast (regression: r9 online_bench failure)."""
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "ts", "value")
        .limit(50)
    )
    assert "timestamp_ntz" in dict(ev.dtypes)["ts"]
    store = SqliteOnlineStore(str(tmp_path / "ntz.db"))
    store.online_write_batch(
        spark, "p", "v", ev, ["user_id"], "ts", None, ["value"]
    )
    req = spark.createDataFrame(
        [Row(user_id=r["user_id"]) for r in ev.limit(3).collect()]
    )
    out = store.online_read(spark, "p", "v", req, ["user_id"], ["value"]).collect()
    assert len(out) == 3 and all(r["__found"] for r in out)
