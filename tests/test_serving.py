"""HTTP serving edge: a real client resolves online features through
the server path and gets byte-identical values/statuses to in-process
get_online_features (the server is a transport, not a second read
path)."""

import json
import urllib.request
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from feast_spark import (
    Entity,
    FeatureStore,
    FeatureView,
    FileSource,
    OnlineServingServer,
    RepoConfig,
    ValueType,
)


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def store(spark, tmp_path):
    now = ts("2021-06-01 12:00:00")
    rows = [
        Row(id=1, value=0.1, ts_1=now - timedelta(hours=4), created_ts=now),
        Row(id=1, value=0.3, ts_1=now - timedelta(hours=3), created_ts=now),
        Row(id=3, value=4.0, ts_1=now - timedelta(hours=4), created_ts=now),
    ]
    src_path = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows).write.parquet(src_path)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="serve_t",
            registry_path=str(tmp_path / "registry.json"),
            online_store_path=str(tmp_path / "online"),
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
                    path=src_path,
                    event_timestamp_column="ts",
                    created_timestamp_column="created_ts",
                    field_mapping={"ts_1": "ts", "id": "driver_id"},
                ),
            ),
        ]
    )
    st.materialize(now - timedelta(hours=5), now)
    return st


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_client_resolves_features_through_server(store):
    with OnlineServingServer(store) as srv:
        status, body = _post(
            f"{srv.address}/get-online-features",
            {
                "features": ["simple_fv:value"],
                "entity_rows": [
                    {"driver_id": 1},
                    {"driver_id": 3},
                    {"driver_id": 99},  # never materialized
                ],
            },
        )
    assert status == 200
    fvs = body["field_values"]
    assert len(fvs) == 3
    assert fvs[0]["fields"]["value"] == pytest.approx(0.3)  # latest wins
    assert fvs[0]["statuses"]["value"] == "PRESENT"
    assert fvs[1]["fields"]["value"] == pytest.approx(4.0)
    assert fvs[2]["fields"]["value"] is None
    assert fvs[2]["statuses"]["value"] == "NOT_FOUND"
    # entity keys echo back per row, like the proto's EntityRow fields
    assert [fv["fields"]["driver_id"] for fv in fvs] == [1, 3, 99]

    # server path ≡ in-process path, value for value and status for status
    direct = store.get_online_features(
        ["simple_fv:value"],
        [{"driver_id": 1}, {"driver_id": 3}, {"driver_id": 99}],
    )
    assert [fv["fields"]["value"] for fv in fvs] == direct["value"]
    assert [fv["statuses"]["value"] for fv in fvs] == direct["__statuses"]["value"]


def test_info_health_and_errors(store):
    with OnlineServingServer(store) as srv:
        with urllib.request.urlopen(f"{srv.address}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(f"{srv.address}/info") as r:
            info = json.loads(r.read())
        assert info["type"] == "FEAST_SERVING_TYPE_ONLINE"
        assert info["project"] == "serve_t"

        # malformed request -> 400 with an error body, server stays up
        try:
            _post(f"{srv.address}/get-online-features", {"features": ["x:y"]})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "entity_rows" in json.loads(e.read())["error"]
        status, body = _post(
            f"{srv.address}/get-online-features",
            {
                "features": ["simple_fv:value"],
                "entity_rows": [{"driver_id": 1}],
            },
        )
        assert status == 200
        assert body["field_values"][0]["fields"]["value"] == pytest.approx(0.3)


def test_hybrid_query_coalescer_identity_and_errors(spark, tmp_path):
    """The request coalescer (serving.HybridQueryCoalescer): N
    concurrent .query() calls are served by ONE batch call and each
    caller receives exactly the single-call hybrid_index_topk rows;
    a failed batch (corpus misalignment) re-raises in every caller."""
    import threading

    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import build_bm25_index, hybrid_index_topk
    from feast_spark.operators.paired_index import ensure_meta
    from feast_spark.operators.similarity import build_ivf_index
    from feast_spark.io.fs import LocalFS
    from feast_spark.serving import HybridQueryCoalescer
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    lex_path, vec_path = str(tmp_path / "bm25"), str(tmp_path / "ivf")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=8)
    build_ivf_index(emb, vec_path, n_centroids=4, iters=1)

    # query i's vector IS corpus embedding i, so doc i is query i's #1
    # cosine neighbor: if the coalescer's internal query ids ever
    # collide with corpus ids again, the self-exclusion filter drops
    # doc i from query i's candidates and the identity below breaks
    # deterministically (regression for the r12 review finding)
    by_id = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    }

    def qvec(i):
        return by_id[i]

    terms = ["spark", "merge"]
    n = 6
    results: dict[int, list] = {}
    with HybridQueryCoalescer(
        spark, lex_path, vec_path, k=5, n_probe=4,
        max_batch=n, max_wait_ms=3000.0,
    ) as co:
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, co.query(terms, qvec(i))
                )
            )
            for i in range(n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert set(results) == set(range(n))
    # malformed hybrid requests fail their caller before parking
    with HybridQueryCoalescer(
        spark, lex_path, vec_path, k=5, n_probe=4, max_batch=2,
        max_wait_ms=50.0,
    ) as co_v:
        with pytest.raises(ValueError, match="non-empty term"):
            co_v.query([], qvec(0))
        with pytest.raises(ValueError, match="dimensions"):
            co_v.query(terms, [0.5, 0.5])
    for i in range(n):
        single = hybrid_index_topk(
            spark, lex_path, None, terms, qvec(i), k=5,
            vec_index_path=vec_path, n_probe=4,
        ).collect()
        assert results[i] == [
            (r["id"], r["lex_rank"], r["vec_rank"], r["rrf"]) for r in single
        ], i

    # poison the pair: diverged corpus tokens -> every caller sees the
    # alignment failure (and closed coalescers refuse new work)
    fs = LocalFS()
    ensure_meta(lex_path, fs, {"corpus_epoch": 3})
    ensure_meta(vec_path, fs, {"corpus_epoch": 2})
    co2 = HybridQueryCoalescer(
        spark, lex_path, vec_path, k=5, n_probe=4,
        max_batch=2, max_wait_ms=50.0,
    )
    try:
        errs = {}

        def call(i):
            try:
                co2.query(terms, qvec(i))
            except ValueError as e:
                errs[i] = str(e)

        ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert set(errs) == {0, 1}
        assert all("corpus-misaligned" in v for v in errs.values())
    finally:
        co2.close()
    with pytest.raises(RuntimeError, match="closed"):
        co2.query(terms, qvec(0))


@pytest.mark.nightly
def test_bm25_and_vector_coalescers_match_single_calls(spark, tmp_path):
    """The per-kind coalescers (r13): concurrent BM25QueryCoalescer /
    VectorQueryCoalescer .query() calls are served by ONE batch call
    per kind and each caller receives the single-call verb's rows —
    lexical against bm25_index_topk, vector against vector_index_topk
    (IVF and IVFPQ kinds, auto-dispatched); per-request validation
    fails the caller without touching the batch."""
    import threading

    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import bm25_index_topk, build_bm25_index
    from feast_spark.operators.pq_index import build_ivfpq_index
    from feast_spark.operators.similarity import build_ivf_index
    from feast_spark.operators.vector_index import vector_index_topk
    from feast_spark.serving import BM25QueryCoalescer, VectorQueryCoalescer
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    lex_path = str(tmp_path / "bm25")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=8)

    term_sets = [["spark", "merge"], ["parquet"], ["window", "scan"],
                 ["spark"], ["merge", "hash"]]
    results: dict[int, list] = {}
    with BM25QueryCoalescer(
        spark, lex_path, k=5, max_batch=len(term_sets), max_wait_ms=3000.0
    ) as co:
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, co.query(term_sets[i])
                )
            )
            for i in range(len(term_sets))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # validation failures never park (the batch above already ran)
        with pytest.raises(ValueError, match="non-empty term"):
            co.query(["", None])
    for i, terms in enumerate(term_sets):
        single = bm25_index_topk(spark, lex_path, terms, k=5).collect()
        got_ids = [t[0] for t in results[i]]
        assert got_ids == [r["doc_id"] for r in single], i
        assert [t[1] for t in results[i]] == pytest.approx(
            [r["bm25"] for r in single], rel=1e-9
        ), i

    by_id = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    }
    for kind, build in (
        ("ivf", lambda p: build_ivf_index(emb, p, n_centroids=4, iters=1)),
        ("ivfpq", lambda p: build_ivfpq_index(emb, p, n_centroids=4, iters=1)),
    ):
        vec_path = str(tmp_path / f"vec_{kind}")
        build(vec_path)
        vres: dict[int, list] = {}
        with VectorQueryCoalescer(
            spark, vec_path, k=5, n_probe=2, max_batch=4,
            max_wait_ms=3000.0,
        ) as vo:
            vthreads = [
                threading.Thread(
                    target=lambda i=i: vres.__setitem__(
                        i, vo.query(by_id[i])
                    )
                )
                for i in range(4)
            ]
            for t in vthreads:
                t.start()
            for t in vthreads:
                t.join()
            with pytest.raises(ValueError, match="non-empty vector"):
                vo.query([])
            # wrong-dimension vector fails ITS caller before parking —
            # it must never reach (and poison) the fused batch call
            with pytest.raises(ValueError, match="dimensions"):
                vo.query([0.1, 0.2])
        for i in range(4):
            qdf = spark.createDataFrame(
                [(-(i + 1), by_id[i])], "vec_id LONG, embedding ARRAY<DOUBLE>"
            )
            out = vector_index_topk(spark, vec_path, qdf, n_probe=2, k=5)
            cols = [c for c in out.columns if c != "query_id"]
            single_rows = out.collect()
            if "rank" in cols:
                single_rows.sort(key=lambda r: r["rank"])
            else:
                single_rows.sort(
                    key=lambda r: (r["adc_dist"], r["neighbor_id"])
                )
            want = [tuple(r[c] for c in cols) for r in single_rows]
            if "rank" in cols:
                # IVF: cos is rounded to 4 decimals inside the verb, so
                # ranks and rows are exact across batch shapes
                assert vres[i] == want, (kind, i)
            else:
                # IVFPQ: the ADC kernel's numpy reduction order varies
                # with batch shape (last-ulp drift), so near-ties may
                # legally reorder — compare the canonical rounded set
                def _canon(rows):
                    return sorted((t[0], round(t[1], 9)) for t in rows)

                assert _canon(vres[i]) == _canon(want), (kind, i)


def test_coalescer_failure_skips_already_delivered_requests(spark):
    """_serve fans a batch failure out ONLY to requests whose rows were
    never assigned: a request already delivered (rows set, done fired)
    must not be re-marked failed by post-collect bookkeeping throwing
    mid-batch — a caller racing done.wait() against the err write could
    raise for a query that succeeded (r12 ADVICE finding)."""
    import threading

    from feast_spark.serving import HybridQueryCoalescer

    co = HybridQueryCoalescer.__new__(HybridQueryCoalescer)  # no thread
    co._spark = spark
    co._kw = {}
    co._index_path, co._vec_index_path = "unused", "unused"
    co._lock = threading.Lock()
    co._stats = co._new_stats()

    def boom(*a, **kw):
        raise RuntimeError("index exploded")

    import feast_spark.operators.bm25 as bm25_mod

    orig = bm25_mod.hybrid_index_topk_batch
    bm25_mod.hybrid_index_topk_batch = boom
    try:
        delivered = {
            "terms": ["a"], "qvec": [1.0], "done": threading.Event(),
            "rows": [("doc", 1, 1, 0.5)], "err": None, "t": 0.0,
        }
        delivered["done"].set()
        parked = {
            "terms": ["b"], "qvec": [2.0], "done": threading.Event(),
            "rows": None, "err": None, "t": 0.0,
        }
        co._serve([delivered, parked])
    finally:
        bm25_mod.hybrid_index_topk_batch = orig
    assert delivered["err"] is None  # success stays a success
    assert delivered["rows"] == [("doc", 1, 1, 0.5)]
    assert isinstance(parked["err"], RuntimeError)
    assert parked["done"].is_set()


@pytest.mark.nightly
def test_hybrid_search_endpoint_coalesces_http_requests(
    spark, store, tmp_path
):
    """POST /hybrid-search: concurrent HTTP requests park in the
    coalescer and come back with single-call-identical rows; a server
    without a coalescer 404s the path; bad payloads 400."""
    import threading
    import urllib.error

    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import build_bm25_index, hybrid_index_topk
    from feast_spark.operators.similarity import build_ivf_index
    from feast_spark.serving import HybridQueryCoalescer
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    lex_path, vec_path = str(tmp_path / "bm25s"), str(tmp_path / "ivfs")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=8)
    build_ivf_index(emb, vec_path, n_centroids=4, iters=1)
    dim = len(emb.select("embedding").first()[0])

    def qvec(i):
        return [float((j * 37 + i) % 19) / 19.0 for j in range(dim)]

    terms = ["spark", "merge"]
    n = 4
    with HybridQueryCoalescer(
        spark, lex_path, vec_path, k=5, n_probe=4,
        max_batch=n, max_wait_ms=3000.0,
    ) as co, OnlineServingServer(store, retrieval=co) as srv:
        results = {}

        def call(i):
            results[i] = _post(
                f"{srv.address}/hybrid-search",
                {"terms": terms, "vector": qvec(i)},
            )

        threads = [
            threading.Thread(target=call, args=(i,)) for i in range(n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(n):
            status, body = results[i]
            assert status == 200
            single = hybrid_index_topk(
                spark, lex_path, None, terms, qvec(i), k=5,
                vec_index_path=vec_path, n_probe=4,
            ).collect()
            assert body["results"] == [
                {"id": r["id"], "lex_rank": r["lex_rank"],
                 "vec_rank": r["vec_rank"], "rrf": r["rrf"]}
                for r in single
            ], i

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{srv.address}/hybrid-search", {"terms": [], "vector": [1.0]})
        assert ei.value.code == 400

        # a malformed ELEMENT is rejected in the handler (400) and
        # never reaches the shared batch, so the server keeps serving
        # valid requests (r12 review finding)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(
                f"{srv.address}/hybrid-search",
                {"terms": terms, "vector": ["oops"] + qvec(2)[1:]},
            )
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(
                f"{srv.address}/hybrid-search",
                {"terms": [None], "vector": qvec(2)},
            )
        assert ei.value.code == 400
        status, _ = _post(
            f"{srv.address}/hybrid-search",
            {"terms": terms, "vector": qvec(1)},
        )
        assert status == 200

    # index-side failure (diverged pair) -> 500, not the client's fault
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.paired_index import ensure_meta

    fs = LocalFS()
    ensure_meta(lex_path, fs, {"corpus_epoch": 9})
    ensure_meta(vec_path, fs, {"corpus_epoch": 8})
    with HybridQueryCoalescer(
        spark, lex_path, vec_path, k=5, n_probe=4,
        max_batch=1, max_wait_ms=10.0,
    ) as co5, OnlineServingServer(store, retrieval=co5) as srv:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(
                f"{srv.address}/hybrid-search",
                {"terms": terms, "vector": qvec(0)},
            )
        assert ei.value.code == 500

    with OnlineServingServer(store) as srv:  # no retrieval configured
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(
                f"{srv.address}/hybrid-search",
                {"terms": ["x"], "vector": [1.0]},
            )
        assert ei.value.code == 404


@pytest.mark.nightly
def test_single_channel_search_endpoints(spark, store, tmp_path):
    """POST /search (BM25QueryCoalescer) and /vector-search
    (VectorQueryCoalescer): concurrent HTTP requests coalesce per kind
    and return single-call-identical rows keyed by the coalescer's
    columns; unconfigured channels 404; malformed payloads — including
    a wrong-dimension vector, which only the coalescer's pre-parking
    check can see — 400."""
    import threading
    import urllib.error

    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import bm25_index_topk, build_bm25_index
    from feast_spark.operators.pq_index import build_ivfpq_index
    from feast_spark.serving import BM25QueryCoalescer, VectorQueryCoalescer
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    lex_path, vec_path = str(tmp_path / "bm25e"), str(tmp_path / "pqe")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=8)
    build_ivfpq_index(emb, vec_path, n_centroids=4, iters=1)
    by_id = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    }
    term_sets = [["spark", "merge"], ["parquet"], ["window"], ["scan"]]

    with BM25QueryCoalescer(
        spark, lex_path, k=5, max_batch=4, max_wait_ms=3000.0
    ) as lex_co, VectorQueryCoalescer(
        spark, vec_path, k=5, n_probe=2, max_batch=4, max_wait_ms=3000.0
    ) as vec_co, OnlineServingServer(
        store, lexical=lex_co, vector=vec_co
    ) as srv:
        lex_res, vec_res = {}, {}

        def lex_call(i):
            lex_res[i] = _post(
                f"{srv.address}/search", {"terms": term_sets[i]}
            )

        def vec_call(i):
            vec_res[i] = _post(
                f"{srv.address}/vector-search", {"vector": by_id[i]}
            )

        threads = [
            threading.Thread(target=f, args=(i,))
            for i in range(4)
            for f in (lex_call, vec_call)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i in range(4):
            status, body = lex_res[i]
            assert status == 200
            single = bm25_index_topk(
                spark, lex_path, term_sets[i], k=5
            ).collect()
            assert [r["doc_id"] for r in body["results"]] == [
                r["doc_id"] for r in single
            ], i
            assert [r["bm25"] for r in body["results"]] == pytest.approx(
                [r["bm25"] for r in single], rel=1e-9
            ), i

            status, body = vec_res[i]
            assert status == 200
            # vs a direct (differently-batched) call; ADC floats drift
            # in the last ulps across batch shapes and near-ties may
            # legally reorder — compare the canonical rounded set
            direct = vec_co.query(by_id[i])
            assert sorted(
                (r["neighbor_id"], round(r["adc_dist"], 9))
                for r in body["results"]
            ) == sorted((t[0], round(t[1], 9)) for t in direct), i

        # malformed payloads are the client's fault: 400, and the
        # server keeps serving
        for url, payload in (
            ("/search", {"terms": []}),
            ("/search", {"nope": 1}),
            ("/vector-search", {"vector": []}),
            ("/vector-search", {"vector": ["oops"]}),
            ("/vector-search", {"vector": [0.1, 0.2]}),  # wrong dims
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(f"{srv.address}{url}", payload)
            assert ei.value.code == 400, (url, payload)
        status, _ = _post(f"{srv.address}/search", {"terms": ["spark"]})
        assert status == 200

    with OnlineServingServer(store) as srv:  # channels unconfigured
        for url, payload in (
            ("/search", {"terms": ["x"]}),
            ("/vector-search", {"vector": [1.0]}),
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(f"{srv.address}{url}", payload)
            assert ei.value.code == 404, url


@pytest.mark.nightly
def test_metrics_endpoint_and_coalescer_stats(spark, store, tmp_path):
    """GET /metrics (r13): per-endpoint counters with status classes
    and fixed-bucket latency histograms, unknown paths folded into a
    bounded 'other' label, and each configured coalescer's
    amortization stats (batch fill / queue wait / fused-call time)
    surfaced under its channel name."""
    import threading
    import urllib.error

    from feast_spark.operators.bm25 import build_bm25_index
    from feast_spark.serving import LATENCY_BUCKETS_MS, BM25QueryCoalescer
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    lex_path = str(tmp_path / "bm25")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=8)

    with BM25QueryCoalescer(
        spark, lex_path, k=5, max_batch=3, max_wait_ms=2000.0
    ) as co, OnlineServingServer(store, lexical=co) as srv:
        # one good GET, one scanner path, one client error, and three
        # coalesced searches
        with urllib.request.urlopen(f"{srv.address}/health") as r:
            assert r.status == 200
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{srv.address}/secret-admin-page")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{srv.address}/search", {"terms": []})
        assert ei.value.code == 400
        threads = [
            threading.Thread(
                target=lambda: _post(
                    f"{srv.address}/search", {"terms": ["spark"]}
                )
            )
            for _ in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        with urllib.request.urlopen(f"{srv.address}/metrics") as r:
            snap = json.loads(r.read())

    assert snap["latency_bucket_bounds_ms"] == list(LATENCY_BUCKETS_MS)
    eps = snap["endpoints"]
    assert eps["/health"]["requests"] == 1
    assert eps["/health"]["by_status"] == {"2xx": 1}
    # the scanner path did NOT mint a label
    assert "/secret-admin-page" not in eps
    assert eps["other"]["by_status"] == {"4xx": 1}
    search = eps["/search"]
    assert search["requests"] == 4
    assert search["by_status"] == {"2xx": 3, "4xx": 1}
    # histogram counts add up and the summary stats are consistent
    assert sum(search["latency_bucket_counts"]) == 4
    assert search["latency_ms_max"] >= search["latency_ms_avg"] > 0

    co_stats = snap["coalescers"]["lexical"]
    assert co_stats["requests"] == 3
    assert co_stats["batches"] >= 1
    assert co_stats["failed_batches"] == 0
    assert co_stats["rows_returned"] == 15  # 3 requests x k=5
    assert co_stats["batch_size_max"] <= 3
    assert co_stats["batch_size_avg"] == pytest.approx(
        co_stats["requests"] / co_stats["batches"]
    )
    assert co_stats["serve_ms_avg_per_batch"] > 0
    assert co_stats["as_of"] is None  # unpinned tier serves head
    assert "vector" not in snap["coalescers"]  # unconfigured channel


def test_coalescer_stats_count_failed_batches(spark):
    """A fused-call failure increments failed_batches and still counts
    the batch's requests — the error ratio is visible at /metrics."""
    import threading

    from feast_spark.serving import HybridQueryCoalescer

    co = HybridQueryCoalescer.__new__(HybridQueryCoalescer)  # no thread
    co._spark = spark
    co._kw = {}
    co._index_path, co._vec_index_path = "unused", "unused"
    co._lock = threading.Lock()
    co._stats = co._new_stats()
    co._pending = []

    def boom(*a, **kw):
        raise RuntimeError("index exploded")

    import feast_spark.operators.bm25 as bm25_mod

    orig = bm25_mod.hybrid_index_topk_batch
    bm25_mod.hybrid_index_topk_batch = boom
    try:
        req = {
            "terms": ["a"], "qvec": [1.0], "done": threading.Event(),
            "rows": None, "err": None, "t": 0.0,
        }
        co._serve([req])
    finally:
        bm25_mod.hybrid_index_topk_batch = orig
    s = co.stats()
    assert s["failed_batches"] == 1 and s["batches"] == 1
    assert s["requests"] == 1 and s["rows_returned"] == 0
