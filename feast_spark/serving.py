"""Online feature serving over HTTP — the transport twin of the
reference's gRPC ServingService.

The reference serves online features via gRPC
(`protos/feast/serving/ServingService.proto:30-37`: ``GetFeastServingInfo``
+ ``GetOnlineFeaturesV2``; legacy Python client
`sdk/python/feast/client.py:930-980`, Go client `sdk/go/client.go`).
``grpcio`` is not provisionable in this environment, so this module
speaks the SAME request/response *schema* as JSON over stdlib
``http.server`` — field-for-field with GetOnlineFeaturesRequestV2 /
GetOnlineFeaturesResponse, so a gRPC transport can be slotted in later
without touching the store side:

* ``POST /get-online-features`` — request
  ``{"features": ["view:feat", ...], "entity_rows": [{key: val}, ...]}``
  (FeatureReferenceV2 list + repeated EntityRow); response
  ``{"field_values": [{"fields": {...}, "statuses": {...}}, ...]}``
  — one FieldValues per entity row, statuses from
  ``ServingService.proto:96-115`` (PRESENT / NOT_FOUND — the statuses
  the reference's Python path actually emits, feature_store.py:588-615).
* ``GET /info`` — GetFeastServingInfo twin: version + store type.
* ``GET /health`` — liveness.
* ``GET /metrics`` — per-endpoint request counts, status classes and
  fixed-bucket latency histograms (:class:`ServingMetrics`), plus each
  configured coalescer's amortization counters
  (:meth:`QueryCoalescer.stats`) — batch fill, queue wait, fused-call
  time — the numbers max_batch/max_wait_ms are tuned against.

The server is a thin transport: every request resolves through
``FeatureStore.get_online_features`` (same statuses, same on-demand
transforms), so server-path and in-process reads can never diverge.
Binary feature payloads for reference-compatible KV stores remain the
job of ``export_online_wire`` (functions/value_proto.py).
"""

from __future__ import annotations

import json
import threading
import time
from datetime import date, datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from feast_spark.io.localframe import local_df

__all__ = [
    "OnlineServingServer",
    "serve_online",
    "CoalescerRequestError",
    "QueryCoalescer",
    "HybridQueryCoalescer",
    "BM25QueryCoalescer",
    "VectorQueryCoalescer",
    "ServingMetrics",
]


# fixed latency bucket bounds (ms), Prometheus-histogram style:
# cumulative counts land in the first bucket whose bound >= the
# observation, with one overflow bucket past the last bound.  Fixed
# bounds keep aggregation across servers a pointwise vector add.
LATENCY_BUCKETS_MS = (
    1.0, 2.5, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0,
    1000.0, 2500.0, 5000.0, 10000.0,
)


class ServingMetrics:
    """Thread-safe per-endpoint request counters for the HTTP server:
    request count, status-class counts (2xx/4xx/5xx), and a
    fixed-bucket latency histogram (:data:`LATENCY_BUCKETS_MS`) with
    sum/max — enough to derive rate, error ratio and any quantile
    estimate downstream, shaped so scraping N servers aggregates by
    vector addition (the Prometheus histogram discipline, no client
    library needed).

    Endpoint label cardinality is BOUNDED: only paths the server
    actually routes are recorded by name; anything else (scanners,
    typos) folds into ``"other"`` so an unauthenticated caller cannot
    grow the label space.  Exposed at ``GET /metrics`` together with
    each configured coalescer's ``stats()``."""

    def __init__(self, known_endpoints: tuple[str, ...] = ()):
        self._known = set(known_endpoints)
        self._lock = threading.Lock()
        self._endpoints: dict[str, dict] = {}
        self._started = time.time()

    def observe(self, endpoint: str, status: int, elapsed_s: float) -> None:
        name = endpoint if endpoint in self._known else "other"
        ms = elapsed_s * 1000.0
        with self._lock:
            e = self._endpoints.get(name)
            if e is None:
                e = self._endpoints[name] = {
                    "requests": 0,
                    "by_status": {},
                    "latency_ms_sum": 0.0,
                    "latency_ms_max": 0.0,
                    "latency_bucket_counts": [0]
                    * (len(LATENCY_BUCKETS_MS) + 1),
                }
            e["requests"] += 1
            klass = f"{status // 100}xx"
            e["by_status"][klass] = e["by_status"].get(klass, 0) + 1
            e["latency_ms_sum"] += ms
            e["latency_ms_max"] = max(e["latency_ms_max"], ms)
            for i, bound in enumerate(LATENCY_BUCKETS_MS):
                if ms <= bound:
                    e["latency_bucket_counts"][i] += 1
                    break
            else:
                e["latency_bucket_counts"][-1] += 1

    def snapshot(self) -> dict:
        with self._lock:
            endpoints = {
                name: {
                    **e,
                    "by_status": dict(e["by_status"]),
                    "latency_bucket_counts": list(
                        e["latency_bucket_counts"]
                    ),
                    "latency_ms_avg": (
                        e["latency_ms_sum"] / e["requests"]
                        if e["requests"]
                        else 0.0
                    ),
                }
                for name, e in self._endpoints.items()
            }
        return {
            "uptime_s": time.time() - self._started,
            "latency_bucket_bounds_ms": list(LATENCY_BUCKETS_MS),
            "endpoints": endpoints,
        }


class CoalescerRequestError(ValueError):
    """A coalescer request failed ITS OWN pre-parking validation (bad
    terms, wrong vector dimensionality).  A distinct type so transports
    can map it to 400 while index-side failures surfacing through the
    fused batch call (e.g. a ValueError from the corpus-alignment
    check) stay 500 — the client's fault and the server's fault must
    not share an exception class."""


def _json_default(o: Any):
    if isinstance(o, (datetime, date)):
        return o.isoformat()
    if isinstance(o, bytes):
        return o.hex()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def _rows_to_field_values(result: dict) -> list[dict]:
    """Reshape the store's column-major response (feature -> values,
    plus __statuses) into the proto's row-major ``field_values``."""
    statuses: dict[str, list[str]] = result.get("__statuses", {})
    names = [k for k in result.keys() if k != "__statuses"]
    n = max((len(v) for v in result.values() if isinstance(v, list)), default=0)
    out = []
    for i in range(n):
        fields = {k: result[k][i] for k in names}
        st = {k: statuses[k][i] for k in statuses}
        out.append({"fields": fields, "statuses": st})
    return out


class OnlineServingServer:
    """Serve a :class:`~feast_spark.feature_store.FeatureStore`'s online
    features over HTTP on ``host:port`` (port 0 = ephemeral).  Use as a
    context manager or call :meth:`start` / :meth:`stop`.

    ``retrieval``: an optional :class:`HybridQueryCoalescer`; when set,
    ``POST /hybrid-search`` ``{"terms": [...], "vector": [...]}``
    answers hybrid lexical+vector retrieval — each HTTP handler thread
    parks in the coalescer, so CONCURRENT requests are served by one
    Spark batch call (the measured 15x per-call amortization reaches
    the wire without the transport doing anything special).
    ``lexical`` (:class:`BM25QueryCoalescer`) and ``vector``
    (:class:`VectorQueryCoalescer`) are the single-channel twins:
    ``POST /search`` ``{"terms": [...]}`` and ``POST /vector-search``
    ``{"vector": [...]}``, each row keyed by the coalescer's
    ``columns``.  Every coalescer's lifecycle belongs to the caller
    (it may be shared by several transports); the server does not
    close them."""

    def __init__(
        self,
        store,
        host: str = "127.0.0.1",
        port: int = 0,
        retrieval=None,
        lexical=None,
        vector=None,
    ):
        self.store = store
        self.retrieval = retrieval
        self.lexical = lexical
        self.vector = vector
        self.metrics = ServingMetrics(known_endpoints=(
            "/health", "/info", "/metrics", "/get-online-features",
            "/hybrid-search", "/search", "/vector-search",
        ))
        self._httpd = ThreadingHTTPServer((host, port), self._handler_cls())
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def _handler_cls(self):
        store = self.store
        server = self

        class Handler(BaseHTTPRequestHandler):
            # serving logs belong to the caller's logger, not stderr
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                # the single response exit point doubles as the metrics
                # tap: endpoint label cardinality is bounded inside
                # ServingMetrics, so unknown paths cannot grow it
                server.metrics.observe(
                    self.path, code,
                    time.monotonic() - getattr(self, "_t0", time.monotonic()),
                )

            def do_GET(self):  # noqa: N802
                self._t0 = time.monotonic()
                if self.path == "/health":
                    self._send(200, {"status": "ok"})
                elif self.path == "/metrics":
                    snap = server.metrics.snapshot()
                    snap["coalescers"] = {
                        name: co.stats()
                        for name, co in (
                            ("retrieval", server.retrieval),
                            ("lexical", server.lexical),
                            ("vector", server.vector),
                        )
                        if co is not None
                    }
                    self._send(200, snap)
                elif self.path == "/info":
                    self._send(
                        200,
                        {
                            "version": "feast_spark",
                            "type": "FEAST_SERVING_TYPE_ONLINE",
                            "online_store": store.config.online_store_type,
                            "project": store.config.project,
                        },
                    )
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):  # noqa: N802
                self._t0 = time.monotonic()
                if self.path == "/hybrid-search":
                    self._hybrid_search()
                    return
                if self.path == "/search":
                    self._single_channel_search(
                        server.lexical, "lexical",
                        lambda req: (self._parse_terms(req),),
                    )
                    return
                if self.path == "/vector-search":
                    self._single_channel_search(
                        server.vector, "vector",
                        lambda req: (self._parse_vector(req),),
                    )
                    return
                if self.path != "/get-online-features":
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    features = req["features"]
                    entity_rows = req["entity_rows"]
                    if not isinstance(entity_rows, list) or not entity_rows:
                        raise ValueError("entity_rows must be a non-empty list")
                    result = store.get_online_features(features, entity_rows)
                    self._send(
                        200, {"field_values": _rows_to_field_values(result)}
                    )
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # store-side failure
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

            def _read_json(self) -> dict:
                length = int(self.headers.get("Content-Length", "0"))
                return json.loads(self.rfile.read(length) or b"{}")

            @staticmethod
            def _parse_terms(req: dict) -> list[str]:
                if "terms" not in req:
                    raise ValueError("request must contain 'terms'")
                terms = req["terms"]
                if (
                    not isinstance(terms, list)
                    or not terms
                    or not all(isinstance(t, str) and t for t in terms)
                ):
                    raise ValueError(
                        "terms must be a non-empty list of "
                        "non-empty strings"
                    )
                return terms

            @staticmethod
            def _parse_vector(req: dict) -> list[float]:
                if "vector" not in req:
                    raise ValueError("request must contain 'vector'")
                vector = req["vector"]
                if not isinstance(vector, list) or not vector:
                    raise ValueError("vector must be a non-empty list")
                return [float(x) for x in vector]

            def _hybrid_search(self):
                if server.retrieval is None:
                    self._send(
                        404,
                        {"error": "no retrieval coalescer configured "
                                  "(pass retrieval= to the server)"},
                    )
                    return
                # parse + validate FULLY before touching the coalescer:
                # a malformed element must fail as 400 without parking
                # (the coalescer re-validates pre-parking as a second
                # line of defense), and an index-side failure must
                # surface as 500, not as the client's fault
                try:
                    req = self._read_json()
                    terms = self._parse_terms(req)
                    vector = self._parse_vector(req)
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, {"error": str(e)})
                    return
                try:
                    rows = server.retrieval.query(terms, vector)
                except CoalescerRequestError as e:  # pre-parking
                    # validation the transport cannot do itself (vector
                    # dimensionality vs the index) — the client's fault
                    self._send(400, {"error": str(e)})
                    return
                except Exception as e:  # index-side failure (e.g. the
                    # corpus-alignment check tripping) — a server
                    # problem, visible to 5xx monitoring
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._send(
                    200,
                    {
                        "results": [
                            {
                                "id": rid,
                                "lex_rank": lr,
                                "vec_rank": vr,
                                "rrf": rrf,
                            }
                            for rid, lr, vr, rrf in rows
                        ]
                    },
                )

            def _single_channel_search(self, co, name, parse):
                """POST /search and /vector-search: one coalescer, rows
                keyed by its ``columns`` — same 400/500 split as the
                hybrid endpoint."""
                if co is None:
                    self._send(
                        404,
                        {"error": f"no {name} coalescer configured "
                                  f"(pass {name}= to the server)"},
                    )
                    return
                try:
                    args = parse(self._read_json())
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, {"error": str(e)})
                    return
                try:
                    rows = co.query(*args)
                except CoalescerRequestError as e:  # pre-parking validation
                    self._send(400, {"error": str(e)})
                    return
                except Exception as e:
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                cols = co.columns
                self._send(
                    200,
                    {"results": [dict(zip(cols, r)) for r in rows]},
                )

        return Handler

    def start(self) -> "OnlineServingServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "OnlineServingServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def serve_online(store, host: str = "127.0.0.1", port: int = 6566):
    """Blocking convenience entry point (reference default serving port
    6566).  For programmatic use prefer ``OnlineServingServer``."""
    server = OnlineServingServer(store, host, port)
    try:
        server._httpd.serve_forever()
    finally:
        server.stop()


class QueryCoalescer:
    """Accumulate-then-batch retrieval serving core — the measured
    batch amortization exposed as a per-request API.

    The serving-floor decomposition (tools/serving_floor.py, SCALE.md)
    shows every single ``*_index_topk`` call pays per-CALL Spark stage
    scheduling (~0.6-1.6 s locally) while ONE batch call over the same
    queries pays it once (~0.17 s/query for the hybrid at 20 queries).
    A serving tier therefore wants to answer per-request but EXECUTE
    per-batch: concurrent ``query()`` calls park until either
    ``max_batch`` requests are waiting or ``max_wait_ms`` has passed
    since the batch's first arrival, one batch call serves them all,
    and each caller gets back exactly the rows its single-call verb
    would have returned (identity pytest-pinned per kind in
    test_serving.py).

    Subclasses provide the typed ``query()`` (which must VALIDATE the
    request before parking it — a malformed request must fail its own
    caller, never the shared batch) and ``_serve_batch(batch)``, which
    runs ONE fused call and returns one row-list per request, in batch
    order.  Internal batch query ids are NEGATIVE (-1, -2, ...) so
    they can never collide with a corpus id and trip a vector
    channel's self-exclusion (regression-pinned).

    Latency contract: an isolated request waits at most ``max_wait_ms``
    extra; under load the wait amortizes to ~0 because the batch fills
    before the timer.  A failed batch call (e.g. the corpus-alignment
    check tripping, operators/paired_index.py) re-raises IN EVERY
    undelivered parked caller — one poisoned query poisons its batch,
    which is the honest outcome when the failure is index-level, and
    per-query failures do not exist below the fused call.

    Thread-safe; Spark is only touched from the dispatcher thread.
    Close (or use as a context manager) to drain and stop."""

    def __init__(self, spark, max_batch: int = 32, max_wait_ms: float = 25.0):
        self._spark = spark
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1000.0
        # pinned-serving identity: subclasses set _as_of (seq, tag, or
        # pair) before super().__init__ when the ctor pins the tier to
        # an archived commit; surfaced in stats()/GET /metrics so an
        # ops reader diagnosing an A/B rollback sees WHICH commit this
        # coalescer serves, not just its amortization counters
        if not hasattr(self, "_as_of"):
            self._as_of = None
        self._lock = threading.Lock()
        self._arrived = threading.Condition(self._lock)
        self._pending: list[dict] = []
        self._closed = False
        # amortization evidence, maintained by _serve under self._lock:
        # how full batches run and how long requests park is exactly
        # what a capacity planner tunes max_batch/max_wait_ms against
        self._stats = self._new_stats()
        self._thread = threading.Thread(
            target=self._dispatch_loop,
            name=f"{type(self).__name__}-dispatch",
            daemon=True,
        )
        self._thread.start()

    def _submit(self, fields: dict) -> list:
        """Park a validated request; block until its batch is served."""
        req = {**fields, "done": threading.Event(), "rows": None,
               "err": None, "t": time.monotonic()}
        with self._lock:
            if self._closed:
                raise RuntimeError("coalescer is closed")
            self._pending.append(req)
            self._arrived.notify()
        req["done"].wait()
        if req["err"] is not None:
            raise req["err"]
        return req["rows"]

    def _serve_batch(self, batch: list[dict]) -> list[list]:
        raise NotImplementedError  # subclass responsibility

    def _dispatch_loop(self) -> None:
        while True:
            with self._lock:
                while not self._pending and not self._closed:
                    self._arrived.wait()
                if self._closed and not self._pending:
                    return
                # deadline from the batch head's ARRIVAL, not from when
                # the dispatcher got around to looking: a request that
                # parked while the previous batch was being served has
                # already waited its share
                deadline = self._pending[0]["t"] + self._max_wait
                while (
                    len(self._pending) < self._max_batch
                    and not self._closed
                ):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._arrived.wait(timeout=remaining)
                batch = self._pending[: self._max_batch]
                del self._pending[: len(batch)]
            self._serve(batch)

    @staticmethod
    def _new_stats() -> dict:
        return {
            "requests": 0,
            "batches": 0,
            "failed_batches": 0,
            "rows_returned": 0,
            "batch_size_max": 0,
            "wait_s_sum": 0.0,
            "serve_s_sum": 0.0,
        }

    def _serve(self, batch: list[dict]) -> None:
        t0 = time.monotonic()
        failed = False
        rows_returned = 0
        try:
            # materialize EVERY request's rows before waking ANY caller:
            # if bookkeeping throws mid-loop after some done.set(), the
            # except block would mark already-delivered requests as
            # failed and a caller racing done.wait() could raise for a
            # request that succeeded
            results = self._serve_batch(batch)
            for req, res in zip(batch, results):
                req["rows"] = res
                rows_returned += len(res)
                req["done"].set()
        except Exception as e:  # noqa: BLE001 — fan the failure out,
            # but only to requests not already delivered (rows is a
            # list — possibly empty — once assigned, never None)
            failed = True
            for req in batch:
                if req["rows"] is None:
                    req["err"] = e
                req["done"].set()
        finally:
            with self._lock:
                s = self._stats
                s["requests"] += len(batch)
                s["batches"] += 1
                s["failed_batches"] += int(failed)
                s["rows_returned"] += rows_returned
                s["batch_size_max"] = max(s["batch_size_max"], len(batch))
                s["wait_s_sum"] += sum(t0 - req["t"] for req in batch)
                s["serve_s_sum"] += time.monotonic() - t0

    def stats(self) -> dict:
        """Snapshot of the coalescer's amortization counters plus the
        derived tuning numbers: ``batch_size_avg`` (how full batches
        actually run — if it hugs 1 under load, raise ``max_wait_ms``;
        if it hugs ``max_batch``, raise ``max_batch``),
        ``wait_ms_avg`` (queueing latency a request paid on top of the
        fused call) and ``serve_ms_avg_per_batch`` (the fused-call
        cost the batching amortizes)."""
        with self._lock:
            s = dict(self._stats)
            s["pending"] = len(self._pending)
        # None = serving head; a seq/tag (or [bm25, vec] pair) = the
        # archived commit(s) this tier is pinned to
        a = getattr(self, "_as_of", None)
        s["as_of"] = list(a) if isinstance(a, tuple) else a
        s["batch_size_avg"] = (
            s["requests"] / s["batches"] if s["batches"] else 0.0
        )
        s["wait_ms_avg"] = (
            s["wait_s_sum"] / s["requests"] * 1000.0
            if s["requests"]
            else 0.0
        )
        s["serve_ms_avg_per_batch"] = (
            s["serve_s_sum"] / s["batches"] * 1000.0
            if s["batches"]
            else 0.0
        )
        return s

    @staticmethod
    def _group_by_request(
        rows, n: int, sort_key, row_tuple
    ) -> list[list]:
        """Split collected batch rows back into per-request lists (the
        negative-id convention: request i was query id -(i+1)), each
        ordered by ``sort_key(row)``."""
        by_q: dict[int, list] = {i: [] for i in range(n)}
        for r in rows:
            by_q[-r["query_id"] - 1].append((sort_key(r), row_tuple(r)))
        return [[t for _, t in sorted(by_q[i])] for i in range(n)]

    def close(self) -> None:
        """Stop accepting requests, serve what's parked, join the
        dispatcher."""
        with self._lock:
            self._closed = True
            self._arrived.notify_all()
        self._thread.join()

    def __enter__(self) -> "QueryCoalescer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _index_dim(vec_index_path: str, fs, as_of=None) -> int:
    """Construction-time resolution of the index's embedding
    dimensionality (operators/vector_index.vector_index_dim).  Resolved
    once: dimensionality is structural — a rebuild that CHANGES it is a
    different serving config and warrants a fresh coalescer.  A pinned
    coalescer (``as_of``) resolves the PINNED commit's dimensionality,
    so it validates requests against the model it actually serves."""
    from feast_spark.operators.vector_index import vector_index_dim

    return vector_index_dim(vec_index_path, fs, as_of=as_of)


def _check_dim(qvec, dim: int) -> list[float]:
    import math

    if not qvec:
        raise CoalescerRequestError("qvec must be a non-empty vector")
    try:
        vec = [float(x) for x in qvec]
    except (TypeError, ValueError):
        raise CoalescerRequestError(
            "qvec must contain only numbers"
        ) from None
    if not all(math.isfinite(x) for x in vec):
        # json.loads happily parses bare NaN/Infinity tokens; letting
        # them through yields NaN distances and a 200 response whose
        # body strict JSON parsers reject — the client's fault, caught
        # here so every transport rejects it as such
        raise CoalescerRequestError("qvec must contain only finite numbers")
    if len(vec) != dim:
        raise CoalescerRequestError(
            f"query vector has {len(vec)} dimensions but the index "
            f"stores {dim}-dimensional embeddings"
        )
    return vec


class HybridQueryCoalescer(QueryCoalescer):
    """Coalesced all-index hybrid retrieval: each batch is ONE
    ``hybrid_index_topk_batch`` call (BM25 postings + vector index,
    RRF-fused); ``query()`` returns the single-call
    ``hybrid_index_topk`` rows.  Measured 0.177 s/query at 20
    concurrent requests vs the 1.6-2.1 s single-call floor
    (tools/serving_floor.py)."""

    def __init__(
        self,
        spark,
        index_path: str,
        vec_index_path: str,
        k: int = 10,
        fetch_k: int = 50,
        rrf_k: int = 60,
        n_probe: int = 4,
        vec_index_kind: str = "auto",
        on_corpus_mismatch: str = "fail",
        max_batch: int = 32,
        max_wait_ms: float = 25.0,
        fs=None,
        as_of: tuple | None = None,
    ):
        # as_of PINS the serving tier to a pair of archived commits
        # (seqs or tag names, io/epochs.py manifest history): every
        # fused call replays exactly that pair — a reproducible
        # serving config for A/B or rollback, vacuum-immune when the
        # commits are tagged
        self._kw = dict(
            k=k, fetch_k=fetch_k, rrf_k=rrf_k, n_probe=n_probe,
            vec_index_kind=vec_index_kind,
            on_corpus_mismatch=on_corpus_mismatch, fs=fs, as_of=as_of,
        )
        self._index_path = index_path
        self._vec_index_path = vec_index_path
        self._as_of = as_of
        self._dim = _index_dim(
            vec_index_path, fs, as_of=as_of[1] if as_of else None
        )
        super().__init__(spark, max_batch=max_batch, max_wait_ms=max_wait_ms)

    def query(self, terms: list[str], qvec: list[float]) -> list[tuple]:
        """Block until the coalesced batch containing this request is
        served; returns [(id, lex_rank, vec_rank, rrf), ...] in rank
        order — the same rows as a hybrid_index_topk call.  Term and
        vector shape are validated BEFORE parking (a wrong-length
        vector would otherwise fail the fused kernel and take every
        concurrent parked request down with it)."""
        if (
            not terms
            or not all(isinstance(t, str) for t in terms)
            or not any(terms)
        ):
            # element types are enforced here, not just at the HTTP
            # edge: a non-string term would otherwise fail the fused
            # createDataFrame (terms ARRAY<STRING>) and take every
            # concurrently parked request down with it
            raise CoalescerRequestError(
                "terms must be a list of strings with at least one "
                "non-empty term"
            )
        return self._submit(
            {"terms": terms, "qvec": _check_dim(qvec, self._dim)}
        )

    def _serve_batch(self, batch: list[dict]) -> list[list]:
        from feast_spark.operators.bm25 import hybrid_index_topk_batch

        qdf = local_df(
            self._spark,
            [(-(i + 1), r["terms"], r["qvec"]) for i, r in enumerate(batch)],
            "query_id LONG, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>",
        )
        rows = hybrid_index_topk_batch(
            self._spark, self._index_path, None, qdf,
            vec_index_path=self._vec_index_path, **self._kw,
        ).collect()
        return self._group_by_request(
            rows, len(batch),
            sort_key=lambda r: r["rank"],
            row_tuple=lambda r: (
                r["id"], r["lex_rank"], r["vec_rank"], r["rrf"]
            ),
        )


class BM25QueryCoalescer(QueryCoalescer):
    """Coalesced lexical-only retrieval: each batch is ONE
    ``bm25_index_topk_batch`` call over the union of the parked
    queries' term buckets; ``query()`` returns the single-call
    ``bm25_index_topk`` rows (id, bm25) in rank order — identical
    scores, since single and batch share the index postings and the
    exact-long corpus stats (identity pytest-pinned)."""

    def __init__(
        self,
        spark,
        index_path: str,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        max_batch: int = 32,
        max_wait_ms: float = 25.0,
        fs=None,
        as_of: int | str | None = None,
    ):
        from feast_spark.operators.bm25 import _bm25_manifest
        from feast_spark.io.fs import LocalFS

        self._index_path = index_path
        # as_of pins every fused call to one archived commit (seq or
        # tag name) — the id column below resolves from the SAME
        # pinned manifest the queries will read
        self._kw = dict(k=k, k1=k1, b=b, fs=fs, as_of=as_of)
        self._as_of = as_of
        #: row layout of each query() tuple (the index's committed id
        #: column + the score) — what the HTTP edge keys results by
        self.columns = (
            _bm25_manifest(index_path, fs or LocalFS(), as_of=as_of)[
                "id_col"
            ],
            "bm25",
        )
        super().__init__(spark, max_batch=max_batch, max_wait_ms=max_wait_ms)

    def query(self, terms: list[str]) -> list[tuple]:
        """[(id, bm25), ...] in rank order — the same rows as a
        bm25_index_topk call.  Validation IS the single call's
        (shared ``normalize_query_terms``, so the identity cannot
        drift) and runs BEFORE parking, so a bad request can never
        poison its batch."""
        from feast_spark.operators.bm25 import normalize_query_terms

        try:
            norm = normalize_query_terms(terms)
        except ValueError as e:  # re-typed so transports can 400 it
            raise CoalescerRequestError(str(e)) from None
        return self._submit({"terms": norm})

    def _serve_batch(self, batch: list[dict]) -> list[list]:
        from feast_spark.operators.bm25 import bm25_index_topk_batch

        qdf = local_df(
            self._spark,
            [(-(i + 1), r["terms"]) for i, r in enumerate(batch)],
            "query_id LONG, terms ARRAY<STRING>",
        )
        rows = bm25_index_topk_batch(
            self._spark, self._index_path, qdf, **self._kw
        ).collect()
        id_col = self.columns[0]  # the manifest's id column — the one
        # source of truth shared with the wire layout
        return self._group_by_request(
            rows, len(batch),
            sort_key=lambda r: r["rank"],
            row_tuple=lambda r: (r[id_col], r["bm25"]),
        )


class VectorQueryCoalescer(QueryCoalescer):
    """Coalesced vector-only ANN retrieval against a persisted IVF or
    IVFPQ index (kind dispatched from the manifest stamp,
    ``operators/vector_index.py``): each batch is ONE
    ``vector_index_topk`` call whose probed-cell scan covers the whole
    batch; ``query()`` returns the kind's native single-call rows —
    (neighbor_id, cos, rank) for IVF, (neighbor_id, adc_dist) ordered
    by ascending distance for IVFPQ."""

    def __init__(
        self,
        spark,
        index_path: str,
        k: int = 10,
        n_probe: int = 4,
        max_batch: int = 32,
        max_wait_ms: float = 25.0,
        fs=None,
        as_of: int | str | None = None,
    ):
        from feast_spark.operators.vector_index import (
            vector_index_dim,
            vector_index_kind,
        )

        self._index_path = index_path
        # as_of pins every fused call to one archived commit (seq or
        # tag name); kind, dimensionality and row layout all resolve
        # from the SAME pinned manifest the queries will read
        self._kw = dict(k=k, n_probe=n_probe, fs=fs, as_of=as_of)
        self._as_of = as_of
        kind = vector_index_kind(index_path, fs, as_of=as_of)
        self._dim = vector_index_dim(index_path, fs, kind=kind, as_of=as_of)
        #: row layout of each query() tuple — the kind's native
        #: single-call columns minus query_id (module docstring of
        #: operators/vector_index.py).  _serve_batch reads rows BY
        #: these names, so a verb schema change fails loudly instead
        #: of silently mislabeling wire results.
        self.columns = (
            ("neighbor_id", "adc_dist")
            if kind == "ivfpq"
            else ("neighbor_id", "cos", "rank")
        )
        super().__init__(spark, max_batch=max_batch, max_wait_ms=max_wait_ms)

    def query(self, qvec: list[float]) -> list[tuple]:
        """The single-call ``vector_index_topk`` rows for one query
        vector, minus the query_id column.  Vector shape is validated
        against the index's committed dimensionality BEFORE parking —
        a wrong-length vector fails ITS caller, not the fused batch."""
        return self._submit({"qvec": _check_dim(qvec, self._dim)})

    def _serve_batch(self, batch: list[dict]) -> list[list]:
        from feast_spark.operators.vector_index import vector_index_topk

        qdf = local_df(
            self._spark,
            [(-(i + 1), r["qvec"]) for i, r in enumerate(batch)],
            "vec_id LONG, embedding ARRAY<DOUBLE>",
        )
        rows = vector_index_topk(
            self._spark, self._index_path, qdf, **self._kw
        ).collect()
        # self.columns is the one source of truth for the row layout:
        # rows are read BY NAME, so a reordered/renamed verb column
        # raises instead of silently pairing values under wrong keys
        has_rank = "rank" in self.columns  # IVF; IVFPQ orders by ADC
        return self._group_by_request(
            rows, len(batch),
            sort_key=(
                (lambda r: r["rank"]) if has_rank
                else (lambda r: (r["adc_dist"], r["neighbor_id"]))
            ),
            row_tuple=lambda r: tuple(r[c] for c in self.columns),
        )
