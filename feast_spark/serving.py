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

The server is a thin transport: every request resolves through
``FeatureStore.get_online_features`` (same statuses, same on-demand
transforms), so server-path and in-process reads can never diverge.
Binary feature payloads for reference-compatible KV stores remain the
job of ``export_online_wire`` (functions/value_proto.py).
"""

from __future__ import annotations

import json
import threading
from datetime import date, datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

__all__ = ["OnlineServingServer", "serve_online"]


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
    context manager or call :meth:`start` / :meth:`stop`."""

    def __init__(self, store, host: str = "127.0.0.1", port: int = 0):
        self.store = store
        self._httpd = ThreadingHTTPServer((host, port), self._handler_cls())
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def _handler_cls(self):
        store = self.store

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

            def do_GET(self):  # noqa: N802
                if self.path == "/health":
                    self._send(200, {"status": "ok"})
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
