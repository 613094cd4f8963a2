"""HTTP push frontend (the serve transport, S4/S5/S6).

A thin stdlib ``ThreadingHTTPServer`` over
:class:`~swarm_spark.streaming.serve.NotificationProcessor`,
reproducing the reference server's contract
(/root/reference/pkg/controller/server/server.go:54-160):

- routes: ``GET /health``, ``POST /event/pubsub/cs``,
  ``POST /event/pubsub/swarm``, ``POST /event/eventarc``;
- status mapping: consumed → 200 "OK"; blocked/transient → 205 Reset
  Content (Pub/Sub redelivers after the ack deadline; 2xx would ack);
  malformed/unprocessable → 400;
- middleware: per-request id + access log, and the
  :class:`~swarm_spark.streaming.auth.AuthPolicy` deny rules → 401
  Unauthorized (middleware.go:39 contract).

Driver-side only: one notification is metadata-sized work; the data
path it triggers (``pipeline.load_objects``) is the distributed part.
The threading server exists so slow loads don't block health checks,
not for data parallelism.
"""

from __future__ import annotations

import json
import logging
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .auth import AuthDenied, AuthInput, AuthPolicy
from .serve import Ack, NotificationProcessor

log = logging.getLogger("swarm_spark.http")

_ACK_STATUS = {Ack.OK: 200, Ack.RETRY: 205, Ack.DROP: 400}
_POST_ROUTES = ("/event/pubsub/cs", "/event/pubsub/swarm", "/event/eventarc")


def make_handler(processor: NotificationProcessor, auth: AuthPolicy | None):
    """Build the request-handler class bound to a processor."""

    class Handler(BaseHTTPRequestHandler):
        server_version = "swarm-spark"

        # ------------------------------------------------ plumbing
        def _reply(self, status: int, text: str) -> None:
            body = text.encode()
            self.send_response(status)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route through logging
            log.info("%s %s", self.address_string(), fmt % args)

        def _authorized(self, body) -> bool:
            if auth is None:
                return True
            try:
                auth.authorize(
                    AuthInput(
                        method=self.command,
                        path=self.path,
                        remote=self.client_address[0],
                        header=dict(self.headers.items()),
                        body=body,
                    )
                )
                return True
            except AuthDenied as e:
                # middleware.go:39: http.Error(w, "Unauthorized", 401)
                self._reply(401, f"unauthorized: {e.rule}")
                return False

        # ------------------------------------------------- routes
        def do_GET(self):
            rid = uuid.uuid4().hex[:12]
            if self.path == "/health":
                if self._authorized(None):
                    self._reply(200, "OK")
                return
            if self.path in _POST_ROUTES:
                self._reply(405, "method not allowed")
                return
            log.info("[%s] GET %s -> 404", rid, self.path)
            self._reply(404, "not found")

        def do_POST(self):
            rid = uuid.uuid4().hex[:12]
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, "bad json")
                return
            if not isinstance(body, dict):
                # valid JSON but not an object ([] / "x" / 3): the
                # notification parsers need a mapping — 400, not a
                # handler-thread AttributeError
                self._reply(400, "bad json: object required")
                return
            if not self._authorized(body):
                return
            if self.path in ("/event/pubsub/cs", "/event/pubsub/swarm"):
                # one parser handles both: the decoded payload shape
                # (single event vs {objects: [...]}) selects the path
                res = processor.handle_pubsub(body)
            elif self.path == "/event/eventarc":
                res = processor.handle_eventarc(body)
            else:
                self._reply(404, "not found")
                return
            status = _ACK_STATUS[res.ack]
            log.info("[%s] POST %s -> %d (%s)", rid, self.path, status, res.reason)
            self._reply(status, "OK" if res.ack is Ack.OK else res.reason or res.ack.value)

    return Handler


class ServeFrontend:
    """Owns the HTTP server lifecycle around a processor."""

    def __init__(
        self,
        processor: NotificationProcessor,
        host: str = "127.0.0.1",
        port: int = 0,
        auth: AuthPolicy | None = None,
    ):
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(processor, auth)
        )
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self.httpd.server_address[:2]

    def start(self) -> "ServeFrontend":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "ServeFrontend":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
