"""Socket-backed transactional-KV fake: the cross-process analogue of
``InMemoryKV`` for contention tests.

The Firestore adapter's guarantee is strict serializability of
``run_transaction`` bodies; this fake provides the same guarantee
across PROCESSES the way the public Firestore emulator does for its
clients — a server-side global transaction lock held from BEGIN to
COMMIT (or connection drop) — so multi-process acquire/expiry/fencing
races against :class:`TransactionalStateStore` exercise the real
protocol shape: every get-check-set runs as one isolated transaction
over the wire, not a lock shared through fork.

Wire protocol: newline-delimited JSON, one transaction per
connection: {"op": "begin"} → {"op": "get"|"set"|"del", ...}* →
{"op": "commit"}. Test-grade by design (no timeouts, no partial-
failure recovery) — the production adapters are firestore_kv and the
file ledger.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
from typing import Any, Callable


class KVServer:
    """Run with ``serve_background()``; strictly serializes
    transactions with one global lock (held begin→commit)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.data: dict[tuple[str, str], dict] = {}
        self.txn_lock = threading.Lock()
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                holding = False
                try:
                    for raw in self.rfile:
                        req = json.loads(raw)
                        op = req["op"]
                        if op == "begin":
                            outer.txn_lock.acquire()
                            holding = True
                            resp = {"ok": True}
                        elif op == "get":
                            v = outer.data.get((req["c"], req["k"]))
                            resp = {"ok": True, "v": v}
                        elif op == "set":
                            outer.data[(req["c"], req["k"])] = req["v"]
                            resp = {"ok": True}
                        elif op == "del":
                            outer.data.pop((req["c"], req["k"]), None)
                            resp = {"ok": True}
                        elif op == "commit":
                            if holding:
                                outer.txn_lock.release()
                                holding = False
                            resp = {"ok": True}
                        else:
                            resp = {"ok": False, "err": f"bad op {op!r}"}
                        self.wfile.write((json.dumps(resp) + "\n").encode())
                        self.wfile.flush()
                finally:
                    if holding:  # dropped connection mid-transaction
                        outer.txn_lock.release()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self.port = self.server.server_address[1]

    def serve_background(self) -> "KVServer":
        t = threading.Thread(target=self.server.serve_forever, daemon=True)
        t.start()
        return self

    def shutdown(self) -> None:
        self.server.shutdown()
        self.server.server_close()


class SocketKV:
    """Client side of the transactional-KV protocol over a socket —
    drop-in for ``InMemoryKV`` in :class:`TransactionalStateStore`."""

    def __init__(self, host: str, port: int):
        self.host = host
        self.port = port

    class _Tx:
        def __init__(self, sock_file_r, sock_file_w):
            self._r = sock_file_r
            self._w = sock_file_w

        def _rpc(self, req: dict) -> Any:
            self._w.write((json.dumps(req) + "\n").encode())
            self._w.flush()
            resp = json.loads(self._r.readline())
            if not resp.get("ok"):
                raise RuntimeError(resp.get("err", "kv error"))
            return resp.get("v")

        def get(self, collection: str, doc_id: str):
            return self._rpc({"op": "get", "c": collection, "k": doc_id})

        def set(self, collection: str, doc_id: str, data: dict) -> None:
            self._rpc({"op": "set", "c": collection, "k": doc_id, "v": data})

        def delete(self, collection: str, doc_id: str) -> None:
            self._rpc({"op": "del", "c": collection, "k": doc_id})

    def run_transaction(self, fn: Callable[[Any], Any]) -> Any:
        with socket.create_connection((self.host, self.port), timeout=30) as s:
            r = s.makefile("rb")
            w = s.makefile("wb")
            tx = self._Tx(r, w)
            tx._rpc({"op": "begin"})
            try:
                out = fn(tx)
            finally:
                tx._rpc({"op": "commit"})
            return out
