"""Exactly-once state on an external transactional KV store (X1 for
drivers WITHOUT a shared filesystem).

Reference semantics (/root/reference/pkg/infra/firestore/client.go:
24-91): ``GetOrCreateState`` runs get-check-set inside ONE store
transaction (acquire iff absent, FAILED, or expired RUNNING — COMPLETED
never re-acquires); ``UpdateState`` is a merge-set of
``{state, updated_at}``. This module keeps the same State model and
method surface as :class:`~swarm_spark.streaming.state.StateStore`, so
the serve path swaps backends by constructor choice alone; on top of
reference parity, ``update`` supports the same request_id FENCING the
file ledger has (implemented transactionally here).

The store dependency is a minimal transactional-KV protocol
(:class:`InMemoryKV` is the in-process reference implementation and the
test double; :func:`firestore_kv` adapts the real wire, env-gated on
``google-cloud-firestore``, absent from this container). The protocol
is one method — ``run_transaction(fn)`` calling ``fn(tx)`` with a
``tx`` exposing ``get(collection, doc_id)``, ``set(collection, doc_id,
data)``, ``delete(collection, doc_id)`` — exactly the subset the
reference client uses, so any serializable-transaction store
(Firestore, DynamoDB, a SQL row store) can implement it.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import asdict
from typing import Any, Callable

from .state import (
    DEFAULT_POLL_S,
    DEFAULT_TIMEOUT_S,
    DEFAULT_TTL_S,
    MsgState,
    State,
)


class InMemoryKV:
    """Single-process transactional KV: a dict under one lock. The
    coarse lock gives every transaction strict serializability — the
    same guarantee the Firestore adapter gets from server transactions
    — making this both the unit-test double and a usable local backend."""

    def __init__(self):
        self._data: dict[tuple[str, str], dict] = {}
        self._lock = threading.Lock()

    class _Tx:
        def __init__(self, data):
            self._data = data

        def get(self, collection: str, doc_id: str) -> dict | None:
            v = self._data.get((collection, doc_id))
            return dict(v) if v is not None else None

        def set(self, collection: str, doc_id: str, data: dict) -> None:
            self._data[(collection, doc_id)] = dict(data)

        def delete(self, collection: str, doc_id: str) -> None:
            self._data.pop((collection, doc_id), None)

    def run_transaction(self, fn: Callable[[Any], Any]) -> Any:
        with self._lock:
            return fn(self._Tx(self._data))

    def scan(self, collection: str) -> list[tuple[str, dict]]:
        with self._lock:
            return [
                (doc_id, dict(v))
                for (coll, doc_id), v in self._data.items()
                if coll == collection
            ]


def firestore_kv(project_id: str, database_id: str = "(default)"):
    """Adapt a real Firestore database to the transactional-KV protocol
    (env-gated: google-cloud-firestore is not in this container)."""
    try:
        from google.cloud import firestore
    except ImportError as e:  # pragma: no cover - env-gated
        raise NotImplementedError(
            "firestore_kv needs google-cloud-firestore "
            "(not in this container); use InMemoryKV or the file ledger"
        ) from e

    client = firestore.Client(project=project_id, database=database_id)

    class _FirestoreTx:  # pragma: no cover - env-gated
        def __init__(self, tx):
            self._tx = tx

        def get(self, collection, doc_id):
            snap = self._tx.get(client.collection(collection).document(doc_id))
            snaps = list(snap) if not hasattr(snap, "exists") else [snap]
            for s in snaps:
                return s.to_dict() if s.exists else None
            return None

        def set(self, collection, doc_id, data):
            self._tx.set(client.collection(collection).document(doc_id), data)

        def delete(self, collection, doc_id):
            self._tx.delete(client.collection(collection).document(doc_id))

    class _FirestoreKV:  # pragma: no cover - env-gated
        def run_transaction(self, fn):
            transaction = client.transaction()

            @firestore.transactional
            def _run(tx):
                return fn(_FirestoreTx(tx))

            return _run(transaction)

    return _FirestoreKV()


class TransactionalStateStore:
    """Drop-in alternative to the file-ledger StateStore backed by any
    transactional KV — same methods, same State model, same acquire/
    fencing semantics, no shared filesystem required."""

    def __init__(
        self,
        kv,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        ttl_s: float = DEFAULT_TTL_S,
        clock: Callable[[], float] = time.time,
    ):
        self.kv = kv
        self.timeout_s = timeout_s
        self.ttl_s = ttl_s
        self.clock = clock

    def _get(self, msg_type: str, msg_id: str) -> State | None:
        cur = self.kv.run_transaction(lambda tx: tx.get(msg_type, msg_id))
        return State(**cur) if cur is not None else None

    def get_or_create(self, msg_type: str, msg_id: str) -> tuple[State, bool]:
        """(state, acquired) — get-check-set in ONE store transaction
        (client.go GetOrCreateState): acquired=False when COMPLETED or
        unexpired RUNNING; FAILED / expired RUNNING re-acquire."""
        now = self.clock()
        fresh = State(
            msg_type=msg_type,
            msg_id=msg_id,
            request_id=uuid.uuid4().hex,
            state=MsgState.RUNNING.value,
            created_at=now,
            updated_at=now,
            expires_at=now + self.timeout_s,
            ttl_s=self.ttl_s,
        )

        def txn(tx) -> tuple[State, bool]:
            cur = tx.get(msg_type, msg_id)
            if cur is not None:
                st = State(**cur)
                if st.state == MsgState.COMPLETED.value:
                    return st, False
                if st.state == MsgState.RUNNING.value and not st.is_expired(now):
                    return st, False
            tx.set(msg_type, msg_id, asdict(fresh))
            return fresh, True

        return self.kv.run_transaction(txn)

    def update(
        self,
        msg_type: str,
        msg_id: str,
        new_state: MsgState,
        request_id: str | None = None,
    ) -> bool:
        """Mark completed/failed; with ``request_id`` the update is
        fenced inside the transaction (False = lost holdership)."""

        def txn(tx) -> bool:
            cur = tx.get(msg_type, msg_id)
            if cur is None:
                raise KeyError(f"no state for {msg_type}/{msg_id}")
            if request_id is not None and cur["request_id"] != request_id:
                return False
            cur["state"] = new_state.value
            cur["updated_at"] = self.clock()
            tx.set(msg_type, msg_id, cur)
            return True

        return self.kv.run_transaction(txn)

    def wait(
        self,
        msg_type: str,
        msg_id: str,
        poll_s: float = DEFAULT_POLL_S,
        deadline_s: float = 60.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> bool:
        end = self.clock() + deadline_s
        while True:
            cur = self._get(msg_type, msg_id)
            if cur is not None and cur.state == MsgState.COMPLETED.value:
                return True
            if cur is not None and cur.state == MsgState.FAILED.value:
                return False
            if self.clock() >= end:
                return False
            sleep(poll_s)

    def sweep_expired_ttl(self, msg_type: str) -> int:
        """TTL sweep for backends exposing ``scan`` (Firestore itself
        uses server-side TTL policies; the reference relies on that)."""
        if not hasattr(self.kv, "scan"):
            raise NotImplementedError("backend has no scan; use store-side TTL")
        now = self.clock()
        n = 0
        for doc_id, data in self.kv.scan(msg_type):
            st = State(**data)
            if now - st.created_at > st.ttl_s:
                self.kv.run_transaction(
                    lambda tx, d=doc_id: tx.delete(msg_type, d)
                )
                n += 1
        return n
