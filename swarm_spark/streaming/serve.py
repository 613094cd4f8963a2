"""Notification-driven ingestion (the serve path, SURVEY §3.1) with
exactly-once message handling and queue-redelivery semantics (X1/X2).

The reference is an HTTP push endpoint; the engine-side equivalent is a
processor you hand decoded message bodies to (from any transport: an
HTTP frontend, a Pub/Sub pull loop, a local queue). Ack semantics map
1:1 to the reference's status codes (server.go:64-87):

- ``Ack.OK``      → 2xx: message consumed (or already completed);
- ``Ack.RETRY``   → 205: redeliver later (another holder is RUNNING,
                    or processing failed transiently);
- ``Ack.DROP``    → 4xx: malformed, never redeliver.

Failure never acks (X2): the state is marked FAILED (re-acquirable)
and the queue is asked to redeliver.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from ..model import ModelError
from ..pipeline.ingest import IngestPipeline, IngestStats
from .messages import parse_pubsub_push
from .state import MsgState, StateStore

MSG_TYPE_PUBSUB = "pubsub_message"


class Ack(str, Enum):
    OK = "ok"
    RETRY = "retry"
    DROP = "drop"


@dataclass
class ServeResult:
    ack: Ack
    msg_id: str | None = None
    stats: IngestStats | None = None
    reason: str = ""


class NotificationProcessor:
    def __init__(self, pipeline: IngestPipeline, states: StateStore, wait_running_s: float = 0.0):
        self.pipeline = pipeline
        self.states = states
        self.wait_running_s = wait_running_s

    def handle_pubsub(self, body: dict) -> ServeResult:
        try:
            msg_id, objs = parse_pubsub_push(body)
        except ModelError as e:
            return ServeResult(Ack.DROP, reason=f"bad envelope: {e}")

        st, acquired = self.states.get_or_create(MSG_TYPE_PUBSUB, msg_id)
        if not acquired:
            if st.state == MsgState.COMPLETED.value:
                return ServeResult(Ack.OK, msg_id, reason="already completed")
            # another holder RUNNING: optionally wait, else ask for
            # redelivery inside the queue's ack deadline (HTTP 205)
            if self.wait_running_s > 0 and self.states.wait(
                MSG_TYPE_PUBSUB, msg_id, poll_s=0.05, deadline_s=self.wait_running_s
            ):
                return ServeResult(Ack.OK, msg_id, reason="completed by other holder")
            return ServeResult(Ack.RETRY, msg_id, reason="running elsewhere")

        try:
            stats = self.pipeline.load_objects(objs)
        except ModelError as e:
            self.states.update(
                MSG_TYPE_PUBSUB, msg_id, MsgState.FAILED, request_id=st.request_id
            )
            return ServeResult(Ack.DROP, msg_id, reason=f"unprocessable: {e}")
        except Exception as e:  # transient: never ack (X2)
            self.states.update(
                MSG_TYPE_PUBSUB, msg_id, MsgState.FAILED, request_id=st.request_id
            )
            return ServeResult(Ack.RETRY, msg_id, reason=f"failed: {e}")
        if not self.states.update(
            MSG_TYPE_PUBSUB, msg_id, MsgState.COMPLETED, request_id=st.request_id
        ):
            # fenced out: we exceeded the state timeout and another
            # holder took the message over — content-hash ids make the
            # double-load downstream-dedupable; report retry-neutral OK
            return ServeResult(Ack.OK, msg_id, stats=stats, reason="fenced (taken over)")
        return ServeResult(Ack.OK, msg_id, stats=stats)

    def handle_eventarc(self, body: dict) -> ServeResult:
        """Eventarc direct delivery (S6): the object event IS the body.

        No queue message id exists, so the idempotency key is the
        object's identity (bucket/name@generation) — a re-delivered
        finalize event for the same object generation is a no-op.
        """
        from .messages import parse_eventarc_direct

        try:
            obj = parse_eventarc_direct(body)
        except ModelError as e:
            return ServeResult(Ack.DROP, reason=f"bad event: {e}")
        gen = (obj.data or {}).get("generation", "")
        msg_id = f"{obj.bucket}/{obj.name}@{gen}"

        st, acquired = self.states.get_or_create("eventarc", msg_id)
        if not acquired:
            if st.state == MsgState.COMPLETED.value:
                return ServeResult(Ack.OK, msg_id, reason="already completed")
            return ServeResult(Ack.RETRY, msg_id, reason="running elsewhere")
        try:
            stats = self.pipeline.load_objects([obj])
        except ModelError as e:
            self.states.update(
                "eventarc", msg_id, MsgState.FAILED, request_id=st.request_id
            )
            return ServeResult(Ack.DROP, msg_id, reason=f"unprocessable: {e}")
        except Exception as e:
            self.states.update(
                "eventarc", msg_id, MsgState.FAILED, request_id=st.request_id
            )
            return ServeResult(Ack.RETRY, msg_id, reason=f"failed: {e}")
        self.states.update(
            "eventarc", msg_id, MsgState.COMPLETED, request_id=st.request_id
        )
        return ServeResult(Ack.OK, msg_id, stats=stats)
