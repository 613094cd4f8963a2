"""Backfill enqueue: batch → stream bridge (operators E1/E2, S3).

Reference (/root/reference/pkg/usecase/enqueue.go:15-104): list objects
under prefixes, accumulate until 128 objects or 4 MiB of object size,
publish each batch as one swarm message. Same caps here
(pkg/usecase/usecase.go:32-33).

Publishers (E2): in-memory queue (drives NotificationProcessor directly
in tests/local mode) and a file dumper (pkg/infra/pubsub/dumper.go
analogue). A real Pub/Sub publisher slots into the same one-method
interface.
"""

from __future__ import annotations

import base64
import glob as globmod
import json
import os
import uuid
from dataclasses import dataclass, field

from ..model import ObjectMeta
from ..streaming.messages import make_swarm_message

ENQUEUE_COUNT_LIMIT = 128
ENQUEUE_SIZE_LIMIT = 4 * 1024 * 1024  # 4 MiB


class Publisher:
    def publish(self, payload: dict) -> str:
        """Publish one message payload; returns a message id."""
        raise NotImplementedError


class MemoryPublisher(Publisher):
    """Collects pubsub-push-shaped bodies; feed them straight into
    NotificationProcessor.handle_pubsub."""

    def __init__(self):
        self.bodies: list[dict] = []

    def publish(self, payload: dict) -> str:
        msg_id = uuid.uuid4().hex
        self.bodies.append(
            {
                "message": {
                    "data": base64.b64encode(json.dumps(payload).encode()).decode(),
                    "message_id": msg_id,
                },
                "subscription": "local",
            }
        )
        return msg_id


class FileDumpPublisher(Publisher):
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def publish(self, payload: dict) -> str:
        msg_id = uuid.uuid4().hex
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps({"message_id": msg_id, "payload": payload}) + "\n")
        return msg_id


class PubSubClientPublisher(Publisher):
    """Real Google Pub/Sub publisher (reference
    pkg/infra/pubsub/client.go:24-27: ``topic.Publish(data).Get`` — a
    synchronous publish returning the server message id).

    Env-gated: constructing without an injected ``topic_publish``
    requires ``google-cloud-pubsub`` (absent from this container) plus
    project/topic ids. Tests inject a fake ``topic_publish(data: bytes)
    -> str`` to pin payload shape and id plumbing without the wire.
    """

    def __init__(
        self,
        project_id: str | None = None,
        topic_id: str | None = None,
        topic_publish=None,
    ):
        if topic_publish is not None:
            self._publish = topic_publish
            return
        try:
            from google.cloud import pubsub_v1
        except ImportError as e:  # pragma: no cover - env-gated
            raise NotImplementedError(
                "PubSubClientPublisher needs google-cloud-pubsub "
                "(not in this container) or an injected topic_publish"
            ) from e
        if not project_id or not topic_id:
            raise ValueError("project_id and topic_id are required")
        client = pubsub_v1.PublisherClient()
        topic = client.topic_path(project_id, topic_id)

        def _wire_publish(data: bytes) -> str:  # pragma: no cover - env-gated
            return client.publish(topic, data).result()

        self._publish = _wire_publish

    def publish(self, payload: dict) -> str:
        return str(self._publish(json.dumps(payload).encode()))


def list_local_objects(pattern: str, bucket: str = "local") -> list[ObjectMeta]:
    """S3 analogue for local paths: glob → ObjectMeta list with sizes."""
    out = []
    for p in sorted(globmod.glob(pattern)):
        if os.path.isfile(p):
            out.append(
                ObjectMeta(
                    bucket=bucket,
                    name=os.path.basename(p),
                    size=os.path.getsize(p),
                    created_at=int(os.path.getmtime(p)),
                    path=p,
                )
            )
    return out


@dataclass
class EnqueueResult:
    messages: list[str] = field(default_factory=list)
    objects: int = 0
    batches: int = 0


def enqueue(
    objs: list[ObjectMeta],
    publisher: Publisher,
    count_limit: int = ENQUEUE_COUNT_LIMIT,
    size_limit: int = ENQUEUE_SIZE_LIMIT,
) -> EnqueueResult:
    """Chunk objects into swarm messages under both caps and publish."""
    res = EnqueueResult()
    batch: list[ObjectMeta] = []
    batch_size = 0

    def flush():
        nonlocal batch, batch_size
        if batch:
            res.messages.append(publisher.publish(make_swarm_message(batch)))
            res.batches += 1
            batch, batch_size = [], 0

    for o in objs:
        if batch and (len(batch) >= count_limit or batch_size + o.size > size_limit):
            flush()
        batch.append(o)
        batch_size += o.size
        res.objects += 1
    flush()
    return res
