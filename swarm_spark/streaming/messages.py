"""Notification envelope parsing (operators S4/S5/S6).

Three wire shapes, per FIXTURES.md F3/F4 and the reference models
(/root/reference/pkg/domain/model/message.go):

- Pub/Sub push body: ``{message: {data: <b64>, message_id, attributes},
  subscription}`` where data decodes to a Cloud-Storage object event;
- swarm message: decoded data is ``{objects: [<object-event>...]}`` —
  a batched microbatch (message.go:107-109);
- Eventarc direct event: the object event arrives as the raw body
  (message.go:12-30).

Field quirks reproduced from message.go:64-104: ``size`` and
``generation`` arrive as numeric strings; ``md5Hash`` is base64 of the
raw digest (converted to hex); ``timeCreated`` is RFC3339 with
milliseconds (converted to unix seconds).
"""

from __future__ import annotations

import base64
import binascii
import datetime as dt
import json

from ..model import Digest, ModelError, ObjectMeta


def _parse_rfc3339(s: str | None) -> int:
    if not s:
        return 0
    try:
        return int(dt.datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp())
    except ValueError as e:
        raise ModelError(f"bad timestamp {s!r}") from e


def storage_event_to_object(ev: dict) -> ObjectMeta:
    """Cloud-Storage object event (F3) → ObjectMeta IR."""
    if not isinstance(ev, dict) or "bucket" not in ev or "name" not in ev:
        raise ModelError("storage event requires bucket and name")
    digests = []
    md5b64 = ev.get("md5Hash")
    if md5b64:
        try:
            digests.append(Digest("md5", base64.b64decode(md5b64).hex()))
        except (ValueError, binascii.Error) as e:
            raise ModelError(f"bad md5Hash {md5b64!r}") from e
    try:
        size = int(ev.get("size", 0) or 0)  # numeric-as-string
    except ValueError as e:
        raise ModelError(f"bad size {ev.get('size')!r}") from e
    return ObjectMeta(
        bucket=ev["bucket"],
        name=ev["name"],
        size=size,
        created_at=_parse_rfc3339(ev.get("timeCreated")),
        digests=tuple(digests),
        data=ev,
        path=ev.get("path"),  # local-path extension (tests/dumps)
    )


def swarm_object_to_meta(o: dict) -> ObjectMeta:
    """Reference swarm-message object (model.Object wire shape,
    usecase.go:30-48: ``{cs:{bucket,name}, size, created_at,
    digests:[{alg,value}], data}``) → ObjectMeta IR."""
    cs = o.get("cs") or {}
    if "bucket" not in cs or "name" not in cs:
        raise ModelError("swarm object requires cs.bucket and cs.name")
    try:
        digests = tuple(Digest(d["alg"], d["value"]) for d in o.get("digests") or [])
    except (KeyError, TypeError) as e:
        raise ModelError(f"bad digests in swarm object: {o.get('digests')!r}") from e
    return ObjectMeta(
        bucket=cs["bucket"],
        name=cs["name"],
        size=int(o.get("size") or 0),
        created_at=int(o.get("created_at") or 0),
        digests=digests,
        data=o.get("data"),
        path=o.get("path"),  # local-path extension (tests/dumps)
    )


def parse_pubsub_push(body: dict) -> tuple[str, list[ObjectMeta]]:
    """Pub/Sub push envelope (F4) → (message_id, objects).

    The decoded payload is either one storage event (cs path) or a
    swarm message with an ``objects`` list, each object in the
    reference's model.Object wire shape (or, legacily, a raw storage
    event under ``data``).
    """
    msg = body.get("message") or {}
    msg_id = msg.get("message_id") or msg.get("messageId")
    if not msg_id:
        raise ModelError("pubsub body missing message_id")
    raw = msg.get("data")
    if raw is None:
        raise ModelError("pubsub message missing data")
    try:
        payload = json.loads(base64.b64decode(raw))
    except (ValueError, binascii.Error) as e:
        raise ModelError("pubsub data is not base64 JSON") from e
    if isinstance(payload, dict) and "objects" in payload:
        objs = [
            swarm_object_to_meta(o)
            if "cs" in o
            else storage_event_to_object(o.get("data", o))
            for o in payload["objects"]
        ]
    else:
        objs = [storage_event_to_object(payload)]
    return str(msg_id), objs


def parse_eventarc_direct(body: dict) -> ObjectMeta:
    """Eventarc direct delivery (S6): the event IS the body."""
    return storage_event_to_object(body)


def make_swarm_message(objs: list[ObjectMeta]) -> dict:
    """Encode a batch of objects as one swarm message payload (E1),
    in the reference's model.Object wire shape (usecase.go:30-48) so
    messages interoperate both ways; ``path`` is a local extension."""
    out = []
    for o in objs:
        entry: dict = {
            "cs": {"bucket": o.bucket, "name": o.name},
            "size": o.size,
            "created_at": o.created_at,
            "digests": [{"alg": d.alg, "value": d.value} for d in o.digests],
            "data": o.data,
        }
        if o.path is not None:
            entry["path"] = o.path
        out.append(entry)
    return {"objects": out}
