from .filestream import stream_ingest
from .messages import (
    make_swarm_message,
    parse_eventarc_direct,
    parse_pubsub_push,
    storage_event_to_object,
)
from .serve import Ack, NotificationProcessor, ServeResult
from .state import MsgState, State, StateStore

__all__ = [
    "Ack",
    "MsgState",
    "NotificationProcessor",
    "ServeResult",
    "State",
    "StateStore",
    "make_swarm_message",
    "parse_eventarc_direct",
    "parse_pubsub_push",
    "storage_event_to_object",
    "stream_ingest",
]
