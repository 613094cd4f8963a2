from .auth import AuthDenied, AuthInput, AuthPolicy
from .filestream import stream_ingest
from .windows import session_counts, windowed_counts
from .messages import (
    make_swarm_message,
    parse_eventarc_direct,
    parse_pubsub_push,
    storage_event_to_object,
)
from .http import ServeFrontend
from .serve import Ack, NotificationProcessor, ServeResult
from .state import MsgState, State, StateStore
from .stateful import dedup_within_watermark, first_seen_gate, sessionize_stream

__all__ = [
    "Ack",
    "AuthDenied",
    "AuthInput",
    "AuthPolicy",
    "MsgState",
    "NotificationProcessor",
    "ServeFrontend",
    "ServeResult",
    "State",
    "StateStore",
    "dedup_within_watermark",
    "first_seen_gate",
    "sessionize_stream",
    "make_swarm_message",
    "parse_eventarc_direct",
    "parse_pubsub_push",
    "session_counts",
    "storage_event_to_object",
    "stream_ingest",
    "windowed_counts",
]
