"""Worker process for the multi-process TransactionalStateStore
contention tests. Run as a script:

    python _kv_contention_worker.py race    PORT MSG_ID START_FILE
    python _kv_contention_worker.py holder  PORT MSG_ID TIMEOUT_S HOLD_S
    python _kv_contention_worker.py taker   PORT MSG_ID

Each mode prints one JSON line per step on stdout; the orchestrating
test parses them. Spawned as fresh interpreters (not forks), so every
worker races through the socket like an independent driver would."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kv_socket import SocketKV  # noqa: E402

from swarm_spark.streaming.state import MsgState  # noqa: E402
from swarm_spark.streaming.state_db import TransactionalStateStore  # noqa: E402


def out(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    mode = sys.argv[1]
    port = int(sys.argv[2])
    msg_id = sys.argv[3]
    kv = SocketKV("127.0.0.1", port)

    if mode == "race":
        start_file = sys.argv[4]
        store = TransactionalStateStore(kv)
        while not os.path.exists(start_file):  # barrier: maximize overlap
            time.sleep(0.005)
        st, acquired = store.get_or_create("t", msg_id)
        out(acquired=acquired, request_id=st.request_id)
    elif mode == "holder":
        timeout_s = float(sys.argv[4])
        hold_s = float(sys.argv[5])
        store = TransactionalStateStore(kv, timeout_s=timeout_s)
        st, acquired = store.get_or_create("t", msg_id)
        out(step="acquire", acquired=acquired, request_id=st.request_id)
        time.sleep(hold_s)  # outlive our own expiry; a taker moves in
        ok = store.update("t", msg_id, MsgState.COMPLETED, request_id=st.request_id)
        out(step="fenced_update", ok=ok)
    elif mode == "taker":
        store = TransactionalStateStore(kv)
        st, acquired = store.get_or_create("t", msg_id)
        out(step="acquire", acquired=acquired, request_id=st.request_id)
        if acquired:
            ok = store.update(
                "t", msg_id, MsgState.COMPLETED, request_id=st.request_id
            )
            out(step="update", ok=ok)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
