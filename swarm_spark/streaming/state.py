"""Exactly-once message state store (operator X1).

Reference semantics (/root/reference/pkg/usecase/state.go:12-66,
pkg/domain/model/state.go:9-31, pkg/infra/firestore/client.go:24-91):

- ``get_or_create(msg_type, msg_id)`` acquires the message unless an
  existing state is COMPLETED, or RUNNING and not yet expired;
- a FAILED or expired-RUNNING state can be re-acquired (redelivery
  picks dead work back up);
- ``update`` marks completed/failed; states carry a TTL (default 7 d)
  after which they are garbage;
- ``wait`` polls until the holder finishes or a deadline passes
  (the serve path then asks the queue to redeliver — X2).

This implementation is a file-per-message ledger with O_EXCL-create as
the transaction primitive. On a SHARED POSIX filesystem it is already
a multi-driver store: O_EXCL is atomic across processes and hosts
(local fs / most cluster filesystems; NFSv3's O_EXCL caveat is the
exception), and the cross-process acquire race is test-pinned with
real concurrent processes (tests/test_streaming.py). Updates are
FENCED: a finisher must present the ``request_id`` it acquired with,
so a timed-out holder whose message was taken over cannot clobber the
new holder's state — the same lost-update protection the reference
gets from running update inside a Firestore transaction. On a cluster
the same interface maps onto a Delta MERGE keyed on
(msg_type, msg_id) or any CAS-capable store; idempotency of the data
itself additionally holds through the content-hash row ids (T2), so a
rare double-acquire degrades to duplicate rows with equal ids that
downstream dedup (x1_dedup_by_id) removes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass
from enum import Enum
from typing import Callable


class MsgState(str, Enum):
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"


DEFAULT_TIMEOUT_S = 30 * 60  # reference defaultStateTimeout
DEFAULT_TTL_S = 7 * 24 * 3600  # reference defaultStateTTL
DEFAULT_POLL_S = 10.0  # reference defaultStateCheckInterval
STALE_LOCK_S = 30.0  # update() lock older than this = orphaned (holder died)


@dataclass
class State:
    msg_type: str
    msg_id: str
    request_id: str
    state: str
    created_at: float
    updated_at: float
    expires_at: float
    ttl_s: float

    def acquired_by(self, request_id: str) -> bool:
        return self.request_id == request_id

    def is_expired(self, now: float) -> bool:
        return now >= self.expires_at


class StateStore:
    def __init__(
        self,
        path: str,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        ttl_s: float = DEFAULT_TTL_S,
        clock: Callable[[], float] = time.time,
    ):
        self.path = path
        self.timeout_s = timeout_s
        self.ttl_s = ttl_s
        self.clock = clock
        os.makedirs(path, exist_ok=True)

    def _file(self, msg_type: str, msg_id: str) -> str:
        safe = f"{msg_type}__{msg_id}".replace("/", "_")
        return os.path.join(self.path, safe + ".json")

    def _read(self, msg_type: str, msg_id: str) -> State | None:
        try:
            with open(self._file(msg_type, msg_id), encoding="utf-8") as f:
                return State(**json.load(f))
        except FileNotFoundError:
            return None

    def _write(self, st: State) -> None:
        p = self._file(st.msg_type, st.msg_id)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(asdict(st), f)
        os.replace(tmp, p)

    # ---------------------------------------------------- lock protocol
    # Acquire = O_EXCL create with a unique token written into the lock.
    # Release = atomic rename to a private name FIRST, then verify the
    # token on that immutable path: the live lock name is never
    # os.remove()d directly, so the old read-token-then-remove gap
    # (breaker + new acquirer interleaving between the read and the
    # remove, deleting the new holder's lock) is closed; a renamed-away
    # lock that turns out not ours is linked back. Stale-break = the
    # same rename-to-tombstone trick — only one breaker can win the
    # rename — then re-verify staleness on the TOMBSTONE; a tombstone
    # that turns out fresh is linked back. The one residual microsecond
    # window (fresh lock renamed between mtime check and rename, new
    # lock created before the link-back) degrades to a doubled critical
    # section, which is safe here: state writes are atomic os.replace,
    # updates are fenced by request_id, and a double-acquire yields
    # duplicate rows with equal content-hash ids that downstream dedup
    # removes (see module docstring).
    def _acquire_lock(self, lock: str) -> tuple[int, str] | None:
        token = uuid.uuid4().hex
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None
        os.write(fd, token.encode())
        return fd, token

    def _release_lock(self, lock: str, fd: int, token: str) -> None:
        os.close(fd)
        priv = lock + f".rel-{uuid.uuid4().hex}"
        try:
            os.rename(lock, priv)
        except OSError:
            return  # already broken as stale — nothing of ours to remove
        try:
            with open(priv, encoding="utf-8") as f:
                mine = f.read() == token
            if not mine:
                # we renamed a NEW holder's lock (ours was broken and
                # replaced): hand it back before dropping the private
                # name; if yet another lock appeared meanwhile, the new
                # holder is fenced by its own token check at release
                try:
                    os.link(priv, lock)
                except OSError:
                    pass
            os.remove(priv)
        except OSError:
            pass

    def _try_break_stale(self, lock: str) -> None:
        """Break an orphaned lock (holder SIGKILLed mid-section) without
        ever deleting a live one."""
        try:
            if time.time() - os.path.getmtime(lock) <= STALE_LOCK_S:
                return
            tomb = lock + f".stale-{uuid.uuid4().hex}"
            os.rename(lock, tomb)  # atomic: exactly one breaker wins
        except OSError:
            return  # lost the race / lock released meanwhile
        try:
            if time.time() - os.path.getmtime(tomb) > STALE_LOCK_S:
                os.remove(tomb)  # confirmed stale on the immutable name
            else:
                # raced a fresh holder: hand the lock back (unless a new
                # one appeared, in which case the fresh holder is fenced
                # out by the token check at its release)
                try:
                    os.link(tomb, lock)
                except OSError:
                    pass
                os.remove(tomb)
        except OSError:
            pass

    def get_or_create(self, msg_type: str, msg_id: str) -> tuple[State, bool]:
        """Returns (state, acquired). Acquired=False when another holder
        has it RUNNING (unexpired) or it COMPLETED already."""
        now = self.clock()
        request_id = uuid.uuid4().hex
        fresh = State(
            msg_type=msg_type,
            msg_id=msg_id,
            request_id=request_id,
            state=MsgState.RUNNING.value,
            created_at=now,
            updated_at=now,
            expires_at=now + self.timeout_s,
            ttl_s=self.ttl_s,
        )
        lock = self._file(msg_type, msg_id) + ".lock"
        while True:
            got = self._acquire_lock(lock)
            if got is not None:
                break
            before = None
            try:
                before = os.path.getmtime(lock)
            except OSError:
                continue  # just released/broken — retry acquire
            if time.time() - before > STALE_LOCK_S:
                # orphaned (holder SIGKILLed mid-section) — break and retry
                self._try_break_stale(lock)
                continue
            # a fresh lock means another process mid-transition —
            # treat as not acquired (redelivery will retry)
            cur = self._read(msg_type, msg_id)
            return (cur or fresh), False
        fd, token = got
        try:
            cur = self._read(msg_type, msg_id)
            if cur is None:
                self._write(fresh)
                return fresh, True
            if cur.state == MsgState.COMPLETED.value:
                return cur, False
            if cur.state == MsgState.RUNNING.value and not cur.is_expired(now):
                return cur, False
            # FAILED or expired RUNNING → re-acquire (model/state.go Acquired())
            self._write(fresh)
            return fresh, True
        finally:
            self._release_lock(lock, fd, token)

    def update(
        self,
        msg_type: str,
        msg_id: str,
        new_state: MsgState,
        request_id: str | None = None,
    ) -> bool:
        """Mark completed/failed. When ``request_id`` is given the
        update is FENCED: it applies only if that request still holds
        the state (False = lost the holdership — another process took
        the message over after this holder's timeout; its result must
        be discarded, not recorded). ``request_id=None`` keeps the
        unfenced single-driver behavior."""
        lock = self._file(msg_type, msg_id) + ".lock"
        got = None
        deadline = time.monotonic() + 5.0
        while got is None:  # short CAS section; holders never block long
            got = self._acquire_lock(lock)
            if got is not None:
                break
            # break orphaned locks: the critical section is a few file
            # ops, so a lock older than STALE_LOCK_S can only belong to
            # a process killed mid-update — without this a SIGKILLed
            # holder would wedge the message forever
            self._try_break_stale(lock)
            if time.monotonic() > deadline:
                raise TimeoutError(f"state lock stuck for {msg_type}/{msg_id}")
            time.sleep(0.01)
        fd, token = got
        try:
            cur = self._read(msg_type, msg_id)
            if cur is None:
                raise KeyError(f"no state for {msg_type}/{msg_id}")
            if request_id is not None and cur.request_id != request_id:
                return False  # fenced out: a takeover owns this message now
            cur.state = new_state.value
            cur.updated_at = self.clock()
            self._write(cur)
            return True
        finally:
            self._release_lock(lock, fd, token)

    def wait(
        self,
        msg_type: str,
        msg_id: str,
        poll_s: float = DEFAULT_POLL_S,
        deadline_s: float = 60.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> bool:
        """Poll until the holder finishes; True if it COMPLETED."""
        end = self.clock() + deadline_s
        while True:
            cur = self._read(msg_type, msg_id)
            if cur is not None and cur.state == MsgState.COMPLETED.value:
                return True
            if cur is not None and cur.state == MsgState.FAILED.value:
                return False
            if self.clock() >= end:
                return False
            sleep(poll_s)

    def sweep_expired_ttl(self) -> int:
        """Drop states older than their TTL (Firestore TTL analogue)."""
        now = self.clock()
        n = 0
        for f in os.listdir(self.path):
            if not f.endswith(".json"):
                continue
            p = os.path.join(self.path, f)
            try:
                with open(p, encoding="utf-8") as fh:
                    st = State(**json.load(fh))
                if now - st.created_at > st.ttl_s:
                    os.remove(p)
                    n += 1
            except (OSError, ValueError, TypeError):
                continue
        return n
