"""Write retry with exponential backoff (operator W2).

Reference: exponential backoff 10 ms → ×2 → cap 30 s within a 15-min
deadline, absorbing BigQuery's ~10-min schema-propagation delay, with
stream renewal on schema-mismatch races
(/root/reference/pkg/infra/bq/client.go:64-89,138-142,
pkg/infra/bq/stream.go:87-106).

On Spark most transient write failures are retried by the task
scheduler; this helper covers the *driver-side* retry band the
connector can't see — eventual-consistency races between a schema
update and the first append against it (the local TableSink has no
such race thanks to the lock-guarded schema swap, but BigQuery /
object-store sinks do).
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")

INITIAL_BACKOFF_S = 0.010
MAX_BACKOFF_S = 30.0
DEFAULT_DEADLINE_S = 15 * 60


class RetryDeadlineExceeded(TimeoutError):
    pass


def with_backoff(
    fn: Callable[[], T],
    retryable: Callable[[Exception], bool] = lambda e: True,
    deadline_s: float = DEFAULT_DEADLINE_S,
    initial_s: float = INITIAL_BACKOFF_S,
    max_s: float = MAX_BACKOFF_S,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
    on_retry: Callable[[Exception, int], None] | None = None,
) -> T:
    """Run ``fn`` retrying retryable failures under the W2 envelope."""
    start = clock()
    backoff = initial_s
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — classification is the caller's
            if not retryable(e):
                raise
            attempt += 1
            if clock() - start + backoff > deadline_s:
                raise RetryDeadlineExceeded(
                    f"retry deadline {deadline_s}s exceeded after {attempt} attempts"
                ) from e
            if on_retry:
                on_retry(e, attempt)
            sleep(backoff)
            backoff = min(backoff * 2, max_s)
