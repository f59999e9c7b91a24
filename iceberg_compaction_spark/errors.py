"""Error classes + retry-with-backoff.

Mirrors the reference's error-class-aware retry semantics
(``/root/reference/crates/common/src/retry.rs:14-242``,
``crates/common/src/error.rs:52-75``): retryable classes get exponential
backoff with jitter; fatal classes raise immediately. Spark retries
*task* failures itself, so this wrapper is only used around driver-side
commit / IO critical sections.
"""

from __future__ import annotations

import random
import time
from typing import Callable, TypeVar

T = TypeVar("T")


class CompactionError(Exception):
    retryable = False


class CommitConflict(CompactionError):
    """Concurrent commit changed the table under us (reference
    ``TECHNICAL_DEEP_DIVE.md:277-313`` conflict re-validation)."""

    retryable = True


class StorageError(CompactionError):
    retryable = True


class ValidationError(CompactionError):
    retryable = False


def backoff_delays(
    base_s: float, cap_s: float, retries: int, jitter: float = 0.25, seed: int | None = None
):
    """Exponential backoff ×2 capped, with proportional jitter.

    The reference uses golden-ratio jitter and a deliberately higher
    commit jitter (0.25) to de-collide concurrent committers
    (``retry.rs:73-101``)."""
    rng = random.Random(seed)
    for i in range(retries):
        d = min(base_s * (2**i), cap_s)
        yield d * (1.0 + jitter * rng.random())


def with_retry(
    fn: Callable[[], T],
    retries: int = 3,
    base_s: float = 0.05,
    cap_s: float = 30.0,
    retry_on: tuple = (CompactionError,),
    seed: int | None = None,
) -> T:
    last: Exception | None = None
    delays = list(backoff_delays(base_s, cap_s, retries, seed=seed))
    for attempt in range(retries + 1):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203
            if not getattr(e, "retryable", True):
                raise
            last = e
            if attempt < retries:
                time.sleep(delays[attempt])
    assert last is not None
    raise last
