"""Retry with exponential backoff for flaky landed-file / catalog reads.

The reference leans on Prefect task retries for transient extract failures
(/root/reference/src/impulsoetl/brasilapi/cep.py:60-61,
scnes/estabelecimentos_identificados/extracao.py:90-91). Inside the data
plane Spark's own task retries cover transient executor failures, and
``LakeTable.merge`` already retries ``CommitConflict`` — this helper covers
the remaining control-plane gap: driver-side reads of freshly-landed files
(eventually-consistent listings, NFS/object-store hiccups) before a job is
even defined.

Deliberately synchronous and driver-side only: never wrap per-row work in
it (that is what Spark task retries are for).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

__all__ = ["with_retries", "retrying"]

T = TypeVar("T")


def with_retries(
    fn: Callable[[], T],
    attempts: int = 3,
    base_delay: float = 0.2,
    backoff: float = 2.0,
    retry_on: tuple[type[BaseException], ...] = (OSError, IOError),
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> T:
    """Call ``fn`` up to ``attempts`` times; sleep ``base_delay * backoff**i``
    between tries. Re-raises the last error once attempts are exhausted.
    Only exceptions in ``retry_on`` are retried — anything else propagates
    immediately (a parse error will not become less wrong on retry)."""
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except retry_on as exc:  # noqa: PERF203 — control-plane loop
            last = exc
            if on_retry is not None:
                on_retry(i + 1, exc)
            if i < attempts - 1:
                sleep(base_delay * (backoff ** i))
    assert last is not None
    raise last


def retrying(**kwargs):
    """Decorator form of :func:`with_retries`:

    >>> @retrying(attempts=4, retry_on=(OSError,))
    ... def list_landed(): ...
    """

    def deco(fn):
        def wrapped(*a, **kw):
            return with_retries(lambda: fn(*a, **kw), **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", "wrapped")
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco
