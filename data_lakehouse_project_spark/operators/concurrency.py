"""Optimistic-concurrency retry for FOREIGN-table commits.

Both foreign writers commit with exclusive create (Delta: the next
``_delta_log/N.json``; Iceberg: the next ``vN.metadata.json``), so a
lost race raises :class:`ConcurrentCommitError` after rolling back the
loser's staged files.  Every writer entry point re-reads the snapshot
and re-validates (constraints, MERGE ambiguity, DV conflicts) before
staging, which makes re-invocation the correct optimistic-concurrency
loop: re-read, re-validate, re-stage, re-commit.
:func:`commit_with_retries` bounds that loop — the pattern real
writers (delta-spark's ``OptimisticTransaction``, Iceberg's
``Tasks.retry``) ship built in.
"""

from __future__ import annotations

import time
from typing import Any, Callable


class ConcurrentCommitError(ValueError):
    """Another writer committed the version this commit targeted.

    Subclasses ValueError so pre-existing callers that caught the
    generic error keep working."""


def commit_with_retries(
    fn: Callable[..., Any],
    *args: Any,
    retries: int = 3,
    backoff_s: float = 0.05,
    **kwargs: Any,
):
    """Run a foreign-table write operation with bounded optimistic
    retries: on :class:`ConcurrentCommitError`, back off briefly and
    re-invoke ``fn`` (which re-reads the new snapshot and re-validates
    before committing).  Raises the final :class:`ConcurrentCommitError`
    once ``retries`` re-attempts are exhausted.  Validation failures
    (constraint violations, MERGE ambiguity, gating refusals) are NOT
    retried — they would fail identically against any snapshot."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except ConcurrentCommitError:
            attempt += 1
            if attempt > retries:
                raise
            time.sleep(backoff_s * attempt)
