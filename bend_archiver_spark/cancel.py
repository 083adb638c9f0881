"""Cooperative job cancellation — parity with the reference's signal
context (cmd/main.go:29-35: SIGQUIT/SIGTERM cancel the job context so
a terminated run stops between phases instead of plowing on).

The Spark translation: a process-wide cancellation token checked at
phase boundaries, plus CLI signal handlers that trip it. The one
ordering guarantee that matters is DESTRUCTIVE-LAST — an interrupt
that lands after the write but before verification must never reach
``postsync.delete_after_sync`` (the only phase that mutates the
source). Batch re-runs are idempotency-gated, so an interrupted
archive is always safe to re-run.
"""

from __future__ import annotations

import signal
import threading

__all__ = [
    "JobCancelled",
    "cancel_requested",
    "install_signal_handlers",
    "raise_if_cancelled",
    "request_cancel",
    "reset",
]

_EVENT = threading.Event()
_SIGNUM: int | None = None
# Tracks whether a DELIVERED SIGNAL has already raised, separately from
# the token: a programmatic request_cancel() (another thread / library
# caller) sets _EVENT but must not eat the first real signal's raise —
# otherwise the job would only stop at the next raise_if_cancelled
# boundary, potentially much later inside a long JVM call.
_SIGNAL_RAISED = False


class JobCancelled(RuntimeError):
    """Raised at a phase boundary after a cancellation request."""


def request_cancel(signum: int | None = None) -> None:
    """Trip the token. Safe from signal handlers and any thread.

    A programmatic trip (no signal) only sets the flag; it does NOT
    consume the installed handlers' first-signal raise — a real
    SIGTERM/SIGINT arriving later still interrupts the main thread
    immediately rather than waiting for the next phase boundary."""
    global _SIGNUM
    if signum is not None:
        _SIGNUM = signum
    _EVENT.set()


def cancel_requested() -> bool:
    return _EVENT.is_set()


def last_signal() -> int | None:
    return _SIGNUM


def reset() -> None:
    """Clear the token (tests / fresh CLI invocations)."""
    global _SIGNUM, _SIGNAL_RAISED
    _SIGNUM = None
    _SIGNAL_RAISED = False
    _EVENT.clear()


def raise_if_cancelled(phase: str) -> None:
    """Phase-boundary check: raise before entering *phase* if a
    cancellation arrived. Used as the backstop for signals that land
    inside a blocking JVM call, where the handler's exception cannot
    preempt the Java side — the flag is still set, so the job stops at
    the next boundary instead of proceeding to destructive phases."""
    if _EVENT.is_set():
        raise JobCancelled(f"cancelled before {phase}")


def install_signal_handlers(signals: tuple[int, ...] = ()) -> dict:
    """Install SIGQUIT/SIGTERM/SIGINT handlers that trip the token and
    raise ``JobCancelled`` in the main thread. Returns the previous
    handlers so callers can restore them (``restore_signal_handlers``).

    SIGQUIT is included for parity with the reference's signal set
    (cmd/main.go:29-35: SIGQUIT + SIGTERM); SIGINT is added on top so
    an interactive Ctrl-C gets the same graceful destructive-last stop.

    Only the FIRST DELIVERED SIGNAL raises; any later signal (e.g. a
    second Ctrl-C landing while the CLI is already inside its
    ``except JobCancelled`` exit path) just re-trips the token, so the
    cancellation exit is idempotent — a repeat signal can never escape
    ``main()`` as an uncaught traceback, and the phase-boundary
    ``raise_if_cancelled`` checks still stop the job if the first
    raise was swallowed inside a blocking JVM call. First-ness is
    tracked by a dedicated raised flag, NOT by the token: a prior
    programmatic ``request_cancel()`` from another thread does not
    consume the raise, so the first real signal always interrupts the
    main thread immediately. The flip side of that choice: if the job
    is ALREADY unwinding a programmatic cancellation when the first
    real signal lands, the raise happens inside the caller's
    ``except JobCancelled``/``finally`` exit path — callers that must
    guarantee an exit code (the CLI) therefore keep an outer
    last-resort ``except JobCancelled`` around the whole run
    (``cli.main``)."""
    sigs = signals or (signal.SIGQUIT, signal.SIGTERM, signal.SIGINT)
    previous: dict = {}

    def _handler(signum, frame):  # noqa: ARG001
        global _SIGNAL_RAISED
        first = not _SIGNAL_RAISED
        _SIGNAL_RAISED = True
        request_cancel(signum)
        if first:
            raise JobCancelled(f"received signal {signum}")

    for s in sigs:
        previous[s] = signal.signal(s, _handler)
    return previous


def restore_signal_handlers(previous: dict) -> None:
    for s, h in previous.items():
        signal.signal(s, h)
