"""Signal-cancellation parity tests (cmd/main.go:29-35).

The reference cancels its job context on SIGQUIT/SIGTERM; here the CLI
installs SIGTERM/SIGINT handlers that trip a process-wide token, and
the job checks it at phase boundaries — with the destructive-last
guarantee that an interrupt landing between write and verify never
reaches ``postsync.delete_after_sync``.
"""

import os
import signal

import pytest

from bend_archiver_spark import cancel


@pytest.fixture(autouse=True)
def _clean_token():
    cancel.reset()
    yield
    cancel.reset()


class TestCancelToken:
    def test_request_and_check(self):
        assert not cancel.cancel_requested()
        cancel.request_cancel(signal.SIGTERM)
        assert cancel.cancel_requested()
        assert cancel.last_signal() == signal.SIGTERM
        with pytest.raises(cancel.JobCancelled, match="delete-after-sync"):
            cancel.raise_if_cancelled("delete-after-sync")

    def test_boundary_check_is_noop_without_request(self):
        cancel.raise_if_cancelled("write")  # must not raise

    def test_sigterm_handler_raises_in_main_thread(self):
        prev = cancel.install_signal_handlers()
        try:
            with pytest.raises(cancel.JobCancelled):
                os.kill(os.getpid(), signal.SIGTERM)
            assert cancel.cancel_requested()
            assert cancel.last_signal() == signal.SIGTERM
        finally:
            cancel.restore_signal_handlers(prev)

    def test_handlers_restored(self):
        before = signal.getsignal(signal.SIGTERM)
        prev = cancel.install_signal_handlers()
        assert signal.getsignal(signal.SIGTERM) is not before
        cancel.restore_signal_handlers(prev)
        assert signal.getsignal(signal.SIGTERM) is before

    def test_second_signal_does_not_raise(self):
        """A repeat signal landing while the first cancellation is
        already being handled (e.g. a second Ctrl-C inside the CLI's
        except-JobCancelled block) must only re-trip the token, never
        escape as a second async raise — otherwise the 128+signum
        exit path is replaced by an uncaught traceback."""
        prev = cancel.install_signal_handlers()
        try:
            with pytest.raises(cancel.JobCancelled):
                os.kill(os.getpid(), signal.SIGTERM)
            # token tripped; the follow-up signal must be a no-raise
            os.kill(os.getpid(), signal.SIGINT)
            assert cancel.cancel_requested()
            assert cancel.last_signal() == signal.SIGINT
        finally:
            cancel.restore_signal_handlers(prev)

    def test_programmatic_cancel_does_not_eat_first_signal_raise(self):
        """A programmatic request_cancel() from a library caller (or
        another thread) sets the token but must NOT consume the
        handlers' first-signal raise — the first real SIGTERM after it
        still interrupts the main thread immediately instead of
        deferring to the next raise_if_cancelled boundary (which could
        be after a long blocking JVM call)."""
        prev = cancel.install_signal_handlers()
        try:
            cancel.request_cancel()
            assert cancel.cancel_requested()
            with pytest.raises(cancel.JobCancelled):
                os.kill(os.getpid(), signal.SIGTERM)
            # second delivered signal remains a no-raise re-trip
            os.kill(os.getpid(), signal.SIGINT)
            assert cancel.last_signal() == signal.SIGINT
        finally:
            cancel.restore_signal_handlers(prev)

    def test_sigquit_installed_by_default(self):
        """Reference parity: cmd/main.go:29-35 cancels on SIGQUIT and
        SIGTERM. SIGQUIT must get the graceful handler, not the
        core-dump default."""
        before = signal.getsignal(signal.SIGQUIT)
        prev = cancel.install_signal_handlers()
        try:
            assert signal.getsignal(signal.SIGQUIT) is not before
            with pytest.raises(cancel.JobCancelled):
                os.kill(os.getpid(), signal.SIGQUIT)
            assert cancel.last_signal() == signal.SIGQUIT
        finally:
            cancel.restore_signal_handlers(prev)
        assert signal.getsignal(signal.SIGQUIT) is before
