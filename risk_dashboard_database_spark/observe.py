"""Operational observability: slow-query log + single-flight job lock
(SURVEY §4 rows).

- The reference logs every request slower than its 500 ms SLO
  (`dashboard_app/app.py:894,919`). Spark's QueryExecutionListener is
  JVM-side; the faithful driver-side mapping is a timing wrapper around
  query execution that records breaches to a bounded in-memory log (and
  the standard `logging` channel), exactly the signal the reference's
  log line carries: query name, elapsed seconds, threshold.
- MV refreshes in the reference are single-flighted with a Postgres
  advisory lock so concurrent requests can't stampede a rebuild
  (`app.py:95-106,809-864`). The driver-side analog is an O_EXCL lock
  file per job name: the first caller wins and runs, others skip (the
  reference's non-blocking `pg_try_advisory_lock` semantics). Stale
  locks from crashed holders are broken when the owning pid is gone.
"""

from __future__ import annotations

import logging
import os
import time
from collections import deque
from collections.abc import Callable, Iterator
from contextlib import contextmanager

log = logging.getLogger("risk_dashboard_database_spark.slowquery")


class SlowQueryLog:
    """Bounded record of queries that exceeded the latency SLO."""

    def __init__(self, threshold_ms: float = 500.0, keep: int = 1000):
        self.threshold_ms = threshold_ms
        self.entries: deque[tuple[str, float]] = deque(maxlen=keep)

    @contextmanager
    def timed(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            elapsed_ms = (time.perf_counter() - t0) * 1000.0
            if elapsed_ms > self.threshold_ms:
                self.entries.append((name, elapsed_ms))
                log.warning(
                    "slow query %s: %.0f ms (> %.0f ms SLO)",
                    name,
                    elapsed_ms,
                    self.threshold_ms,
                )

    def run(self, name: str, action: Callable[[], object]) -> object:
        with self.timed(name):
            return action()


def _lock_pid(path: str) -> int | None:
    try:
        with open(path) as f:
            return int(f.read().strip() or "0")
    except (OSError, ValueError):
        return None


@contextmanager
def single_flight(lock_dir: str, name: str) -> Iterator[bool]:
    """Non-blocking per-job lock: yields True for the one caller that
    acquired it (who should run the refresh) and False for everyone
    else (who should skip — the reference returns the cached result
    rather than waiting). A lock whose owning pid no longer exists is
    broken and re-acquired."""
    os.makedirs(lock_dir, exist_ok=True)
    path = os.path.join(lock_dir, f"{name}.lock")

    def try_acquire() -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))
        return True

    acquired = try_acquire()
    if not acquired:
        pid = _lock_pid(path)
        stale = pid is not None and not _pid_running(pid)
        if stale:
            # Break the stale lock via a per-pid tombstone rename.
            # Rename alone is not enough: a slow second breaker that
            # also observed the stale pid can rename AFTER a rival
            # broke the lock and re-acquired — stealing the rival's
            # FRESH lock. So after the rename, re-read the pid inside
            # the tombstone: if it isn't the stale pid we observed, we
            # grabbed a live lock by mistake — put it back (only while
            # its holder is still RUNNING: resurrecting a lock whose
            # holder already released would starve every future
            # caller) and treat the lock as held. This NARROWS the
            # break race, it does not eliminate it — plain files have
            # no compare-and-swap, so a third caller can slip in while
            # the path is briefly absent; refresh idempotence plus the
            # MV store's atomic publish are the correctness backstop
            # for that residual window.
            tomb = f"{path}.stale.{os.getpid()}"
            try:
                os.rename(path, tomb)
                tpid = _lock_pid(tomb)
                if tpid == pid or tpid is None or not _pid_running(tpid):
                    os.remove(tomb)
                    acquired = try_acquire()
                else:
                    # Restore without clobbering: link() fails if a
                    # third process re-created path meanwhile (its
                    # lock wins; the stolen holder's release is safe —
                    # it re-checks ownership before removing).
                    try:
                        os.link(tomb, path)
                    except OSError:
                        pass
                    os.remove(tomb)
            except OSError:
                pass
    try:
        yield acquired
    finally:
        if acquired and _lock_pid(path) == os.getpid():
            # Re-check ownership: if a crash-recovery breaker stole and
            # re-issued the lock, removing it here would unlock a rival.
            try:
                os.remove(path)
            except OSError:
                pass


def _pid_running(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except OSError:
        return True
