"""Engine services — SURVEY.md §2.9: retry with exception
classification, and job progress metering.

Spark already retries *tasks* (spark.task.maxFailures) and its UI
meters stages; these helpers cover the layer above that the reference
managed by hand: whole-job reruns against flaky external systems
(run_task_auto_retry, d22d/utils/utils.py:37-113) and log-line
progress for long multi-table runs (d22d/task.py:144-151).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from contextlib import contextmanager
from typing import TypeVar

log = logging.getLogger("d2d_spark")

R = TypeVar("R")


def run_with_retry(
    fn: Callable[[], R],
    warning_exceptions: tuple[type[BaseException], ...] = (),
    error_exceptions: tuple[type[BaseException], ...] = (),
    max_retry: int = 3,
    sleep_s: float = 5.0,
    timeout_s: float | None = None,
) -> R:
    """Classified retry (reference semantics): `warning_exceptions`
    are expected-transient — logged at WARNING and retried;
    `error_exceptions` are logged at ERROR and retried; anything else
    raises immediately. `timeout_s` bounds the total attempt window;
    the final failure always re-raises."""
    deadline = time.monotonic() + timeout_s if timeout_s else None
    attempt = 0
    while True:
        try:
            return fn()
        except warning_exceptions as e:  # noqa: B030 - tuples by contract
            level, err = logging.WARNING, e
        except error_exceptions as e:
            level, err = logging.ERROR, e
        attempt += 1
        log.log(level, "attempt %d/%d failed: %s", attempt, max_retry, err)
        out_of_time = deadline is not None and time.monotonic() + sleep_s > deadline
        if attempt >= max_retry or out_of_time:
            raise err
        time.sleep(sleep_s)


def retry(  # decorator form (reference task_auto_retry)
    warning_exceptions: tuple[type[BaseException], ...] = (),
    error_exceptions: tuple[type[BaseException], ...] = (),
    max_retry: int = 3,
    sleep_s: float = 5.0,
    timeout_s: float | None = None,
):
    def deco(fn):
        def wrapped(*a, **kw):
            return run_with_retry(
                lambda: fn(*a, **kw),
                warning_exceptions,
                error_exceptions,
                max_retry,
                sleep_s,
                timeout_s,
            )

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco


@contextmanager
def job_progress(spark, label: str, every_s: float = 10.0):
    """Progress metering for a driver-side loop (the reference's
    %-complete/ETA log lines): polls the status tracker and logs
    active-stage completion while the block runs. Zero cost when the
    block finishes before the first tick."""
    import threading

    stop = threading.Event()
    tracker = spark.sparkContext.statusTracker()
    t0 = time.monotonic()

    def poll():
        while not stop.wait(every_s):
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info and info.numTasks:
                    done = info.numCompletedTasks
                    log.info(
                        "%s: stage %d %d/%d tasks (%.0fs elapsed)",
                        label, sid, done, info.numTasks, time.monotonic() - t0,
                    )

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    try:
        yield
    finally:
        stop.set()
        th.join(timeout=1)
        log.info("%s: done in %.1fs", label, time.monotonic() - t0)


class throughput_meter:
    """Calls/sec meter (reference print_hz, d22d/utils/decorators.py:
    722-766): wrap a callable, read .avg_hz / .peak_hz."""

    def __init__(self, fn: Callable):
        self.fn = fn
        self.n = 0
        self.t0: float | None = None
        self.peak_hz = 0.0
        self._win_t = 0.0
        self._win_n = 0

    def __call__(self, *a, **kw):
        now = time.monotonic()
        if self.t0 is None:
            self.t0 = self._win_t = now
        out = self.fn(*a, **kw)
        self.n += 1
        self._win_n += 1
        if now - self._win_t >= 1.0:
            self.peak_hz = max(self.peak_hz, self._win_n / (now - self._win_t))
            self._win_t, self._win_n = now, 0
        return out

    @property
    def avg_hz(self) -> float:
        if self.t0 is None or self.n == 0:
            return 0.0
        elapsed = time.monotonic() - self.t0
        return self.n / elapsed if elapsed > 0 else 0.0


def flyweight(cls):
    """Instance cache keyed by constructor args (reference @flyweight,
    d22d/utils/decorators.py:169-202): the same connector config
    yields the same instance — one pool per target per process, which
    is exactly the per-executor-singleton discipline JDBC/ES
    connections need inside foreachPartition."""
    instances: dict = {}

    def get(*args, **kwargs):
        key = (args, tuple(sorted(kwargs.items())))
        try:
            hash(key)
        except TypeError:
            return cls(*args, **kwargs)  # unhashable config: no caching
        if key not in instances:
            instances[key] = cls(*args, **kwargs)
        return instances[key]

    get.__wrapped__ = cls
    get.cache = instances
    return get
