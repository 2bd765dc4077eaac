"""Overlap independent driver-side builds/jobs on inheritable threads.

Several suite queries call operators that each run their own eager
Spark jobs (cache fills, dict-returning collects) before returning.
Called serially, each job pays full latency while the cluster's tail
sits idle (guide §2.6 "overlap independent jobs"). Running the calls
on ``pyspark.InheritableThread``s lets the scheduler back-fill cores
across them; InheritableThread propagates the caller's JVM-thread-local
properties (job group, description), so bench/REST per-leg attribution
is unchanged.

Use ONLY for calls that are independent (no data or cache-fill
ordering between them — fill any SHARED cold cache block eagerly
BEFORE overlapping, or the threads race to compute it redundantly)
and that do not mutate session-global state (spark.conf.set).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence


def run_concurrent(fns: Sequence[Callable[[], Any]]) -> list[Any]:
    """Run the callables on InheritableThreads; return their results
    in input order. The first exception (in input order) re-raises on
    the caller thread after every thread has joined."""
    from pyspark import InheritableThread

    results: list[Any] = [None] * len(fns)

    def _run(i: int, fn: Callable[[], Any]) -> None:
        try:
            results[i] = fn()
        except BaseException as e:  # re-raised on the caller thread
            results[i] = _Raised(e)

    threads = [
        InheritableThread(target=_run, args=(i, fn)) for i, fn in enumerate(fns)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r in results:
        if isinstance(r, _Raised):
            raise r.exc
    return results


class _Raised:
    __slots__ = ("exc",)

    def __init__(self, exc: BaseException) -> None:
        self.exc = exc

