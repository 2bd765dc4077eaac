"""Retry classification, timeout, progress meter."""

from __future__ import annotations

import pytest

from d2d_spark.services import retry, run_with_retry, throughput_meter


class Boom(Exception):
    pass


class Warn(Exception):
    pass


def test_retry_recovers_after_transient():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise Warn("transient")
        return "ok"

    assert run_with_retry(flaky, warning_exceptions=(Warn,), max_retry=5, sleep_s=0) == "ok"
    assert len(calls) == 3


def test_retry_exhausts_and_reraises():
    def always():
        raise Boom("nope")

    with pytest.raises(Boom):
        run_with_retry(always, error_exceptions=(Boom,), max_retry=2, sleep_s=0)


def test_unclassified_raises_immediately():
    calls = []

    def other():
        calls.append(1)
        raise ValueError("not classified")

    with pytest.raises(ValueError):
        run_with_retry(other, warning_exceptions=(Warn,), max_retry=5, sleep_s=0)
    assert len(calls) == 1


def test_retry_decorator():
    state = {"n": 0}

    @retry(warning_exceptions=(Warn,), max_retry=3, sleep_s=0)
    def fn(x):
        state["n"] += 1
        if state["n"] < 2:
            raise Warn()
        return x * 2

    assert fn(21) == 42


def test_throughput_meter():
    m = throughput_meter(lambda: None)
    for _ in range(100):
        m()
    assert m.n == 100
    assert m.avg_hz > 0
