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


def test_random_dataframe_deterministic(spark):
    from pyspark.sql import types as T

    from d2d_spark.functions.datagen import random_dataframe

    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    a = random_dataframe(spark, schema, 100, seed=7).collect()
    b = random_dataframe(spark, schema, 100, seed=7).collect()
    assert a == b
    c = random_dataframe(spark, schema, 100, seed=8).collect()
    assert a != c
    assert len(a) == 100
    assert all(8 <= len(r.s) <= 16 for r in a)
    assert len({r.s for r in a}) > 90  # strings vary


def test_format_data_error_carries_row(spark):
    import pytest as _pytest

    from d2d_spark.migrate import apply_format_data
    from d2d_spark.sources import MemoryConnector

    mem = MemoryConnector({"t": [{"k": 1}, {"k": 0}]}, spark)

    def fmt(d):
        return {"inv": 1 / d["k"]}

    with _pytest.raises(Exception, match="format_data failed on row"):
        apply_format_data(mem.read("t"), fmt, sample=1).collect()


def test_flyweight_instance_cache():
    from d2d_spark.services import flyweight

    calls = []

    @flyweight
    class Conn:
        def __init__(self, host, port=1):
            calls.append((host, port))

    a = Conn("h1", port=5)
    b = Conn("h1", port=5)
    c = Conn("h2")
    assert a is b and a is not c
    assert len(calls) == 2
    # unhashable args fall back to fresh instances
    d1 = Conn(["x"])
    d2 = Conn(["x"])
    assert d1 is not d2


def test_job_progress_context(spark, sf_dir):
    import logging

    from d2d_spark.services import job_progress
    from d2d_spark.session import read_table

    logging.getLogger("d2d_spark").setLevel(logging.INFO)
    with job_progress(spark, "test-job", every_s=0.1):
        n = read_table(spark, sf_dir, "orders").count()
    assert n > 0  # context must not swallow or alter the work


def test_kv_pairs_last_mode(spark):
    from d2d_spark.sources import MemoryConnector, kv_pairs

    mem = MemoryConnector(
        {"t": [{"k": 1, "v": "old", "ver": 1}, {"k": 1, "v": "new", "ver": 2},
               {"k": 2, "v": "only", "ver": 1}]},
        spark,
    )
    got = {r.k: r.v for r in kv_pairs(mem.read("t"), "k", "v", order_col="ver").collect()}
    assert got == {1: "new", 2: "only"}


def test_engine_register_dir_and_migrate_join(spark, tmp_path):
    from d2d_spark.api import Engine
    from d2d_spark.sources import MemoryConnector, ParquetConnector
    from tests.conftest import SF_SMALL

    eng = Engine(spark)
    tables = eng.register_dir(SF_SMALL, ("nation", "region"))
    assert set(tables) == {"nation", "region"}
    joined = eng.sql(
        "SELECT r.r_name, COUNT(*) AS n FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1 ORDER BY 1"
    )
    assert joined.count() == 5

    s1 = MemoryConnector({"a": [{"k": 1, "x": 10}]}, spark)
    s2 = MemoryConnector({"b": [{"k": 1, "y": 20}]}, spark)
    dst = ParquetConnector(str(tmp_path), spark)
    out = eng.migrate_join(
        s1, s2, dst,
        table_from1="a", table_from2="b", table_to="j",
        migration_key1="k", migration_key2="k", mode="overwrite",
    )
    row = dst.read("j").collect()[0]
    assert (row.k, row.x, row.y) == (1, 10, 20)
