"""golden_record (operators/join.py): per-column survivorship rules
vs a plain-Python replay, NULL-never-overwrites, determinism,
validation."""

from __future__ import annotations

import pytest

from d2d_spark.operators.join import golden_record

ROWS = [
    # (key, seq, name, email, score, note)
    (1, 1, "Jon",   "jon@a.com", 10.0, "first"),
    (1, 2, "Jonny", None,        5.0,  "second note long"),
    (1, 3, None,    "j@b.org",   None, "x"),
    (2, 1, None,    None,        3.0,  None),
    (2, 2, "Ann",   "ann@c.io",  4.0,  "ok"),
]
SCHEMA = "k long, seq int, name string, email string, score double, note string"


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def test_golden_record_rules(spark):
    got = {
        r["k"]: r
        for r in golden_record(
            _df(spark),
            ["k"],
            "seq",
            rules={
                "name": "latest",     # latest NON-NULL: key 1 -> Jonny (seq 3 is NULL)
                "email": "earliest",  # earliest non-null: key 1 -> jon@a.com
                "score": "max",
                "note": "longest",
                "seq": "count",
            },
        ).collect()
    }
    assert got[1]["name"] == "Jonny" and got[1]["email"] == "jon@a.com"
    assert got[1]["score"] == 10.0 and got[1]["note"] == "second note long"
    assert got[1]["seq"] == 3
    assert got[2]["name"] == "Ann" and got[2]["email"] == "ann@c.io"
    assert got[2]["score"] == 4.0 and got[2]["note"] == "ok"
    # sum rule and min rule
    sums = {
        r["k"]: (r["score"], r["seq"])
        for r in golden_record(
            _df(spark), ["k"], None, rules={"score": "sum", "seq": "min"}
        ).collect()
    }
    assert sums[1] == (15.0, 1) and sums[2] == (7.0, 1)


def test_golden_record_all_null_column_stays_null(spark):
    rows = [(1, 1, None, None, None, None), (1, 2, None, None, None, None)]
    r = golden_record(
        _df(spark, rows), ["k"], "seq",
        rules={"name": "latest", "note": "longest", "score": "max"},
    ).collect()[0]
    assert r["name"] is None and r["note"] is None and r["score"] is None


def test_golden_record_partitioning_invariant(spark):
    rules = {"name": "latest", "email": "earliest", "score": "max", "note": "longest"}
    outs = [
        sorted(map(tuple, golden_record(_df(spark).repartition(n), ["k"], "seq", rules).collect()))
        for n in (1, 7)
    ]
    assert outs[0] == outs[1]


def test_golden_record_longest_tie_deterministic(spark):
    rows = [(1, 1, "ab", None, None, None), (1, 2, "cd", None, None, None)]
    r = golden_record(_df(spark, rows), ["k"], "seq", rules={"name": "longest"}).collect()
    assert r[0]["name"] == "cd"  # equal length -> lexicographically largest


def test_golden_record_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="unknown rules"):
        golden_record(df, ["k"], "seq", rules={"name": "newest"})
    with pytest.raises(ValueError, match="lacks columns"):
        golden_record(df, ["k"], "seq", rules={"ghost": "max"})
    with pytest.raises(ValueError, match="order_col"):
        golden_record(df, ["k"], None, rules={"name": "latest"})
    with pytest.raises(ValueError, match="at least one"):
        golden_record(df, ["k"], "seq", rules={})
