"""Nested-document flattening utilities (functions/nested.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from d2d_spark.functions.nested import explode_path, flatten_structs, schema_paths

SCHEMA = (
    "id long, "
    "user struct<name:string, geo:struct<lat:double, lon:double>>, "
    "items array<struct<sku:string, qty:int>>, "
    "tags array<string>"
)
ROWS = [
    (1, ("ann", (1.5, 2.5)), [("a", 2), ("b", 1)], ["x", "y"]),
    (2, ("bob", None), [], []),
    (3, (None, (9.0, 8.0)), None, None),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_schema_paths(df):
    got = [(p, t.simpleString()) for p, t in schema_paths(df.schema)]
    assert got == [
        ("id", "bigint"),
        ("user.name", "string"),
        ("user.geo.lat", "double"),
        ("user.geo.lon", "double"),
        ("items", "array<struct<sku:string,qty:int>>"),
        ("tags", "array<string>"),
    ]


def test_flatten_structs(df):
    out = flatten_structs(df)
    assert out.columns == ["id", "user_name", "user_geo_lat", "user_geo_lon", "items", "tags"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["user_geo_lat"] == 1.5
    # NULL struct propagates NULL leaves
    assert rows[2]["user_geo_lat"] is None and rows[2]["user_name"] == "bob"
    assert rows[3]["user_name"] is None and rows[3]["user_geo_lon"] == 8.0
    # max_depth stops recursion: depth 1 keeps geo as a struct
    shallow = flatten_structs(df, max_depth=1)
    assert "user_geo" in shallow.columns and "user_geo_lat" not in shallow.columns


def test_flatten_collision_raises(spark):
    bad = spark.createDataFrame(
        [(1, (2,), 3)], "id long, a struct<b:int>, a_b long"
    )
    with pytest.raises(ValueError, match="collision"):
        flatten_structs(bad)
    with pytest.raises(ValueError, match="max_depth"):
        flatten_structs(bad, max_depth=0)


def test_explode_struct_array(df):
    out = explode_path(df, "items")
    assert out.columns == ["id", "user", "tags", "items_sku", "items_qty"]
    got = sorted((r["id"], r["items_sku"], r["items_qty"]) for r in out.collect())
    assert got == [(1, "a", 2), (1, "b", 1)]
    # keep_empty keeps ids 2 (empty) and 3 (NULL) with NULL elements
    outer = explode_path(df, "items", keep_empty=True)
    ids = sorted(r["id"] for r in outer.collect())
    assert ids == [1, 1, 2, 3]


def test_explode_scalar_and_errors(df):
    out = explode_path(df, "tags")
    assert sorted((r["id"], r["tags"]) for r in out.collect()) == [(1, "x"), (1, "y")]
    with pytest.raises(ValueError, match="no field"):
        explode_path(df, "nope.x")
    with pytest.raises(ValueError, match="not an array"):
        explode_path(df, "user.name")


def test_explode_path_temp_name_collision(spark):
    """A real column already named __<out_name> must not break the
    intermediate select (the temp alias uniquifies against it)."""
    df = spark.createDataFrame(
        [Row(id=1, __tags="keepme", tags=["x", "y"])]
    )
    out = explode_path(df, "tags")
    got = sorted((r["id"], r["__tags"], r["tags"]) for r in out.collect())
    assert got == [(1, "keepme", "x"), (1, "keepme", "y")]


def test_explode_nested_path(spark):
    df = spark.createDataFrame(
        [Row(id=1, order=Row(lines=[Row(sku="a", qty=1)], note="n"))],
    )
    out = explode_path(df, "order.lines")
    # parent struct survives; composition with flatten lifts its note
    assert {"id", "order", "order_lines_sku", "order_lines_qty"} <= set(out.columns)
    flat = flatten_structs(out)
    r = flat.collect()[0]
    assert (r["order_note"], r["order_lines_sku"], r["order_lines_qty"]) == ("n", "a", 1)


def test_flatten_pushdown_prunes_scan(spark, tmp_path):
    """Column pruning must reach the parquet scan: selecting one
    flattened leaf reads only its struct branch."""
    p = str(tmp_path / "nested.parquet")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(p)
    out = flatten_structs(spark.read.parquet(p)).select("user_geo_lat")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "geo" in rs and "items" not in rs and "tags" not in rs


def test_flatten_collision_case_insensitive(spark):
    """Spark resolves names case-insensitively by default — a
    differing-case collision must refuse too."""
    bad = spark.createDataFrame([(1, (2,), 3)], "id long, a struct<B:int>, a_b long")
    with pytest.raises(ValueError, match="collision"):
        flatten_structs(bad)
