

# ---------------------------------------------------------------------------
# merge_into (multi-clause MERGE)
# ---------------------------------------------------------------------------
def _merge_frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, status string, price double",
    )
    source = spark.createDataFrame(
        [(2, 25.0, "upd"), (3, 5.0, "del"), (5, 50.0, "new"), (6, 60.0, "skip")],
        "k long, price double, action string",
    )
    return target, source


def test_merge_into_all_clauses(spark):
    from d2d_spark.operators.writes import merge_into

    target, source = _merge_frames(spark)
    out = merge_into(
        target,
        source,
        on=["k"],
        matched_update={"price": "s.price", "status": "concat(t.status, '+')"},
        matched_update_condition="s.action = 'upd'",
        matched_delete_condition="s.action = 'del'",
        insert_unmatched=True,
        insert_values={"status": "s.action"},
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, "a", 10.0),        # target-only passthrough
        (2, "b+", 25.0),       # matched + update clause
        (4, "d", 40.0),        # target-only passthrough (k=3 deleted)
        (5, "new", 50.0),      # inserted, status from insert_values
        (6, "skip", 60.0),     # inserted (insert clause has no condition)
    ]
    assert out.columns == target.columns


def test_merge_into_no_insert_and_update_all_matched(spark):
    from d2d_spark.operators.writes import merge_into

    target, source = _merge_frames(spark)
    out = merge_into(
        target, source, on=["k"],
        matched_update={"price": "t.price + s.price"},
        insert_unmatched=False,
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, "a", 10.0), (2, "b", 45.0), (3, "c", 35.0), (4, "d", 40.0),
    ]


def test_merge_into_validation(spark):
    import pytest

    from d2d_spark.operators.writes import merge_into

    target, source = _merge_frames(spark)
    with pytest.raises(ValueError, match="at least one join key"):
        merge_into(target, source, on=[])
    with pytest.raises(ValueError, match="absent"):
        merge_into(target, source, on=["nope"])
    with pytest.raises(ValueError, match="no clause"):
        merge_into(target, source, on=["k"], insert_unmatched=False)
    with pytest.raises(ValueError, match="UPDATE join keys"):
        merge_into(target, source, on=["k"], matched_update={"k": "s.k"})
    dup = source.unionByName(source.limit(1))
    with pytest.raises(ValueError, match="duplicate join keys"):
        merge_into(target, dup, on=["k"], matched_update={"price": "s.price"})
    nulls = spark.createDataFrame([(None, 1.0, "x")], "k long, price double, action string")
    with pytest.raises(ValueError, match="NULL join keys"):
        merge_into(target, nulls, on=["k"], matched_update={"price": "s.price"})


def test_merge_into_null_condition_is_false(spark):
    from d2d_spark.operators.writes import merge_into

    target = spark.createDataFrame([(1, 10.0)], "k long, price double")
    source = spark.createDataFrame([(1, None)], "k long, flag boolean")
    out = merge_into(
        target, source, on=["k"],
        matched_update={"price": "-1.0"},
        matched_update_condition="s.flag",  # NULL -> no update
        matched_delete_condition="s.flag",  # NULL -> no delete
    )
    assert [tuple(r) for r in out.collect()] == [(1, 10.0)]


def test_merge_into_survives_dunder_marker_columns(spark):
    """A real __t/__s column in either frame must not be clobbered by
    the presence markers."""
    from d2d_spark.operators.writes import merge_into

    target = spark.createDataFrame([(1, 5), (2, 6)], "k long, __t long")
    source = spark.createDataFrame([(2, 99), (3, 77)], "k long, __t long")
    out = merge_into(target, source, on=["k"], matched_update={"__t": "s.__t"})
    assert sorted(tuple(r) for r in out.collect()) == [(1, 5), (2, 99), (3, 77)]
