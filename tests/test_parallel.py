"""d2d_spark.parallel.run_concurrent — the §2.6 job-overlap helper."""

import pytest


def test_results_in_input_order(spark):
    from d2d_spark.parallel import run_concurrent

    out = run_concurrent([
        lambda: spark.range(10).count(),
        lambda: "plain python",
        lambda: spark.range(3).count(),
    ])
    assert out == [10, "plain python", 3]


def test_first_exception_reraises_after_join(spark):
    from d2d_spark.parallel import run_concurrent

    done = []

    def ok():
        done.append(spark.range(5).count())
        return "ok"

    def boom():
        raise ValueError("boom from thread")

    with pytest.raises(ValueError, match="boom from thread"):
        run_concurrent([boom, ok])
    # the healthy sibling ran to completion before the re-raise
    assert done == [5]


def test_job_group_is_inherited(spark):
    """The bench keys REST metrics on the caller's job group — the
    overlap helper must not detach jobs from it."""
    from d2d_spark.parallel import run_concurrent

    sc = spark.sparkContext
    sc.setJobGroup("parallel-test-group", "parallel-test")
    try:
        seen = run_concurrent([
            lambda: sc.getLocalProperty("spark.jobGroup.id"),
            lambda: sc.getLocalProperty("spark.jobGroup.id"),
        ])
        assert seen == ["parallel-test-group", "parallel-test-group"]
    finally:
        sc.setJobGroup("", "")
