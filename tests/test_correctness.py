"""Differential test: every registered query with an oracle must match
DuckDB exactly (the driver's t2 gate, run locally at a small SF)."""

from __future__ import annotations

import pytest

from d2d_spark.plans.registry import load_all
from tests.compare_util import compare_query, duck_connect
from tests.conftest import SF_SMALL


def _oracle_queries():
    return [q for q in load_all().values() if q.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("qobj", _oracle_queries(), ids=lambda q: q.name)
def test_query_matches_oracle(spark, duck, qobj):
    problems = compare_query(spark, duck, qobj, SF_SMALL)
    assert not problems, f"{qobj.name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and return a
    stable schema (the driver's weaker check)."""
    for q in load_all().values():
        if q.oracle is None:
            df = q.fn(spark, SF_SMALL)
            assert df.columns, q.name
            df.limit(5).collect()


def test_coverage_doc_cites_only_live_queries():
    """COVERAGE.md is the map a new reader trusts — every query name
    it cites must exist in the registry (r2 verdict #8)."""
    import re
    from pathlib import Path

    names = set(load_all().keys())
    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    # query citations are backticked snake_case referencing 'query `x`'
    cited = set(re.findall(r"quer(?:y|ies) `([a-z0-9_]+)`", text))
    cited |= set(re.findall(r"`([a-z0-9_]+)` \(oracled", text))
    missing = sorted(cited - names)
    assert not missing, f"COVERAGE.md cites unknown queries: {missing}"
    assert len(names) == 50, "registry must stay at the driver's 50-query window"
