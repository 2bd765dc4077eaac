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


def test_fixture_table_paths_env_dedup(tmp_path, monkeypatch):
    """$SPARK_GRAFT_SF_DIR joins the literal-oracle fixture list only
    when its table file differs BY CONTENT from every standard
    fixture — an rsync'd copy would double every builder's rows under
    the same content tag (a guaranteed oracle mismatch); a missing
    file is dropped; a genuinely different fixture is appended."""
    import shutil

    from d2d_spark.plans import registry

    std = "/root/testdata/sf0.01/documents.parquet"
    # content copy of a standard fixture: deduped
    shutil.copy(std, tmp_path / "documents.parquet")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path))
    registry._FIXTURE_MD5.clear()
    assert len(registry.fixture_table_paths("documents")) == 3
    # same dir, different content: appended
    with open(tmp_path / "documents.parquet", "ab") as f:
        f.write(b"x")
    registry._FIXTURE_MD5.clear()
    paths = registry.fixture_table_paths("documents")
    assert len(paths) == 4 and paths[-1] == str(tmp_path / "documents.parquet")
    # missing table in the env dir: dropped, standard three remain
    registry._FIXTURE_MD5.clear()
    assert len(registry.fixture_table_paths("orders")) == 3
    # env pointing at a standard dir: no duplicate
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1/")
    registry._FIXTURE_MD5.clear()
    assert len(registry.fixture_table_paths("documents")) == 3


def test_bench_compare_classifies_movers(tmp_path):
    """The bench comparator separates plan changes (shuffle bytes
    moved) from host noise (wall moved, shuffle flat) and reports
    pre-metrics legs as unattributable."""
    import json
    import subprocess
    import sys

    a = {
        "parsed": {
            "queries": {"q1": 1.0, "q2": 1.0, "q3": 1.0, "gone": 0.5},
            "leg_metrics": {
                "q1": {"shuffle_write_bytes": 1_000_000},
                "q2": {"shuffle_write_bytes": 1_000_000},
            },
        }
    }
    b = {
        "queries": {"q1": 3.0, "q2": 3.0, "q3": 3.0, "new": 0.5},
        "leg_metrics": {
            "q1": {"shuffle_write_bytes": 5_000_000},
            "q2": {"shuffle_write_bytes": 1_000_000},
        },
    }
    fa, fb = tmp_path / "a.json", tmp_path / "b.json"
    fa.write_text(json.dumps(a))
    fb.write_text(json.dumps(b))
    out = subprocess.run(
        [sys.executable, "scripts/bench_compare.py", str(fa), str(fb)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    lines = {ln.split()[0]: ln for ln in out.stdout.splitlines() if ln.startswith("q")}
    assert "PLAN CHANGE" in lines["q1"]
    assert "HOST NOISE" in lines["q2"]
    assert "NO METRICS" in lines["q3"]
    assert "only in" in out.stdout and "gone" in out.stdout and "new" in out.stdout
