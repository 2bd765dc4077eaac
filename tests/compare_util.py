"""Local mirror of the driver's correctness gate: run a registered
query's Spark plan and its DuckDB oracle over the same parquet dir,
compare row-count, sorted column names, and exact cell values
(order-insensitive). Stricter than a hash: on mismatch it shows the
first differing rows."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_cols = [cols[i] for i in order]
    out_rows = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda row: tuple((x is None, repr(x)) for x in row),
    )
    return out_cols, out_rows


def compare_query(spark, con, qobj, sf_dir: str) -> list[str]:
    """Returns a list of human-readable problems (empty = pass)."""
    sdf = qobj.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(qobj.oracle)
    o_cols = list(rel.columns)
    o_rows = [tuple(r) for r in rel.fetchall()]

    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount: spark={len(s_rows)} oracle={len(o_rows)}")
    sc, sr = _normalize(s_cols, s_rows)
    _, orows = _normalize(o_cols, o_rows)
    if sr != orows:
        n_bad = 0
        for i, (a, b) in enumerate(zip(sr, orows)):
            if a != b:
                if n_bad < 3:
                    problems.append(f"row {i}: spark={a} oracle={b} (cols {sc})")
                n_bad += 1
        if n_bad:
            problems.append(f"values: {n_bad} differing rows of {len(sr)}")
        elif len(sr) != len(orows):
            pass
        if not problems:
            problems.append("values differ (ordering of sets)")
    return problems
