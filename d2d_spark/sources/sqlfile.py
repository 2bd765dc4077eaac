""".sql dump source/sink — the reference's SqlFileD re-designed for
distributed execution.

Reference semantics (not code): parse CREATE TABLE blocks for column
names, extract INSERT/REPLACE rows with a quote-aware value parser
(d22d/utils/db/__init__.py:697-821, d22d/utils/db/sqlfileextra.py:
430-574), write .sql with mode INSERT / INSERT IGNORE / REPLACE,
optional multi-row ``compress``, optional ON DUPLICATE KEY UPDATE
suffix.

Spark-first split of the work:

READ  — two distributed passes over ``spark.read.text`` lines:
        (1) the tiny non-INSERT remainder (DDL, SETs, comments) is
        collected to the driver for column names; (2) INSERT/REPLACE
        lines are value-parsed in ``mapPartitions`` into JSON rows and
        handed to ``spark.read.json`` so type inference is genuine
        (ints/floats/nulls come back typed, not stringly). One
        statement per line is assumed — the layout mysqldump and our
        own sink produce — so parsing parallelizes line-wise.

WRITE — rendering is pure JVM expression code (concat/regexp_replace
        per column by type), so the hot path never crosses into
        Python; ``compress`` groups rows into multi-VALUES statements
        with a partition-local key (no extra shuffle). DDL goes to a
        ``<table>.ddl.sql`` sidecar (a distributed text write can't
        prepend a header).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from d2d_spark.sources.base import Connector, require_spark
from d2d_spark.sources.ddl import mysql_ddl

_INSERT_RE = re.compile(
    r"^\s*(INSERT|REPLACE)\s+(?:IGNORE\s+)?INTO\s+`?(\w+)`?\s*"
    r"(?:\(([^)]*)\))?\s*VALUES\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_RE = re.compile(r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?", re.IGNORECASE)
# Driver-side cap on collected non-INSERT (DDL/comment) lines; a real
# dump's header is a few hundred lines at most.
_MAX_DDL_LINES = 200_000
_COL_DEF_RE = re.compile(r"^\s*`([^`]+)`\s+\w")


def parse_values(seg: str) -> list[list[object]]:
    """Parse the ``(...),(...);`` tail of an INSERT into row tuples.

    Handles: single-quoted strings with backslash escapes and ''
    doubling, NULL, integer/float literals, b'0101' bit literals,
    0x… hex literals, nested parens inside strings, emoji/UTF-8.
    Fresh implementation of the dump grammar (the same grammar the
    reference's parse_values accepts, sqlfileextra.py:430-559).
    """
    rows: list[list[object]] = []
    i, n = 0, len(seg)
    while i < n:
        ch = seg[i]
        if ch == "(":
            row, i = _parse_tuple(seg, i + 1)
            rows.append(row)
            # after a tuple, only ",", ";" or whitespace continue the
            # VALUES list — anything else (e.g. an ON DUPLICATE KEY
            # UPDATE suffix with its own parens) ends it
            while i < n and seg[i] in " \t\r\n":
                i += 1
            if i < n and seg[i] == ",":
                i += 1
            elif i >= n or seg[i] == ";":
                break
            else:
                break
        else:
            i += 1
    return rows


def _parse_tuple(s: str, i: int) -> tuple[list[object], int]:
    row: list[object] = []
    buf: list[str] = []
    n = len(s)

    def flush() -> None:
        tok = "".join(buf).strip()
        buf.clear()
        if tok == "":
            return
        row.append(_literal(tok))

    while i < n:
        ch = s[i]
        if ch == "'":
            prefix = "".join(buf).strip().lower()
            val, i = _parse_string(s, i + 1)
            if prefix == "b":  # bit literal b'0101'
                row.append(int(val, 2))
            elif prefix == "x":  # hex string x'1F'
                row.append(int(val, 16))
            else:
                row.append(val)
            buf.clear()
        elif ch == ",":
            flush()
            i += 1
        elif ch == ")":
            flush()
            return row, i + 1
        else:
            buf.append(ch)
            i += 1
    flush()
    return row, i


def _parse_string(s: str, i: int) -> tuple[str, int]:
    out: list[str] = []
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r", "0": "\0"}.get(nxt, nxt))
            i += 2
        elif ch == "'":
            if i + 1 < n and s[i + 1] == "'":  # '' doubling
                out.append("'")
                i += 2
            else:
                return "".join(out), i + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), i


def _literal(tok: str) -> object:
    up = tok.upper()
    if up == "NULL":
        return None
    if up in ("TRUE", "FALSE"):
        return up == "TRUE"
    if (up.startswith("B'") or up.startswith("b'")) and tok.endswith("'"):
        return int(tok[2:-1], 2)
    if up.startswith("0X"):
        try:
            return int(tok, 16)
        except ValueError:
            return tok
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok


def _ddl_columns(lines: list[str]) -> dict[str, list[str]]:
    """table -> ordered column names, reconstructed from collected
    non-INSERT lines (CREATE TABLE bodies are a few hundred bytes)."""
    tables: dict[str, list[str]] = {}
    current: str | None = None
    for line in lines:
        m = _CREATE_RE.search(line)
        if m:
            current = m.group(1)
            tables[current] = []
            continue
        if current is not None:
            c = _COL_DEF_RE.match(line)
            if c:
                tables[current].append(c.group(1))
            elif line.strip().startswith(")"):
                current = None
    return tables


def read_sql_dump(
    spark: SparkSession, path: str, table: str | None = None
) -> DataFrame:
    """Parse one dump (file or directory of .sql parts) into a typed
    DataFrame. ``table`` selects among multi-table dumps; default =
    the only/first table encountered — NEVER a mix of all tables (a
    two-table dump read with table=None yields just the first table's
    rows, matching the documented single-table contract)."""
    lines = spark.read.text(path)
    is_insert = F.upper(F.trim(F.col("value"))).rlike(r"^(INSERT|REPLACE)\s")
    # DDL + comments are bounded in any sane dump, but the collect is
    # driver-side — cap it so a pathological mostly-comment file fails
    # loudly instead of OOMing the driver. limit(N+1) keeps the probe
    # itself bounded.
    ddl_rows = lines.filter(~is_insert).limit(_MAX_DDL_LINES + 1).collect()
    if len(ddl_rows) > _MAX_DDL_LINES:
        raise ValueError(
            f"read_sql_dump: {path!r} has more than {_MAX_DDL_LINES:,} "
            "non-INSERT lines — that is not a DDL header, it is a "
            "comment/garbage bomb; strip the file or raise "
            "d2d_spark.sources.sqlfile._MAX_DDL_LINES explicitly"
        )
    col_map = _ddl_columns([r.value for r in ddl_rows])
    if table is None:
        if col_map:
            # dict preserves insertion order = file order of the DDL
            table = next(iter(col_map))
        else:
            first = lines.filter(is_insert).first()
            m = _INSERT_RE.match(first.value) if first is not None else None
            if m:
                table = m.group(2)

    def parse_part(rows):
        for r in rows:
            m = _INSERT_RE.match(r.value)
            if not m:
                continue
            tbl = m.group(2)
            if table is not None and tbl != table:
                continue
            explicit = (
                [c.strip().strip("`") for c in m.group(3).split(",")] if m.group(3) else None
            )
            names = explicit or col_map.get(tbl)
            for tup in parse_values(m.group(4)):
                keys = names if names and len(names) == len(tup) else [
                    f"c{i}" for i in range(len(tup))
                ]
                yield json.dumps(dict(zip(keys, tup)), ensure_ascii=False, default=str)

    json_rdd = lines.filter(is_insert).rdd.mapPartitions(parse_part)
    if json_rdd.isEmpty():
        return spark.createDataFrame([], T.StructType([]))
    return spark.read.json(json_rdd)


_ESC_PREFIX = {"insert": "INSERT INTO", "ignore": "INSERT IGNORE INTO", "replace": "REPLACE INTO"}


def _escape_sql_string(c: Column) -> Column:
    """Escape for a single-quoted SQL literal that must survive a
    line-oriented file: backslash first, then quote, then control
    characters (a literal newline inside a value would split the
    statement across lines and break any line-based reader — the same
    reason mysqldump escapes them)."""
    esc = F.regexp_replace(c, r"\\", r"\\\\")
    esc = F.regexp_replace(esc, "'", r"\\'")
    esc = F.regexp_replace(esc, "\n", r"\\n")
    esc = F.regexp_replace(esc, "\r", r"\\r")
    esc = F.regexp_replace(esc, "\t", r"\\t")
    return F.regexp_replace(esc, "\x00", r"\\0")


def _sql_value_expr(name: str, dt: T.DataType) -> Column:
    """Render one column as a SQL literal, entirely JVM-side."""
    c = F.col(name)
    if isinstance(dt, (T.StringType, T.CharType, T.VarcharType)):
        rendered = F.concat(F.lit("'"), _escape_sql_string(c), F.lit("'"))
    elif isinstance(dt, T.TimestampType):
        rendered = F.concat(F.lit("'"), F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("'"))
    elif isinstance(dt, T.DateType):
        rendered = F.concat(F.lit("'"), F.date_format(c, "yyyy-MM-dd"), F.lit("'"))
    elif isinstance(dt, T.BinaryType):
        rendered = F.concat(F.lit("0x"), F.hex(c))
    elif isinstance(dt, T.BooleanType):
        rendered = F.when(c, F.lit("TRUE")).otherwise(F.lit("FALSE"))
    elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        rendered = F.concat(F.lit("'"), _escape_sql_string(F.to_json(c)), F.lit("'"))
    else:
        rendered = c.cast("string")
    return F.coalesce(rendered, F.lit("NULL"))


def render_sql_statements(
    df: DataFrame,
    table: str,
    mode: str = "insert",
    compress: int = 1,
    duplicate_update: str | None = None,
) -> DataFrame:
    """DataFrame -> single-column DataFrame of INSERT statements.

    ``compress`` > 1 packs that many rows into one multi-VALUES
    statement; grouping keys are partition-local (monotonic ids share
    a partition prefix) so compression adds no cross-partition
    shuffle skew."""
    prefix = _ESC_PREFIX[mode]
    collist = ", ".join(f"`{c}`" for c in df.columns)
    head = f"{prefix} `{table}` ({collist}) VALUES "
    tail = f" ON DUPLICATE KEY UPDATE {duplicate_update}" if duplicate_update else ""
    row_expr = F.concat(
        F.lit("("),
        F.concat_ws(", ", *[_sql_value_expr(f.name, f.dataType) for f in df.schema.fields]),
        F.lit(")"),
    )
    if compress <= 1:
        return df.select(F.concat(F.lit(head), row_expr, F.lit(tail + ";")).alias("value"))
    grouped = (
        df.select(row_expr.alias("__row"), F.monotonically_increasing_id().alias("__id"))
        .groupBy(F.floor(F.col("__id") / compress).alias("__g"))
        # single-line statements (", " not ",\n"): the reader parses
        # line-wise, and mysqldump's extended INSERTs are one line too
        .agg(F.concat_ws(", ", F.collect_list("__row")).alias("__rows"))
    )
    return grouped.select(F.concat(F.lit(head), F.col("__rows"), F.lit(tail + ";")).alias("value"))


class SqlFileConnector(Connector):
    """Directory of ``<table>.sql`` dumps."""

    ext = ".sql"

    def __init__(self, root: str, spark: SparkSession | None = None):
        self.root = root
        self.spark = require_spark(spark)

    def path(self, index: str) -> str:
        return os.path.join(self.root, f"{index}{self.ext}")

    def get_indexes(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            n[: -len(self.ext)]
            for n in os.listdir(self.root)
            if n.endswith(self.ext) and not n.endswith(".ddl.sql")
        )

    def read(self, index: str, **kw) -> DataFrame:
        return read_sql_dump(self.spark, self.path(index), table=index)

    def write(
        self,
        df: DataFrame,
        index: str,
        mode: str = "insert",
        pks: list[str] | None = None,
        compress: int = 1,
        duplicate_update: str | None = None,
        include_ddl: bool = True,
        **kw,
    ) -> None:
        # translate Sink-contract modes into dump-statement prefixes:
        # a dump file has no existing state to merge with, so
        # append/overwrite render plain INSERTs and upsert renders the
        # ON DUPLICATE KEY UPDATE suffix (all non-pk columns) the
        # reference's gen_insert_sql(duplicate_update=True) produces.
        # `append` must also append FILES — a second append batch adds
        # statement parts next to the first instead of clobbering it.
        text_mode = "append" if mode == "append" else "overwrite"
        if mode in ("append", "overwrite"):
            mode = "insert"
        elif mode == "upsert":
            mode = "insert"
            if duplicate_update is None:
                non_pk = [c for c in df.columns if c not in (pks or [])]
                duplicate_update = ", ".join(f"`{c}`=VALUES(`{c}`)" for c in non_pk) or None
        stmts = render_sql_statements(
            df, index, mode=mode, compress=compress, duplicate_update=duplicate_update
        )
        stmts.write.mode(text_mode).text(self.path(index))
        if include_ddl:
            os.makedirs(self.root, exist_ok=True)
            ddl_path = os.path.join(self.root, f"{index}.ddl.sql")
            with open(ddl_path, "w", encoding="utf-8") as fh:
                fh.write(mysql_ddl(index, df.schema, pks) + "\n")
