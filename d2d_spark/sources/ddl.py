"""Schema-to-DDL generation: ``df.schema`` -> CREATE TABLE text.

Replaces the reference's infer-from-first-row DDL
(d22d/utils/db/__init__.py:404-474): the plan's schema already carries
exact types for every column, so the only ladder left is logical type
-> engine physical type. String PK columns become varchar(256) instead
of text, matching the reference's index-ability rule (:441-444).
"""

from __future__ import annotations

from pyspark.sql import types as T

_MYSQL_TYPES: list[tuple[type, str]] = [
    (T.ByteType, "tinyint"),
    (T.ShortType, "smallint"),
    (T.IntegerType, "int"),
    (T.LongType, "bigint"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BooleanType, "tinyint(1)"),
    (T.DateType, "date"),
    (T.TimestampType, "datetime(6)"),
    (T.BinaryType, "blob"),
]


def mysql_type(dt: T.DataType, is_pk: bool = False) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({min(dt.precision, 65)},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "varchar(256)" if is_pk else "text"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "json"
    for cls, name in _MYSQL_TYPES:
        if isinstance(dt, cls):
            return name
    return "text"


def mysql_ddl(table: str, schema: T.StructType, pks: list[str] | None = None) -> str:
    """CREATE TABLE for a MySQL-dialect target (also what the .sql
    sink prepends as its DDL sidecar)."""
    pkset = set(pks or [])
    cols = [
        f"  `{f.name}` {mysql_type(f.dataType, f.name in pkset)}"
        + ("" if f.nullable and f.name not in pkset else " NOT NULL")
        for f in schema.fields
    ]
    if pks:
        cols.append("  PRIMARY KEY (" + ", ".join(f"`{k}`" for k in pks) + ")")
    body = ",\n".join(cols)
    return f"CREATE TABLE IF NOT EXISTS `{table}` (\n{body}\n);"


def jdbc_column_types(
    schema: T.StructType, pks: list[str] | None = None, dialect: str = "mysql"
) -> str:
    """`createTableColumnTypes` option string for df.write.jdbc —
    per-column overrides using the dialect's ladder."""
    pkset = set(pks or [])
    return ", ".join(
        f"{f.name} {dialect_type(f.dataType, dialect, f.name in pkset)}"
        for f in schema.fields
    )


# per-dialect physical-type ladders (reference auto-DDL covers the
# same four engines: MySQL d22d/utils/db/__init__.py:404-474, PG
# myutils.py:755-1050, ClickHouse :1257-1466, Oracle :1501-1596)
_PG_TYPES: list[tuple[type, str]] = [
    (T.ByteType, "smallint"),
    (T.ShortType, "smallint"),
    (T.IntegerType, "integer"),
    (T.LongType, "bigint"),
    (T.FloatType, "real"),
    (T.DoubleType, "double precision"),
    (T.BooleanType, "boolean"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp(6)"),
    (T.BinaryType, "bytea"),
]
_CLICKHOUSE_TYPES: list[tuple[type, str]] = [
    (T.ByteType, "Int8"),
    (T.ShortType, "Int16"),
    (T.IntegerType, "Int32"),
    (T.LongType, "Int64"),
    (T.FloatType, "Float32"),
    (T.DoubleType, "Float64"),
    (T.BooleanType, "Bool"),
    (T.DateType, "Date32"),
    (T.TimestampType, "DateTime64(6)"),
    (T.BinaryType, "String"),
]
_ORACLE_TYPES: list[tuple[type, str]] = [
    (T.ByteType, "NUMBER(5)"),
    (T.ShortType, "NUMBER(5)"),
    (T.IntegerType, "NUMBER(10)"),
    (T.LongType, "NUMBER(19)"),
    (T.FloatType, "BINARY_FLOAT"),
    (T.DoubleType, "BINARY_DOUBLE"),
    (T.BooleanType, "NUMBER(1)"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP(6)"),
    (T.BinaryType, "BLOB"),
]


def dialect_type(dt: T.DataType, dialect: str = "mysql", is_pk: bool = False) -> str:
    """logical Spark type -> engine physical type for one dialect."""
    if dialect == "mysql":
        return mysql_type(dt, is_pk)
    if dialect == "postgresql":
        if isinstance(dt, T.DecimalType):
            return f"numeric({dt.precision},{dt.scale})"
        if isinstance(dt, T.StringType):
            return "varchar(256)" if is_pk else "text"
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            return "jsonb"
        for cls, name in _PG_TYPES:
            if isinstance(dt, cls):
                return name
        return "text"
    if dialect == "clickhouse":
        if isinstance(dt, T.DecimalType):
            return f"Decimal({min(dt.precision, 76)},{dt.scale})"
        if isinstance(dt, (T.StringType, T.ArrayType, T.MapType, T.StructType)):
            return "String"
        for cls, name in _CLICKHOUSE_TYPES:
            if isinstance(dt, cls):
                return name
        return "String"
    if dialect == "oracle":
        if isinstance(dt, T.DecimalType):
            return f"NUMBER({min(dt.precision, 38)},{dt.scale})"
        if isinstance(dt, T.StringType):
            return "VARCHAR2(256)" if is_pk else "VARCHAR2(4000)"
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            return "CLOB"
        for cls, name in _ORACLE_TYPES:
            if isinstance(dt, cls):
                return name
        return "VARCHAR2(4000)"
    raise ValueError(f"unknown dialect {dialect!r}")


def create_table_sql(
    table: str, schema: T.StructType, pks: list[str] | None = None, dialect: str = "mysql"
) -> str:
    """Dialect-correct CREATE TABLE with an explicit PRIMARY KEY (the
    reference's auto-DDL marks PKs on every engine) — issued before a
    staged keyed merge so a missing target is created WITH its key,
    not left to the JDBC writer's keyless defaults.

    ClickHouse has no unique PK constraint: the key becomes the
    MergeTree ORDER BY (its dedup/merge key). Oracle pre-23c lacks
    IF NOT EXISTS, so the statement is wrapped in the standard
    EXECUTE IMMEDIATE / ORA-00955 guard block."""
    pkset = set(pks or [])
    q = "`" if dialect in ("mysql", "clickhouse") else '"'

    def col(f: T.StructField) -> str:
        t = dialect_type(f.dataType, dialect, f.name in pkset)
        if dialect == "clickhouse":
            # ORDER BY columns cannot be Nullable; others should be
            if f.nullable and f.name not in pkset:
                t = f"Nullable({t})"
            return f"  {q}{f.name}{q} {t}"
        nn = "" if f.nullable and f.name not in pkset else " NOT NULL"
        return f"  {q}{f.name}{q} {t}{nn}"

    cols = [col(f) for f in schema.fields]
    keylist = ", ".join(f"{q}{k}{q}" for k in pks) if pks else ""
    if dialect == "clickhouse":
        body = ",\n".join(cols)
        order = f"({keylist})" if pks else "tuple()"
        return (
            f"CREATE TABLE IF NOT EXISTS {q}{table}{q} (\n{body}\n)"
            f" ENGINE = MergeTree ORDER BY {order}"
        )
    if pks:
        cols.append(f"  PRIMARY KEY ({keylist})")
    body = ",\n".join(cols)
    stmt = f"CREATE TABLE {q}{table}{q} (\n{body}\n)"
    if dialect == "oracle":
        esc = stmt.replace("'", "''")
        return (
            "BEGIN EXECUTE IMMEDIATE '" + esc + "'; "
            "EXCEPTION WHEN OTHERS THEN IF SQLCODE != -955 THEN RAISE; END IF; END;"
        )
    return stmt.replace("CREATE TABLE ", "CREATE TABLE IF NOT EXISTS ", 1)
