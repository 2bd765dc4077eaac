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


def jdbc_column_types(schema: T.StructType, pks: list[str] | None = None) -> str:
    """`createTableColumnTypes` option string for df.write.jdbc —
    per-column overrides using the same ladder."""
    pkset = set(pks or [])
    return ", ".join(
        f"{f.name} {mysql_type(f.dataType, f.name in pkset)}" for f in schema.fields
    )
