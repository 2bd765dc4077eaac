"""Nested / semi-structured data utilities — the companion to the
document connectors (Mongo, ES, JSON-lines all emit nested records;
the reference flattens them row-by-row in Python before insert —
d22d/model/mongodbmodel.py hands dicts straight to the relational
writer). Here flattening is a schema-driven SELECT: zero data
movement, pure column pruning friendliness, no Python.

  flatten_structs — recursively lift every struct field to a
      top-level column named parent<sep>child. Arrays and maps are
      left as values (exploding is a ROW-multiplying decision the
      caller must make; see explode_path). Name collisions fail
      loudly rather than silently shadowing.
  explode_path — explode one (possibly nested) array-of-struct path
      into rows and flatten the element, keeping all other columns:
      the document→relational workhorse (one order doc with N line
      items → N rows).
  schema_paths — every leaf path with its type, the introspection
      helper the migration DDL layer feeds from.

All three read only df.schema on the driver; the result plans are
plain projections/generators, so Catalyst pushes column pruning into
the source scan — at 100 TB you read the two leaf columns you asked
for, not the document blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_paths(schema: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    """Every leaf path ('a.b.c' dotted) with its data type. Arrays and
    maps are leaves (their element schema is the caller's next
    explode decision)."""
    out: list[tuple[str, T.DataType]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(schema_paths(f.dataType, prefix=f"{path}."))
        else:
            out.append((path, f.dataType))
    return out


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 16) -> DataFrame:
    """Lift every struct field (recursively) to a top-level column;
    non-struct columns pass through in order. NULL structs yield NULL
    leaves (struct field access is NULL-propagating). Collisions
    between a flattened name and an existing (or other flattened)
    name raise — silent shadowing corrupts downstream writes."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")

    def expand(path: list[str], dt: T.DataType) -> list[tuple[str, list[str]]]:
        if isinstance(dt, T.StructType) and len(path) <= max_depth:
            out = []
            for f in dt.fields:
                out.extend(expand(path + [f.name], f.dataType))
            return out
        return [(sep.join(path), path)]

    cols: list[tuple[str, list[str]]] = []
    for f in df.schema.fields:
        cols.extend(expand([f.name], f.dataType))
    _check_collisions("flatten_structs", [n for n, _ in cols], sep)
    return df.select(
        *[
            (F.col(path[0]) if len(path) == 1 else _field(path)).alias(name)
            for name, path in cols
        ]
    )


def _check_collisions(who: str, names: list[str], sep: str) -> None:
    """Spark resolves column names case-INSENSITIVELY by default, so
    the collision refusal must fold case too — 'user_Id' vs 'user_id'
    would pass a string-equality check and then blow up (or silently
    shadow) at the next by-name reference."""
    folded = [n.lower() for n in names]
    dupes = sorted({names[i] for i, n in enumerate(folded) if folded.count(n) > 1})
    if dupes:
        raise ValueError(
            f"{who}: name collisions (case-insensitive) {dupes} — pick a "
            f"different sep than {sep!r} or rename upstream"
        )


def _field(path: list[str]):
    c = F.col(path[0])
    for p in path[1:]:
        c = c.getField(p)
    return c


def explode_path(
    df: DataFrame, path: str, sep: str = "_", keep_empty: bool = False
) -> DataFrame:
    """Explode the array at dotted ``path`` into one row per element
    (``keep_empty=True`` uses explode_outer: rows whose array is
    empty/NULL survive with a NULL element). Struct elements flatten
    to path<sep>field columns, scalar elements to one column named
    like the path. A TOP-LEVEL array column is consumed (dropped);
    a nested array's parent struct passes through unchanged — lift
    its siblings with flatten_structs, which composes cleanly on
    either side. Output name collisions raise."""
    parts = path.split(".")
    dt: T.DataType = df.schema
    for i, p in enumerate(parts):
        if not isinstance(dt, T.StructType) or p not in dt.fieldNames():
            raise ValueError(
                f"explode_path: no field {'.'.join(parts[: i + 1])!r} in schema"
            )
        dt = dt[p].dataType
    if not isinstance(dt, T.ArrayType):
        raise ValueError(f"explode_path: {path!r} is {dt.simpleString()}, not an array")
    gen = (F.explode_outer if keep_empty else F.explode)(_field(parts))
    out_name = sep.join(parts)
    keep = [c for c in df.columns if not (len(parts) == 1 and c == parts[0])]
    tmp = f"__{out_name}"
    while tmp in keep:  # a real column may already own the temp name
        tmp += "_"
    exploded = df.select(*keep, gen.alias(tmp))
    el = dt.elementType
    if isinstance(el, T.StructType):
        out = exploded.select(
            *keep,
            *[
                F.col(tmp).getField(f.name).alias(f"{out_name}{sep}{f.name}")
                for f in el.fields
            ],
        )
    else:
        out = exploded.withColumnRenamed(tmp, out_name)
    _check_collisions("explode_path", list(out.columns), sep)
    return out
