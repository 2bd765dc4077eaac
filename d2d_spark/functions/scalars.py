"""Scalar function library — SURVEY.md §2.8 re-expressed as Column
helpers built purely from JVM-side ``pyspark.sql.functions`` (no Python
UDFs: everything here stays inside whole-stage codegen).

Reference parity map (citations into /root/reference):
  - format_value            d22d/task.py:23-28
  - md5 of string           d22d/utils/utils.py:365-375
  - epoch<->string helpers  d22d/utils/timeutils.py:1-31
  - datetime range clamp    d22d/utils/db/__init__.py:1340-1354
  - lossy cast w/ default   d22d/utils/db/__init__.py:1356-1368
  - secure_filename         d22d/utils/db/__init__.py:54-85
  - JSON encode of nested   d22d/utils/utils.py:318-344
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_value(col: Column) -> Column:
    """Reference `format_value` (d22d/task.py:23-28): strings are
    stripped; floats with zero fractional part become ints. Used for
    join-key normalization. Output is string-typed (the reference
    stringifies keys before hashing)."""
    c = col.cast("string")
    trimmed = F.trim(c)
    # try_cast: non-numeric strings yield NULL instead of an ANSI error
    as_double = col.try_cast("double")
    integral = as_double.isNotNull() & (as_double == F.floor(as_double))
    return (
        F.when(col.cast("string").isNull(), F.lit(None).cast("string"))
        .when(integral, as_double.cast("long").cast("string"))
        .otherwise(trimmed)
    )


def md5_hex(col: Column) -> Column:
    """md5 of the UTF-8 string form (d22d get_md5, utils.py:365-369)."""
    return F.md5(col.cast("string"))


def as_double(col: Column, dtype: str) -> Column:
    """Numeric view of any orderable column for binning/bucketing.

    Spark 4 refuses a direct TIMESTAMP_NTZ -> DOUBLE cast
    (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION) and DATE -> DOUBLE
    likewise, so every temporal flavor routes through TIMESTAMP first
    (epoch seconds). Pass the column's ``simpleString()`` dtype.
    Callers that bin on the result must keep exact predicates on the
    original column — this view is for bucket ARITHMETIC only."""
    if dtype.startswith("timestamp") or dtype == "date":
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def epoch_to_ts(col: Column) -> Column:
    """Epoch seconds -> timestamp (timeutils.py:1-31)."""
    return F.to_timestamp(F.from_unixtime(col.cast("long")))


def ts_to_epoch(col: Column) -> Column:
    """Timestamp -> epoch seconds."""
    return F.unix_timestamp(col)


def ts_to_str(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Timestamp -> formatted string (get_time_str_from_stamp)."""
    return F.date_format(col, fmt)


def clamp_datetime(
    col: Column,
    lo: str = "1971-01-01 00:00:00",
    hi: str = "2106-01-01 00:00:00",
) -> Column:
    """ClickHouse DateTime clamp (db/__init__.py:1340-1354): values
    outside [lo, hi] snap to the nearest bound."""
    lo_ts, hi_ts = F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
    return F.when(col < lo_ts, lo_ts).when(col > hi_ts, hi_ts).otherwise(col)


def cast_with_default(col: Column, dtype: str, default) -> Column:
    """Lossy cast with per-type default (data_types_check,
    db/__init__.py:1356-1368): non-castable values become `default`
    instead of NULL/error."""
    return F.coalesce(col.try_cast(dtype), F.lit(default).cast(dtype))


def json_encode(col: Column) -> Column:
    """Nested value -> JSON string at a sink boundary
    (JSONEncoderWithBytes, utils.py:318-344). In Spark nested stays
    first-class; this is only for sinks that need strings."""
    return F.to_json(col)


def bytes_b64(col: Column) -> Column:
    """bytes -> base64 string (utils.py:330-335)."""
    return F.base64(col)


_FORBIDDEN = r'[\\/:*?"<>|\x00-\x1f]'
_WINDOWS_DEVICES = (
    "CON PRN AUX NUL COM1 COM2 COM3 COM4 LPT1 LPT2 LPT3 LPT4".split()
)


def secure_filename(col: Column, max_len: int = 250) -> Column:
    """Filename sanitize (db/__init__.py:54-85): strip forbidden chars,
    collapse whitespace to underscore, guard Windows device names,
    truncate. Needed by file sinks that derive paths from table names."""
    c = F.regexp_replace(col.cast("string"), _FORBIDDEN, "")
    c = F.regexp_replace(c, r"\s+", "_")
    c = F.when(
        F.upper(c).isin(_WINDOWS_DEVICES), F.concat(F.lit("_"), c)
    ).otherwise(c)
    return F.substring(c, 1, max_len)


def scrub_illegal_xml(col: Column) -> Column:
    """Excel illegal-character scrub (db/__init__.py:896-909)."""
    return F.regexp_replace(
        col.cast("string"), "[\x00-\x08\x0b-\x0c\x0e-\x1f]", ""
    )


def jaro_winkler(a: Column, b: Column) -> Column:
    """Jaro-Winkler similarity in [0, 1] — the name-matching scalar
    the fuzzy family lacked next to Levenshtein (typo distance) and
    Soundex (phonetic blocking). Classic Winkler 1990 conventions,
    chosen to match DuckDB's jaro_winkler_similarity exactly so the
    driver can cross-check it: prefix scale 0.1 over at most 4 common
    leading chars, the boost applied ONLY when jaro > 0.7, and empty-
    vs-anything (including empty-vs-empty) scoring 0.0. NULL inputs
    return NULL.

    An Arrow-batched pandas UDF (there is no Column-algebra form of
    the matching-window scan): use it on BLOCKED candidate pairs —
    the verify stage of phonetic/FastSS/LSH blocking — never as a
    corpus-scale cross-join predicate."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type hints on purpose: pd is function-local, so stringified
    # 'pd.Series' annotations can't resolve at decoration time
    @pandas_udf("double", PandasUDFType.SCALAR)
    def _jw(sa, sb):
        def one(x, y):
            if x is None or y is None:
                return None
            la, lb = len(x), len(y)
            if la == 0 or lb == 0:
                return 0.0
            window = max(la, lb) // 2 - 1
            if window < 0:
                window = 0
            ymatched = [False] * lb
            xmatch = []
            for i, cx in enumerate(x):
                lo, hi = max(0, i - window), min(lb, i + window + 1)
                for j in range(lo, hi):
                    if not ymatched[j] and y[j] == cx:
                        ymatched[j] = True
                        xmatch.append(cx)
                        break
            m = len(xmatch)
            if m == 0:
                return 0.0
            ymatch = [y[j] for j in range(lb) if ymatched[j]]
            # INTEGER halving, the classic strcmp95 convention DuckDB
            # follows: greedy first-available matching can leave an
            # ODD out-of-order count, and /2.0 would diverge on it
            t = sum(cx != cy for cx, cy in zip(xmatch, ymatch)) // 2
            jaro = (m / la + m / lb + (m - t) / m) / 3.0
            if jaro <= 0.7:
                return jaro
            p = 0
            for cx, cy in zip(x, y):
                if cx != cy or p == 4:
                    break
                p += 1
            return jaro + p * 0.1 * (1.0 - jaro)

        # nullable Float64 so a NULL input round-trips as NULL, not NaN
        return pd.Series([one(x, y) for x, y in zip(sa, sb)], dtype="Float64")

    return _jw(a, b)
