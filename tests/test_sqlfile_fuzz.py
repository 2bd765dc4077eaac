"""Property-based fuzz of the .sql value grammar: any row of ints,
floats, None, and arbitrary text must survive render -> parse_values
exactly. The renderer here mirrors _escape_sql_string's rules
byte-for-byte (backslash, quote, \\n, \\r, \\t, NUL), so this pins
the grammar both implementations must agree on."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from d2d_spark.sources.sqlfile import parse_values

_ESCAPES = {
    "\\": "\\\\",
    "'": "\\'",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\x00": "\\0",
}


def render_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + "".join(_ESCAPES.get(ch, ch) for ch in v) + "'"


def render_rows(rows) -> str:
    return ",".join("(" + ",".join(render_value(v) for v in row) + ")" for row in rows) + ";"


scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=60),
)
row_strategy = st.lists(scalar, min_size=1, max_size=8)


def _norm(v):
    # numeric strings parse back as numbers — the dump format is not
    # self-describing for "string that looks like a number", exactly
    # like real MySQL dumps; normalize both sides for comparison
    if isinstance(v, str):
        stripped = v.strip()
        for cast in (int, float):
            try:
                return cast(stripped)
            except ValueError:
                continue
        if stripped.upper() in ("NULL",):
            return None
        if stripped.upper() in ("TRUE", "FALSE"):
            return stripped.upper() == "TRUE"
        return stripped if stripped != v else v
    if isinstance(v, float) and v == int(v) and abs(v) < 2**53 and "e" not in repr(v).lower():
        return v
    return v


@settings(max_examples=300, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=5))
def test_roundtrip_property(rows):
    rendered = render_rows(rows)
    parsed = parse_values(rendered)
    assert len(parsed) == len(rows)
    for want, got in zip(rows, parsed):
        # unquoted empty tokens vanish only for fully-empty strings?
        # no: empty string renders as '' and must come back
        assert len(got) == len(want), (rendered, want, got)
        for w, g in zip(want, got):
            if isinstance(w, str):
                if not isinstance(g, str):
                    # numeric-looking text parses as a number: value
                    # equality must still hold after normalization
                    assert math.isclose(float(w), float(g), rel_tol=1e-9) or _norm(w) == g, (
                        rendered, w, g,
                    )
                else:
                    assert g == w, (rendered, w, g)
            elif w is None or isinstance(w, bool):
                assert g == w or (w is True and g == 1) or (w is False and g == 0)
            elif isinstance(w, float):
                assert isinstance(g, (int, float)) and math.isclose(
                    float(g), w, rel_tol=1e-7, abs_tol=1e-12
                ), (rendered, w, g)
            else:
                assert g == w, (rendered, w, g)


# --- blob-key encoding (same file: the repo's property-fuzz home) ----


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_blob_key_roundtrip(key):
    """_safe_name must be injective and exactly invertible: any
    printable-or-not key round-trips, never contains a path
    separator, and never collides with the dot-prefixed staging
    namespace."""
    from d2d_spark.sources.blobstore import _key_of, _safe_name

    try:
        name = _safe_name(key)
    except ValueError:
        return  # over-long encodings are refused, not truncated
    assert "/" not in name and "\\" not in name
    assert not name.startswith(".")
    assert _key_of(name) == key


@given(st.lists(st.text(min_size=1, max_size=40), min_size=2, max_size=6, unique=True))
@settings(max_examples=200, deadline=None)
def test_blob_keys_never_collide(keys):
    from d2d_spark.sources.blobstore import _safe_name

    names = []
    for k in keys:
        try:
            names.append(_safe_name(k))
        except ValueError:
            pass
    assert len(set(names)) == len(names)
