"""Property-based fuzz of the xlsx_lite codec: any frame of strings,
floats, ints, bools and Nones must survive write_sheets → read_sheets
with values intact (numbers come back as IEEE doubles — SpreadsheetML
has no integer granularity — and None/NaN as NaN)."""

from __future__ import annotations

import io
import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from d2d_spark.sources.xlsx_lite import read_sheets, write_sheets

# XML 1.0 forbids most control chars; the connector scrubs them before
# the codec sees data (scrub_illegal_xml), so the codec contract is
# XML-legal text. Allow everything printable incl. unicode + specials.
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        blacklist_characters="".join(chr(c) for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)),
    ),
    max_size=40,
)
_cell = st.one_of(
    st.none(),
    _text,
    st.integers(min_value=-(2**52), max_value=2**52),  # exact in a double
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
)


def _expect(v):
    """What the codec contract says comes back."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


@settings(max_examples=150, deadline=None)
@given(
    rows=st.lists(st.tuples(_cell, _cell, _cell), min_size=0, max_size=8),
)
def test_roundtrip_any_frame(rows):
    pdf = pd.DataFrame(rows, columns=["a", "b", "c"]) if rows else pd.DataFrame(
        {"a": [], "b": [], "c": []}
    )
    buf = io.BytesIO()
    write_sheets([("s", pdf)], buf)
    back = read_sheets(buf.getvalue())["s"]
    assert list(back.columns) == ["a", "b", "c"]
    assert len(back) == len(pdf)
    for r in range(len(pdf)):
        for c in ("a", "b", "c"):
            want = _expect(pdf.iloc[r][c])
            got = back.iloc[r][c]
            if want is None:
                assert got is None or (isinstance(got, float) and math.isnan(got))
            elif isinstance(want, float):
                assert isinstance(got, (int, float)) and (
                    got == want or (math.isnan(got) and math.isnan(want))
                )
            else:
                assert got == want, (want, got)
