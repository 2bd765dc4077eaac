"""Property-based fuzz of the xls_lite BIFF8 codec: any frame of
strings, floats, ints, bools and Nones must survive write_sheets →
read_sheets with values intact (numbers come back as IEEE doubles —
cell values carry no integer granularity — and None/NaN as NaN).

Unlike SpreadsheetML there is no XML-legality constraint: BIFF strings
are raw UTF-16 code units, so control characters are fair game too.
"""

from __future__ import annotations

import io
import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from d2d_spark.sources.xls_lite import read_sheets, write_sheets

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
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
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(st.tuples(_cell, _cell, _cell), min_size=0, max_size=8))
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
