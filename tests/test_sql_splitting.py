"""Property tests for the quote-aware statement splitting helpers
(ADVICE r11: the UPDATE WHERE split must not fire inside string
literals; _split_cols must not split on commas inside literals).

These are pure-Python (no Spark session) so hypothesis can run many
examples cheaply.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from carbondata_spark.sql import _find_keyword, _split_cols

# literal fragments that may contain the hostile tokens
_frag = st.text(
    alphabet="abcwhere,()<> ",
    min_size=0,
    max_size=12,
)


@given(st.lists(_frag, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_cols_roundtrips_quoted_commas(frags):
    """Joining quoted fragments with commas splits back to the same
    fragments no matter what commas/parens/keywords the literals hold."""
    items = [f"c{i} = '{f}'" for i, f in enumerate(frags)]
    joined = ",".join(items)
    assert _split_cols(joined) == items


@given(_frag, _frag)
@settings(max_examples=200, deadline=None)
def test_find_keyword_skips_quoted_occurrences(lit, tail):
    """A 'where' inside a single-quoted literal is never the split
    point; the first unquoted occurrence is found exactly."""
    s = f"a = '{lit}' where {tail}"
    idx = _find_keyword(s, "where")
    # the found token is the unquoted one that follows the literal
    assert idx == len(f"a = '{lit}' ")
    assert s[idx : idx + 5].lower() == "where"


def test_find_keyword_absent_and_word_boundary():
    assert _find_keyword("a = 'x where y'", "where") == -1
    # substrings are not matches: nowhere/wherever
    assert _find_keyword("a = nowhere", "where") == -1
    assert _find_keyword("a = wherever", "where") == -1
    # doubled-quote escape lands back inside the literal
    assert _find_keyword("a = 'it''s where'", "where") == -1
    assert _find_keyword("a = 'it''s' where b", "where") == len("a = 'it''s' ")


def test_split_cols_preserves_nested_type_commas():
    assert _split_cols("a decimal(10,2), b array<struct<x:int,y:int>>") == [
        "a decimal(10,2)",
        " b array<struct<x:int,y:int>>",
    ]
