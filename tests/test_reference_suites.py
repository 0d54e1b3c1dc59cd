"""Replay the reference's remaining golden test suites, verbatim.

Beyond the 143-query allqueries corpus (tests/test_olap100.py), the
reference ships 26 more ACTIVE Scala acceptance classes (the two
complex-type classes whose bodies the reference itself left inside
block comments are excluded by construction — strip_comments drops
them). Each suite's beforeAll DDL/LOAD statements and each test's
statements + checkAnswers replay through the repo's own front door via
tests/_scala_replay.py: literal Seq(Row(...)) goldens compare as
multisets; carbon-vs-hive differential checkAnswers run with the Hive
side emulated as plain spark.read.csv temp views — which makes them a
REAL differential test of this repo's LOAD path (header-by-name
projection, dd-MM-yyyy timestamps, int-measure→double coercion) against
a raw CSV read.

Front-door parity gaps these suites exposed, fixed in round 14:
- MEASURES is optional in CREATE CUBE (measure-less typed cubes);
- bare `decimal` dimension type (FilterProcessor_FT), excluded from the
  zone-map sort set (pyarrow cannot read parquet decimal statistics);
- a file-carried CSV header maps to cube columns BY NAME and may be a
  superset of the cube (14-column data.csv into 3-column typed cubes).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _scala_replay import BASE, SuiteSession, parse_suite  # noqa: E402

# The reference harness's global property (CarbonHiveContext.scala:51).
_HARNESS_PROPS = {"carbon.timestamp.format": "dd-MM-yyyy"}

# suite -> per-suite property overrides (a suite that sets its own
# CarbonProperties in beforeAll).
SUITES: dict[str, dict[str, str]] = {
    "aggquery/AllDataTypesTestCaseAggregate": {},
    "aggquery/IntegerDataTypeTestCase": {},
    "aggquery/NumericDataTypeTestCase": {},
    "aggquery/StringDataTypeTestCase": {},
    "aggquery/TimestampDataTypeTestCase": {},
    "dataload/TestLoadDataWithHiveSyntax": {},
    "detailquery/AllDataTypesTestCase": {},
    "detailquery/HighCardinalityDataTypesTestCase": {},
    "detailquery/IntegerDataTypeTestCase": {},
    "detailquery/NumericDataTypeTestCase": {},
    "detailquery/StringDataTypeTestCase": {},
    "detailquery/TimestampDataTypeTestCase": {},
    "directdictionary/TimestampDataTypeDirectDictionaryTest": {
        # this suite overrides the harness format in its own beforeAll
        # (CarbonProperties.addProperty, TimestampDataTypeDirectDictionaryTest.scala:38)
        "carbon.timestamp.format": "yyyy-MM-dd HH:mm:ss",
    },
    "filterexpr/AllDataTypesTestCaseFilter": {},
    "filterexpr/FilterProcessor_FT": {},
    "filterexpr/IntegerDataTypeTestCase": {},
    "filterexpr/NumericDataTypeTestCase": {},
    "filterexpr/StringDataTypeTestCase": {},
    "filterexpr/TimestampDataTypeTestCase": {},
    "joinquery/AllDataTypesTestCaseJoin": {},
    "joinquery/IntegerDataTypeTestCase": {},
    "joinquery/NumericDataTypeTestCase": {},
    "joinquery/StringDataTypeTestCase": {},
    "joinquery/TimestampDataTypeTestCase": {},
    "sortexpr/AllDataTypesTestCaseSort": {},
    "sortexpr/IntegerDataTypeTestCase": {},
    "sortexpr/NumericDataTypeTestCase": {},
    "sortexpr/StringDataTypeTestCase": {},
    "sortexpr/TimestampDataTypeTestCase": {},
}

# (suite, test-name fragment) -> reason, for genuine engine-evolution
# divergences. Empty = everything replays.
SKIPS: dict[tuple[str, str], str] = {}


def _collect() -> list[tuple[str, str]]:
    out = []
    for suite in SUITES:
        path = f"{BASE}/{suite}.scala"
        if not os.path.exists(path):
            continue
        _, tests = parse_suite(path)
        for name, _ops in tests:
            out.append((suite, name))
    return out


_CASES = _collect() if os.path.isdir(BASE) else []

pytestmark = pytest.mark.skipif(not _CASES, reason="reference checkout not available")

_SESSIONS: dict[str, SuiteSession] = {}


def _session(spark, suite: str) -> SuiteSession:
    if suite not in _SESSIONS:
        props = dict(_HARNESS_PROPS)
        props.update(SUITES[suite])
        _SESSIONS[suite] = SuiteSession(spark, f"{BASE}/{suite}.scala", props)
    return _SESSIONS[suite]


def test_suite_inventory_is_complete():
    """Every ACTIVE reference suite with checkAnswers is in SUITES (the
    allqueries corpus has its own dedicated replay). A new suite
    appearing in the reference fails here instead of silently missing."""
    import glob
    import re as _re

    from _scala_replay import strip_comments

    missing = []
    for path in glob.glob(f"{BASE}/*/*.scala"):
        rel = os.path.relpath(path, BASE)[: -len(".scala")]
        if rel.startswith("allqueries/"):
            continue
        src = strip_comments(open(path).read())
        if _re.search(r"\bcheckAnswer\s*\(", src) and rel not in SUITES:
            missing.append(rel)
    assert not missing, f"active reference suites not replayed: {missing}"


@pytest.mark.parametrize("suite,name", _CASES, ids=lambda v: v)
def test_reference_suite(spark, suite, name):
    for (s, frag), reason in SKIPS.items():
        if s == suite and frag in name:
            pytest.skip(reason)
    sess = _session(spark, suite)
    sess.run_test(name)
