"""Rounding-margin audit as a CI gate (tools/margin_audit.py).

Every oracle that rounds an order-dependent double aggregate must keep a
>=100x safety factor between its values' distance-to-rounding-boundary
and plausible cross-engine summation drift — otherwise Spark and DuckDB
can legitimately round to different cents (the r3 q_complex_sql_load
escape). Fragile queries are fixed by summing DECIMAL(30,6) on both
sides (functions.dsum/davg), which this audit recognizes as exact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from margin_audit import audit_query, strip_rounds  # noqa: E402


def test_strip_rounds_balanced_and_scales():
    sql = "SELECT round(sum(CAST(x AS DOUBLE)), 2) AS a, round(avg(y), 4) AS b FROM t"
    stripped, scales, acc = strip_rounds(sql)
    assert "round" not in stripped.lower()
    assert sorted(scales) == [2, 4]
    assert acc  # double sum/avg -> drifting
    # decimal sums are exact: not accumulative
    _, _, acc2 = strip_rounds(
        "SELECT CAST(round(sum(CAST(x AS DECIMAL(30,6))), 2) AS DOUBLE) AS a FROM t"
    )
    assert not acc2
    # per-row rounding of identical doubles: not accumulative
    _, _, acc3 = strip_rounds("SELECT round(x / y, 2) AS r FROM t")
    assert not acc3


def test_strip_rounds_skips_quoted_literals():
    """Parens inside string literals must not unbalance the scan or move
    the argument split (previously mis-sliced the expression)."""
    sql = "SELECT round(sum(instr(s, '(')), 2) AS a FROM t"
    stripped, scales, acc = strip_rounds(sql)
    assert stripped == "SELECT (sum(instr(s, '('))) AS a FROM t"
    assert scales == [2] and acc
    # a quoted comma must not become the argument split
    sql2 = "SELECT round(sum(length(replace(s, ',)', ''))), 3) AS a FROM t"
    stripped2, scales2, _ = strip_rounds(sql2)
    assert scales2 == [3]
    assert stripped2 == "SELECT (sum(length(replace(s, ',)', '')))) AS a FROM t"
    # doubled '' escape nets out (close-then-reopen)
    sql3 = "SELECT round(sum(instr(s, 'it''s (x')), 2) AS a FROM t"
    _, scales3, _ = strip_rounds(sql3)
    assert scales3 == [2]


def test_no_registered_oracle_is_fragile(oracle_con, sf_dir):
    from carbondata_spark.queries import registry

    fragile = {}
    for name, q in registry().items():
        if not q.oracle:
            continue
        res = audit_query(oracle_con, name, q.oracle)
        if res and res.get("fragile"):
            fragile[name] = res
    assert not fragile, f"fragile rounded aggregates: {fragile}"
