"""Differential test: every registered query vs its DuckDB oracle at sf0.01.

This mirrors the driver's correctness gate so failures surface locally
first. Queries without an oracle get a rows-only smoke check.
"""

from __future__ import annotations

import pytest

from carbondata_spark.oracle import run_query_diff
from carbondata_spark.queries import registry


def _names() -> list[str]:
    return sorted(registry().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    res = run_query_diff(spark, oracle_con, sf_dir, name)
    assert res.ok, f"{name}: {res.detail}"
