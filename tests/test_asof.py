"""as-of join edge cases: inclusivity, no-prior-match NULLs, tiebreaks."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from carbondata_spark.operators.asof import asof_join


def ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01 10:00:00")),  # before any right row
            (2, "u1", ts("2024-01-01 11:00:00")),  # exactly at right row (inclusive)
            (3, "u1", ts("2024-01-01 12:30:00")),  # between right rows
            (4, "u2", ts("2024-01-01 09:00:00")),  # other key
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 11:00:00"), 100.0),
            ("u1", ts("2024-01-01 12:00:00"), 200.0),
            ("u2", ts("2024-01-01 08:00:00"), 50.0),
        ],
        "k string, ts timestamp, price double",
    )
    out = {
        r["id"]: r["price_asof"]
        for r in asof_join(left, right, on="ts", by="k", value_cols=["price"]).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 200.0, 4: 50.0}


def test_asof_join_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01 11:00:00"))], "id long, k string, ts timestamp"
    )
    # two right rows at the identical timestamp: highest seq must win
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 11:00:00"), 1, 10.0),
            ("u1", ts("2024-01-01 11:00:00"), 2, 20.0),
        ],
        "k string, ts timestamp, seq int, price double",
    )
    out = asof_join(
        left, right, on="ts", by="k", value_cols=["seq", "price"], tiebreak="seq"
    ).collect()[0]
    assert out["seq_asof"] == 2 and out["price_asof"] == 20.0
