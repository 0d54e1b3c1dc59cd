"""Dump .explain("formatted") for registry queries to plans/<dir>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <outdir> <suffix> [name ...]
With no names: all headline queries. Plans are captured AFTER one
warm-up resolution so store-backed fact tables exist (their build jobs
do not pollute the captured plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from carbondata_spark.queries import registry
    from carbondata_spark.session import get_spark

    spark = get_spark(app_name="carbondata_spark_plandump")
    reg = registry()
    if not names:
        names = sorted(n for n, q in reg.items() if q.headline)
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
