"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is consumed through the noop sink so the measurement is engine
execution (scan → transform → exchange), not driver-side row serialization
— the same discipline you'd use benchmarking on a real cluster.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3); the headline
per-query number (and the total) is the MEDIAN, with per-query min/max
recorded under "spread" — single-run numbers at these absolute times
(0.3-5 s) carry ±0.3 s scheduler noise, which previously read as
regressions round over round.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from magshield_data_pipeline_spark.session import get_spark


def consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("magshield-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once on a trivial job so query timings measure
    # steady-state execution, not first-job startup
    spark.range(1000).selectExpr("sum(id)").collect()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name, spec in QUERY_REGISTRY.items():
        runs: list[float] = []
        for _ in range(n_runs):
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            consume(df)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spread[name] = {"min": round(runs[0], 3), "max": round(runs[-1], 3)}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs_per_query": n_runs,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
