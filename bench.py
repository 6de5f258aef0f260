"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is consumed through the noop sink so the measurement is engine
execution (scan → transform → exchange), not driver-side row serialization
— the same discipline you'd use benchmarking on a real cluster.
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

    timings: dict[str, float] = {}
    for name, spec in QUERY_REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        t0 = time.perf_counter()
        consume(df)
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
