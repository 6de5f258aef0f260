"""Capture .explain('formatted') for registry queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> <query> [<query> ...]
e.g. python scripts/capture_plans.py before opportunity_export_pipeline

Only builds the DataFrame (fn()) and plans it — no noop consumption —
so it is safe to run for LAZY queries while other work shares the box.
Eager queries (streaming drains, iterative loops, ledger builders) do
their real work inside fn(); capture those with profile_query.py
instead, on an idle box.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from magshield_data_pipeline_spark.session import get_spark, release_caches  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("magshield-plans")
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    )
    os.makedirs(plan_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERY_REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out = os.path.join(plan_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"{name}: {out} ({len(plan)} B)")
        release_caches(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
