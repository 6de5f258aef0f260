"""Per-query profiler for the optimization rounds (guide §1).

Usage: python scripts/profile_query.py <query> [<query> ...]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.

For each query: warmed fresh-session timing (3 runs, min/median/max),
Spark job count per run (statusTracker on a per-query job group), and
the formatted physical plan written to plans/r12/<query>_profile.txt.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from magshield_data_pipeline_spark.session import get_spark, release_caches  # noqa: E402


def consume(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("magshield-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    # same warmup discipline as bench.py
    _, warm_spec = next(iter(QUERY_REGISTRY.items()))
    for _ in range(3):
        consume(warm_spec.fn(spark, sf_dir))
        release_caches(spark)

    plan_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    )
    os.makedirs(plan_dir, exist_ok=True)
    for name in names:
        spec = QUERY_REGISTRY[name]
        sc = spark.sparkContext
        runs = []
        jobs_per_run = []
        jobs_all_per_run = []
        for i in range(3):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            # total-submitted diff catches streaming-thread jobs the
            # thread-local group misses (ADVICE r12)
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            consume(df)
            dt = time.perf_counter() - t0
            runs.append((dt, t_build))
            jobs_per_run.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            jobs_all_per_run.append(sc._jsc.sc().dagScheduler().nextJobId() - j0)
            sc.setJobGroup(None, None)
            release_caches(spark)
        runs_sorted = sorted(r[0] for r in runs)
        build_sorted = sorted(r[1] for r in runs)
        print(
            f"{name}: total min/med/max = "
            f"{runs_sorted[0]:.2f}/{runs_sorted[1]:.2f}/{runs_sorted[2]:.2f} s; "
            f"fn() build med = {build_sorted[1]:.2f} s; "
            f"spark jobs/run = {jobs_per_run}; all-thread jobs/run = "
            f"{jobs_all_per_run}"
        )
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plan_dir, f"{name}_profile.txt"), "w") as f:
                f.write(plan)
        except Exception as e:  # eager-tier queries may not replan cheaply
            print(f"  (plan capture failed: {e})")
        release_caches(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
