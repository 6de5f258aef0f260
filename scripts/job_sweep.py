"""One-pass sweep of the whole registry: wall seconds + Spark job
count per query (r12 optimization round).  Job counts are the
load-insensitive shape signal the round's methodology calls for —
walls on this box swing up to 3x with ambient load, job counts don't.

Methodology mirrors bench.py (chunked fresh sessions, same warmup),
but runs each query ONCE and records the statusTracker job count for
its job group.  Output: JSON {query: {"wall": s, "jobs": n}} to the
path in $SPARK_GRAFT_SWEEP_OUT (default /tmp/job_sweep.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from magshield_data_pipeline_spark.session import get_spark, release_caches  # noqa: E402


def consume(df):
    df.write.format("noop").mode("overwrite").save()


def fresh(sf_dir):
    spark = get_spark("magshield-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    _, warm = next(iter(QUERY_REGISTRY.items()))
    for _ in range(2):
        consume(warm.fn(spark, sf_dir))
        release_caches(spark)
    return spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ.get("SPARK_GRAFT_SWEEP_OUT", "/tmp/job_sweep.json")
    chunk = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "48")))
    spark = fresh(sf_dir)
    out: dict = {}
    for i, (name, spec) in enumerate(QUERY_REGISTRY.items()):
        if i and i % chunk == 0:
            spark.stop()
            spark = fresh(sf_dir)
        sc = spark.sparkContext
        group = f"sweep_{name}"
        sc.setJobGroup(group, name)
        # setJobGroup is thread-local, so jobs launched from streaming
        # execution threads (micro-batches) never land in the group
        # (ADVICE r12): ALSO diff the scheduler's next job id, which
        # counts every submitted job regardless of thread
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        consume(spec.fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        jobs_all = sc._jsc.sc().dagScheduler().nextJobId() - j0
        sc.setJobGroup(None, None)
        release_caches(spark)
        out[name] = {"wall": round(wall, 3), "jobs": jobs,
                     "jobs_all": jobs_all}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {len(out)} queries, "
          f"total wall {sum(v['wall'] for v in out.values()):.1f}s, "
          f"total jobs {sum(v['jobs'] for v in out.values())}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
