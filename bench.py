"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is consumed through the noop sink so the measurement is engine
execution (scan → transform → exchange), not driver-side row serialization
— the same discipline you'd use benchmarking on a real cluster.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3); the headline
per-query number (and the total) is the MEDIAN.  The driver's stdout tail
capture is small (r3's ~7.5 KB line came back truncated/unparseable), so
the printed line is budgeted under ~1.9 KB: per-query keys are
deterministically abbreviated (each underscore token truncated to 3 chars
— verified collision-free across the registry at import) and min/median/max
spreads are NOT printed.  The full record — full query names, the
abbreviation map, and per-query min/median/max — is written to
BENCH_local.json in the repo root instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from magshield_data_pipeline_spark.session import get_spark, release_caches

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _abbrev(name: str) -> str:
    # separator-free keys: ~180 B headroom vs underscored (the map in
    # BENCH_local.json recovers full names; collisions fail loud at
    # import via _abbrev_map).  A token keeps its TRAILING DIGITS on
    # top of the 3-char stem — 'progressive' vs 'progressive420'
    # collided r9 (the guard caught it); cross-record comparisons
    # translate through each record's own abbrev map, so the scheme
    # change is safe
    def short(tok: str) -> str:
        m = re.match(r"^(.*?)(\d*)$", tok)
        return m.group(1)[:3] + m.group(2)

    return "".join(short(tok) for tok in name.split("_"))


def _abbrev_map(names) -> dict[str, str]:
    out = {n: _abbrev(n) for n in names}
    if len(set(out.values())) != len(out):
        raise RuntimeError("bench abbreviation collision — widen the token cap")
    return out


def _fresh_session(sf_dir: str):
    """A freshly warmed bench session.

    Two session-lifetime effects distort a one-session 197-query
    marathon (both measured in the r10 adjudication):

    - COLD START: accumulated JIT/C2 warmth is a smooth function of
      prior session execution — the same bm25 code reads 1.18 s as the
      first timed query and 0.43 s at position 115 (idle box,
      medians); a 10-run single-query curve decays 1.39 -> 0.81 s and
      keeps falling.  Three untimed real-query runs compress the
      steepest part of that curve.
    - ACCUMULATION: late in a 197-query single session, sub-second
      queries read 2-3x their fresh-session medians (embedding_pq_topk
      4.65 in-run vs 1.72 fresh; hilbert_layout_stats 4.06 vs 1.30) —
      codegen-class, listener and plan-cache buildup degrade the JVM
      long before OOM.

    Chunked sessions bound the second effect while the per-chunk
    warmup bounds the first; per-query numbers then compare
    round-over-round at like chunk positions instead of depending on
    global registry order.
    """
    spark = get_spark("magshield-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    _, warm_spec = next(iter(QUERY_REGISTRY.items()))
    for _ in range(3):
        consume(warm_spec.fn(spark, sf_dir))
        release_caches(spark)
    return spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    chunk = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "48")))
    # ambient-load provenance, sampled BEFORE the first session warmup —
    # sampling after it measures the bench's own warmup, not the box
    # (the r10/r11 records' start values were contaminated this way and
    # could never read below the 0.2 idle gate)
    load_start = os.getloadavg()
    spark = _fresh_session(sf_dir)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for i, (name, spec) in enumerate(QUERY_REGISTRY.items()):
        if i and i % chunk == 0:
            # bound session-lifetime accumulation (see _fresh_session)
            spark.stop()
            spark = _fresh_session(sf_dir)
        runs: list[float] = []
        for _ in range(n_runs):
            # the timer starts BEFORE plan construction: for lazy plans
            # that adds only milliseconds of DataFrame building, but the
            # eager tier (streaming AvailableNow runs, iterative
            # connected components) does its real work inside fn() —
            # timing only the final write would undercount them
            t0 = time.perf_counter()
            consume(spec.fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spread[name] = {"min": round(runs[0], 3), "max": round(runs[-1], 3)}
        # drop caller-owned persisted frames (LSH bucket/pair caches)
        # so a full chunk's queries don't accumulate cache entries;
        # within a query's own n_runs the cache still deduped by plan
        release_caches(spark)

    total = round(sum(timings.values()), 2)
    abbrev = _abbrev_map(timings)
    load_end = round(os.getloadavg()[0], 2)
    # self-describing conditions (VERDICT r10 "what's wrong" #1): a
    # record taken on a loaded box must SAY so at the top level — the
    # repo's own bench gate is loadavg < 0.2 at start, and BENCH_r10
    # (start 2.11) read +9.8% vs the committed idle record at identical
    # code; a naive reader of the JSON shouldn't have to know to check
    # loadavg_1m to avoid misreading ambient noise as a regression
    conditions = "idle" if load_start[0] < 0.2 else "degraded"

    # full record (full names + spreads) → committed repo file; smoke
    # runs at other SFs set $SPARK_GRAFT_BENCH_OUT so they never clobber
    # the committed clean-box sf0.1 record
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(_REPO_ROOT, "BENCH_local.json")
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "abbrev": abbrev,
                "runs_per_query": n_runs,
                "session_chunk": chunk,
                "warmup_query": next(iter(QUERY_REGISTRY)),
                "conditions": conditions,
                "loadavg_1m": {
                    "start": round(load_start[0], 2),
                    "end": load_end,
                },
                "sf": sf,
            },
            f,
            indent=1,
        )
        f.write("\n")

    # compact single line (≤ ~1.9 KB) → stdout for the driver's tail capture
    compact = {abbrev[n]: round(v, 2) for n, v in timings.items()}
    print(_compact_line(total, conditions, compact, sf))
    return 0


def _compact_line(total: float, conditions: str, compact: dict[str, float],
                  sf: float) -> str:
    """The one-line stdout JSON (unchanged driver contract); truncation
    to the slowest queries when the registry outgrows the ~1.9 KB tail
    capture is SELF-DESCRIBING: queries_total / queries_omitted /
    omitted_sum_sec let a reader reconcile the printed entries against
    the total without opening BENCH_local.json."""
    line = json.dumps(
        {
            "metric": "total_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "conditions": conditions,
            "queries": compact,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    if len(line) >= 1900:
        # the registry grew past what per-query abbreviation fits in the
        # driver's tail capture (r3 lost the whole line this way): fail
        # LOUD to stderr, and print a parseable totals+top-N line that
        # points at BENCH_local.json for the full record
        print(
            f"bench: compact line {len(line)} B >= 1900 B cap; "
            "emitting totals + slowest queries only (full record in "
            "BENCH_local.json)",
            file=sys.stderr,
        )
        # pack as many per-query entries as the budget allows (slowest
        # first — the ones a reader compares round-over-round), instead
        # of a fixed 40: ~16 B/entry means >90 of 129 usually fit
        ranked = sorted(compact.items(), key=lambda kv: kv[1], reverse=True)
        slowest: dict[str, float] = {}
        base = len(
            json.dumps(
                {
                    "metric": "total_query_wall_seconds",
                    "value": total,
                    "unit": "sec",
                    "conditions": conditions,
                    "queries": {},
                    "queries_truncated_to_slowest": 999,
                    "queries_total": len(compact),
                    "queries_omitted": 999,
                    "omitted_sum_sec": 99999.99,
                    "full_record": "BENCH_local.json",
                    "sf": sf,
                },
                separators=(",", ":"),
            )
        )
        budget = 1880 - base
        for k, v in ranked:
            # accurate incremental cost: "key":value plus a separating
            # comma — counting both braces would drop entries that fit
            cost = len(json.dumps(k)) + len(json.dumps(v)) + 2
            if budget - cost < 0:
                break
            budget -= cost
            slowest[k] = v
        # reconcilers need the truncation to be self-describing
        # (VERDICT r12 item 3: 22 sub-second queries were misread as
        # DROPPED because the printed line only carried the slowest):
        # how many entries were omitted and how much wall they sum to,
        # so printed + omitted == value without opening the full record
        line = json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "conditions": conditions,
                "queries": slowest,
                "queries_truncated_to_slowest": len(slowest),
                "queries_total": len(compact),
                "queries_omitted": len(compact) - len(slowest),
                "omitted_sum_sec": round(
                    sum(v for k, v in compact.items() if k not in slowest), 2
                ),
                "full_record": "BENCH_local.json",
                "sf": sf,
            },
            separators=(",", ":"),
        )
        assert len(line) < 1900, "bench line still over cap after truncation"
    return line


if __name__ == "__main__":
    sys.exit(main())
