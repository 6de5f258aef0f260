"""Data-quality constraint gates ([EXT] observability tier).

Production pipelines gate every load behind declarative row-level
constraints (the Great-Expectations / Deequ pattern): evaluate N rules
in ONE scan, report violation counts per rule, fail or quarantine on
thresholds. The reference applies its checks imperatively per record
(fail-loud retries — SURVEY §2.9 Q8); this is the set-based restatement
that audits a whole table at once.

Scale posture: all predicate rules fold into a single partial-aggregated
rollup — one scan, one ≤N-row exchange, regardless of table size.
Referential rules are anti-joins on the key (strategy left to
AQE/size estimates; neither side needs to broadcast). Reporting is
per-rule counts + exact integer ppm — never a row-level materialization
of violations (that's a separate quarantine write, done only for rules
that fail their threshold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def observe_metrics(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, "object"]:
    """Attach piggyback pipeline metrics to *df* via Spark's
    ``Observation`` API: the named aggregates are computed by the SAME
    action that consumes the frame — no second scan, no extra job.

    This is the engine-level restatement of the reference's imperative
    per-load bookkeeping (record counts / skip counters incremented in
    its fetch loops, e.g. the page tallies around
    /root/reference/modules/quote.py:81-95): at 100 TB a metrics pass
    that re-reads the input doubles the job, while an Observation rides
    the existing scan for free and is collected driver-side from the
    listener bus after the action completes.

    Returns ``(observed_df, observation)``; call ``observation.get``
    AFTER an action on a plan that consumes ``observed_df``.

    Constraint: observed metrics must be DISTINCT-free aggregates
    (Spark rejects ``count_distinct`` with INVALID_OBSERVED_METRICS);
    use ``approx_count_distinct`` — the mergeable-sketch form is what
    a listener-bus metric can compute in one pass anyway.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    named = [col.alias(alias) for alias, col in metrics.items()]
    return df.observe(obs, *named), obs


def violation(pred: Column) -> Column:
    """1 when the row VIOLATES *pred* — null predicates count as
    violations (a rule that cannot evaluate did not pass)."""
    return F.when(F.coalesce(pred, F.lit(False)), F.lit(0)).otherwise(F.lit(1))


def dq_violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations, n_rows) for every predicate rule, from ONE
    scan: the aggregate computes all rule sums + the row count in a
    single partial-aggregated rollup, then unpivots the 1-row result
    to long form (an explode over an N-element literal array — no
    second scan, no shuffle beyond the rollup's)."""
    if not rules:
        raise ValueError("dq_violation_counts: at least one rule required")
    aggs = [F.sum(violation(pred)).cast("long").alias(name) for name, pred in rules.items()]
    row = df.agg(*aggs, F.count(F.lit(1)).alias("n_rows"))
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(name).alias("n_violations"),
                )
                for name in rules
            ]
        )
    )
    return row.select(stacked.alias("r"), "n_rows").select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_violations").alias("n_violations"),
        "n_rows",
    )


def dq_fk_violations(
    child: DataFrame,
    key: str,
    parent: DataFrame,
    parent_key: str,
    rule_name: str,
) -> DataFrame:
    """(rule, n_violations, n_rows) for a referential rule: child rows
    whose *key* has no match in *parent* (null keys violate too — an
    unresolvable reference did not pass). ONE child scan: a left join
    against the distinct parent keys with a hit flag, then a single
    rollup counts rows and misses together (an anti-join plus a
    separate count would scan the child twice)."""
    keys = parent.select(F.col(parent_key).alias(key)).distinct().withColumn(
        "_hit", F.lit(1)
    )
    joined = child.select(key).join(keys, key, "left")
    return joined.agg(
        F.lit(rule_name).alias("rule"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def with_ppm(report: DataFrame) -> DataFrame:
    """Append exact integer parts-per-million: identical floor(x/y)
    arithmetic on identical integer-derived doubles in both engines
    (the key_skew_profile convention)."""
    return report.select(
        "rule",
        "n_violations",
        "n_rows",
        F.floor(F.col("n_violations") * 1000000 / F.col("n_rows"))
        .cast("long")
        .alias("violation_ppm"),
    )


def dq_quarantine(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Row-level companion to :func:`dq_violation_counts`: the input
    rows that violate ANY rule, tagged with a deterministic
    comma-joined ``failed_rules`` string (scalar, not array — sortable
    and hash-friendly). One scan, pure projection + filter: this is
    the frame a pipeline writes to the quarantine sink for rules over
    threshold, while clean rows continue downstream.

    Registry-query candidate for round 6 (kept pytest-only in r5 to
    hold the driver-window displacement debt flat)."""
    tags = F.array(
        *[
            F.when(violation(pred) == 1, F.lit(name))
            for name, pred in rules.items()
        ]
    )
    out = df.withColumn(
        "failed_rules",
        F.concat_ws(",", F.array_sort(F.filter(tags, lambda t: t.isNotNull()))),
    )
    return out.filter(F.col("failed_rules") != "")
