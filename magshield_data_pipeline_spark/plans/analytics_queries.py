"""Analytics extensions: ROLLUP subtotals, interpolated percentiles,
PIVOT re-shaping — standard warehouse surface the reference never
needed (its only aggregations are collect_list/count/dedup, SURVEY
§2.6) but a complete engine must offer.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.plans.registry import register
from magshield_data_pipeline_spark.sources.parquet import read_table

_ROLLUP_SQL = """
SELECT
    coalesce(l_returnflag, '(all)') AS return_flag,
    coalesce(l_linestatus, '(all)') AS line_status,
    GROUPING(l_returnflag, l_linestatus) AS gid,
    round(sum(l_quantity), 2) AS sum_qty,
    count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register(
    "rollup_summary",
    sql=_ROLLUP_SQL,
    description="ROLLUP subtotal hierarchy with grouping ids (flag, "
    "flag+status, grand total)",
)
def rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: rollup compiles to a single expand + aggregate — one
    # shuffle; partial aggregation still applies per grouping set.
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("return_flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("line_status"),
            "gid",
            "sum_qty",
            "n_rows",
        )
    )


_PERCENTILE_SQL = """
SELECT
    event_type,
    [round(x, 4) for x in quantile_cont(CAST(value AS DOUBLE), [0.25, 0.5, 0.9])] AS value_quantiles,
    round(min(value), 4) AS v_min,
    round(max(value), 4) AS v_max
FROM events
GROUP BY event_type
"""


@register(
    "value_percentiles",
    sql=_PERCENTILE_SQL,
    description="exact interpolated percentiles (p25/p50/p90) per event "
    "type; at scale approx_percentile replaces the exact sort",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percentile() needs the group's values together (sort-based) — fine
    # per bounded group; the 100 TB path swaps in approx_percentile
    # (t-digest sketch, map-side mergeable) with the same plan shape.
    events = read_table(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)))
    return events.groupBy("event_type").agg(
        F.transform(pcts, lambda x: F.round(x, 4)).alias("value_quantiles"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_SQL = f"""
SELECT
    user_id,
    {', '.join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


@register(
    "event_type_pivot",
    sql=_PIVOT_SQL,
    description="PIVOT: one column per event type, counts per user (the "
    "relational dual of the link-dispatch re-pivot, P8)",
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit pivot values skip the extra distinct-values job and keep
    # the output schema static — required for the oracle and the right
    # call at scale (never let pivot() scan for its column set).
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# UDAF surface — vectorized pandas grouped-agg UDF (the reference has no
# UDAF at all, SURVEY §2.10; this is the Arrow-batched escape hatch for
# aggregates Spark lacks, here median absolute deviation)

_MAD_SQL = """
SELECT event_type,
       round(mad(value), 6) AS value_mad,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


@register(
    "value_mad_per_type",
    sql=_MAD_SQL,
    description="custom UDAF: median absolute deviation per event type via a "
    "vectorized pandas grouped-agg UDF (Arrow batches, not per-row Python); "
    "oracle = DuckDB mad()",
)
def value_mad_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-agg pandas UDFs receive each group's column as ONE Arrow
    # batch — fine for bounded groups like per-type events; an unbounded
    # 100 TB group would need a sketch (e.g. approx quantiles) instead.
    # The UDF body is self-contained (local import, no module refs).
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _mad(v: pd.Series) -> float:
        import numpy as np

        a = v.to_numpy(dtype="float64")
        return float(np.median(np.abs(a - np.median(a))))

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg —
    # the row count rides along as a second vectorized UDAF
    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(_mad("value"), 6).alias("value_mad"),
        _n("value").alias("n_events"),
    )
