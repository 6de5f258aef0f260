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


_QUANTILES = [0.0, 0.25, 0.5, 0.9, 1.0]  # 0.0 = min, 1.0 = max

_PERCENTILE_SQL = f"""
WITH a AS (
    SELECT event_type,
           quantile_cont(CAST(value AS DOUBLE),
                         [{', '.join(f'{q}::DOUBLE' for q in _QUANTILES)}]) AS qv
    FROM events GROUP BY event_type
)
SELECT event_type,
       unnest([{', '.join(f'{q}::DOUBLE' for q in _QUANTILES)}]) AS quantile,
       round(unnest(qv), 4) AS qvalue
FROM a
"""


@register(
    "value_percentiles",
    sql=_PERCENTILE_SQL,
    description="exact interpolated percentiles (min/p25/p50/p90/max) per "
    "event type, one scalar row per quantile; at scale approx_percentile "
    "replaces the exact sort",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percentile() needs the group's values together (sort-based) — fine
    # per bounded group; the 100 TB path swaps in approx_percentile
    # (t-digest sketch, map-side mergeable) with the same plan shape.
    # Output is one row per (event_type, quantile) — scalar columns
    # only, so the result is canonicalizable (array<double> is not).
    events = read_table(spark, sf_dir, "events")
    qlits = F.array(*[F.lit(q) for q in _QUANTILES])
    agg = events.groupBy("event_type").agg(
        F.percentile("value", qlits).alias("qv")
    )
    return agg.select("event_type", F.posexplode("qv").alias("qi", "qraw")).select(
        "event_type",
        F.element_at(qlits, F.col("qi") + 1).alias("quantile"),
        F.round("qraw", 4).alias("qvalue"),
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
