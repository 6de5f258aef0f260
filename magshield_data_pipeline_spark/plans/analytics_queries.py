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


# ---------------------------------------------------------------------------
# Classic decorrelation shapes (r7): the remaining hard TPC-H patterns
# a warehouse engine must plan well — each is the standard rewrite of a
# correlated subquery into joins/aggregates Catalyst can optimize
# (broadcast dims, partial aggregation, semi/anti joins).  Q2/Q11/Q21
# landed in r6 (plans/ext_queries.py); these close the family:
# Q13 (outer-join count distribution), Q17 (correlated avg),
# Q18 (HAVING-filtered semi join), Q20 (nested semi-join chain),
# Q22 (scalar-subquery + anti join).

_Q13_SQL = """
WITH co AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY 1
"""


@register(
    "customer_order_distribution",
    sql=_Q13_SQL,
    description="TPC-H Q13 shape: customers LEFT-joined to a filtered "
    "orders fact (the join predicate carries the filter so zero-order "
    "customers survive with count 0), then a two-level aggregation "
    "into the order-count distribution. The outer join preserves the "
    "null-extension row; both aggregations partial-agg map-side "
    "(standard warehouse surface)",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    co = (
        customer.join(
            orders,
            (orders.o_custkey == customer.c_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q17_BRANDS = ("Brand#3", "Brand#13", "Brand#23")
_Q17_SQL = f"""
WITH lim AS (
    SELECT l_partkey, 0.2 * avg(l_quantity) AS qlim
    FROM lineitem GROUP BY 1
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small_lines,
       round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN lim ON lim.l_partkey = l.l_partkey
WHERE p.p_brand IN {_Q17_BRANDS!r} AND l.l_quantity < lim.qlim
GROUP BY 1
"""


@register(
    "small_quantity_part_revenue",
    sql=_Q17_SQL,
    description="TPC-H Q17 shape: the correlated per-part average-"
    "quantity subquery decorrelated into a grouped aggregate joined "
    "back to the fact; lines below 20% of their part's mean quantity "
    "feed a per-brand revenue rollup. Quantities are integer-valued "
    "doubles, so sum/count/0.2x are bit-identical across engines and "
    "the strict < threshold cannot flip; the brand dim filter "
    "broadcasts (standard warehouse surface)",
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    lim = lineitem.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qlim")
    )
    brands = part.filter(F.col("p_brand").isin(*_Q17_BRANDS)).select(
        "p_partkey", "p_brand"
    )
    return (
        lineitem.join(F.broadcast(brands), lineitem.l_partkey == brands.p_partkey)
        .join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qlim"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


_Q18_MIN_QTY = 300
_Q18_SQL = f"""
WITH big AS (
    SELECT l_orderkey, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {_Q18_MIN_QTY}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       round(o.o_totalprice, 2) AS total_price,
       CAST(big.sum_qty AS BIGINT) AS sum_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register(
    "large_order_customers",
    sql=_Q18_SQL,
    description=f"TPC-H Q18 shape: the HAVING-filtered groupBy over the "
    f"fact (orders totalling > {_Q18_MIN_QTY} units) joins back to "
    "orders and the customer dim — the group-filter-then-join pattern. "
    "The aggregate runs once over lineitem with map-side partial agg; "
    "the surviving key set is tiny, so AQE converts the orders join to "
    "broadcast at runtime; quantities are integer-valued doubles, cast "
    "long for a hash-stable output (standard warehouse surface)",
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


_Q20_PREFIX = "red"
_Q20_MIN_QTY = 100
_Q20_SQL = f"""
WITH red_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PREFIX}%'
),
heavy AS (
    SELECT l_suppkey
    FROM lineitem l JOIN red_parts rp ON rp.p_partkey = l.l_partkey
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > {_Q20_MIN_QTY}
)
SELECT s.s_suppkey, s.s_name, s.s_nationkey
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
"""


@register(
    "promo_part_suppliers",
    sql=_Q20_SQL,
    description=f"TPC-H Q20 shape: a nested semi-join chain — parts "
    f"named '{_Q20_PREFIX}%' select lineitem rows, a per-(supplier, "
    f"part) rollup keeps pairs shipping > {_Q20_MIN_QTY} units, and "
    "the surviving supplier keys semi-join the supplier dim (LEFT "
    "SEMI, so no fan-out duplication). The part key set broadcasts "
    "into the fact scan; the rollup partial-aggregates map-side "
    "(standard warehouse surface)",
)
def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    red_parts = part.filter(F.col("p_name").startswith(_Q20_PREFIX)).select(
        "p_partkey"
    )
    heavy = (
        lineitem.join(
            F.broadcast(red_parts), lineitem.l_partkey == red_parts.p_partkey
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q20_MIN_QTY)
        .select("l_suppkey")
    )
    return supplier.join(
        heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


_Q22_SQL = """
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
),
urgent AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT c.c_nationkey % 10 AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM urgent u WHERE u.o_custkey = c.c_custkey)
GROUP BY 1
"""


@register(
    "idle_customers_balance",
    sql=_Q22_SQL,
    description="TPC-H Q22 shape: the scalar average-balance subquery "
    "decorrelated into a single-row frame cross-joined (broadcast, "
    "1 row) onto customers, an anti join removes customers with any "
    "URGENT order, and the survivors roll up per derived country "
    "code. Balances carry 2 decimals, so the positive-side average is "
    "the same IEEE division of exact operands in both engines "
    "(standard warehouse surface)",
)
def idle_customers_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


_RANK_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(row_number() OVER w AS INT) AS rn
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register(
    "window_rank_suite",
    sql=_RANK_SQL,
    description="ranking-function suite over one window spec: ntile "
    "quartiles, percent_rank, cume_dist, row_number per market "
    "segment ordered by (balance, custkey) — a total order, so every "
    "rank is deterministic; percent_rank/cume_dist are single IEEE "
    "divisions of identical integer operands in both engines. One "
    "shuffle on the partition key serves all four functions "
    "(standard warehouse surface)",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.row_number().over(w).cast("int").alias("rn"),
    )


# ---------------------------------------------------------------------------
# Exact weighted median (late r7): the order-statistic the interpolated
# percentile family (value_percentiles) cannot express — smallest value
# whose cumulative weight reaches half the total. All comparisons are
# on exact integers (quantities are integer-valued doubles), so the
# pick is engine-exact with no interpolation contract.

_WMEDIAN_SQL = """
WITH w AS (
    SELECT l_returnflag, l_extendedprice, l_quantity,
           sum(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING
           ) AS cum,
           sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
    FROM lineitem
)
SELECT l_returnflag AS return_flag,
       round(min(l_extendedprice), 2) AS weighted_median,
       CAST(min(tot) AS BIGINT) AS total_weight
FROM w
WHERE 2 * cum >= tot
GROUP BY 1
"""


@register(
    "weighted_median_price",
    sql=_WMEDIAN_SQL,
    description="exact weighted median of extended price per return "
    "flag, weighted by quantity: cumulative-weight window over a "
    "total order (price, orderkey, linenumber), then the first row "
    "where 2*cum >= total — the qualifying set is a suffix of the "
    "order, so min(price) over it IS the weighted median. One shuffle "
    "on the flag serves both window sums; quantities are integer-"
    "valued doubles, so every comparison is exact (standard warehouse "
    "surface the interpolated-percentile family cannot express)",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = read_table(spark, sf_dir, "lineitem")
    order = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    cum = F.sum("l_quantity").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("l_quantity").over(Window.partitionBy("l_returnflag"))
    w = lineitem.select(
        "l_returnflag", "l_extendedprice",
        cum.alias("cum"), tot.alias("tot"),
    )
    return (
        w.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("weighted_median"),
            F.min("tot").cast("long").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (late r7): the privacy gate a training-data
# pipeline runs before publishing — quasi-identifier combinations
# shared by fewer than k records re-identify individuals (Sweeney
# 2002). Complements the PII-redaction tier (operators/text.py) with
# the structured-data half of the privacy story.

_K_ANON = 5

_K_ANON_SQL = f"""
SELECT c_nationkey AS nation_key,
       c_mktsegment AS segment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
       CAST(count(*) AS BIGINT) AS group_size
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < {_K_ANON}
"""


@register(
    "k_anonymity_violations",
    sql=_K_ANON_SQL,
    description=f"k-anonymity audit (k={_K_ANON}, Sweeney 2002): "
    "quasi-identifier groups (nation, segment, coarse balance band) "
    "with fewer than k members — each is a re-identification risk the "
    "pipeline must generalize or suppress before release. One partial-"
    "agg scan; the band edges are power-of-10 divisions of exact "
    "2-decimal values, so banding never straddles engines. The "
    "structured-data half of the privacy tier beside PII redaction "
    "([EXT] curation/privacy)",
)
def k_anonymity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    return (
        customer.groupBy(
            F.col("c_nationkey").alias("nation_key"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).alias("balance_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < _K_ANON)
    )


# ---------------------------------------------------------------------------
# Temperature-smoothed source mixing (late r7): the LLM data-mixing
# step (alpha=0.5 smoothing a la multilingual sampling: upweight tail
# sources, downweight heads). Made hash-exact with the repo's integer-
# quantization discipline: the smoothed weight sqrt(p_s)/Σ sqrt(p_t)
# equals sqrt(n_s)/Σ sqrt(n_t) (the 1/N cancels), and each sqrt(n) is
# quantized to the integer floor(sqrt(n)*1e6) BEFORE the cross-source
# sum — so the normalizer is an exact integer sum, never an order-
# dependent float fold. sqrt is IEEE exactly-rounded: identical
# operands => identical doubles in both engines.

_MIX_BUDGET = 10_000

_MIX_SQL = f"""
WITH counts AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
),
q AS (
    SELECT source, n_docs,
           CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
               AS q_sqrt
    FROM counts
),
t AS (SELECT *, CAST(sum(q_sqrt) OVER () AS BIGINT) AS q_total FROM q)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, q_sqrt,
       CAST(q_sqrt AS DOUBLE) / q_total AS weight,
       CAST(floor(CAST({_MIX_BUDGET} * q_sqrt AS DOUBLE) / q_total)
            AS BIGINT) AS expected_docs
FROM t
"""


@register(
    "temperature_mixture_weights",
    sql=_MIX_SQL,
    description=f"temperature-smoothed source mixing (alpha=0.5, the "
    "multilingual/LLM data-mixing rule: weight ∝ share^alpha — tails "
    "up, heads down): per-source doc counts roll up in one scan, each "
    "sqrt(n) is quantized to the integer floor(sqrt(n)*1e6) BEFORE "
    "the cross-source normalizer sum, so the normalizer is an exact "
    "integer sum (order-free) and the weights/expected counts for a "
    f"{_MIX_BUDGET}-doc budget are single IEEE divisions of identical "
    "operands — hash-exact with no float-fold contract ([EXT] "
    "curation/mixing, beside weighted_sample_per_source's E-S draw)",
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    q = counts.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000)
        .cast("long")
        .alias("q_sqrt"),
    )
    # the rollup is sources-sized (a handful of rows), so the
    # everything-window normalizer is a single tiny partition — the
    # integer sum is the point: no float fold across sources
    t = q.withColumn(
        "q_total", F.sum("q_sqrt").over(Window.partitionBy()).cast("long")
    )
    return t.select(
        "source",
        "n_docs",
        "q_sqrt",
        (F.col("q_sqrt").cast("double") / F.col("q_total")).alias("weight"),
        F.floor(
            (F.lit(_MIX_BUDGET) * F.col("q_sqrt")).cast("double")
            / F.col("q_total")
        )
        .cast("long")
        .alias("expected_docs"),
    )


# ---------------------------------------------------------------------------
# TPC-H breadth set (late r7): Q14/Q15/Q16/Q19 — the remaining classic
# shapes (conditional-share aggregate, scalar-max view equality,
# anti-join + count-distinct rollup, disjunctive multi-bracket join
# predicate). With Q2/Q11/Q21 (r6) and Q13/Q17/Q18/Q20/Q22 (late r7),
# every structurally-distinct TPC-H pattern now has a driver row.

_Q14_SQL = """
SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
       round(sum(CASE WHEN p.p_type = 'PROMO'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END), 4) AS promo_revenue,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1996-01-01'
GROUP BY 1
"""


@register(
    "promo_revenue_share",
    sql=_Q14_SQL,
    description="TPC-H Q14 shape: promo revenue vs total revenue per "
    "ship month — one conditional sum and one total sum in the SAME "
    "partial-agg pass (no second scan, no self-join); the share is the "
    "caller's division of the two 4-dec-rounded sums, kept as two "
    "columns per the rounded-sums-not-rounded-ratios discipline "
    "(standard warehouse surface)",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              lineitem.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)),
                4,
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
        )
    )


_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1995-04-01'
    GROUP BY 1
),
m AS (SELECT max(total_rev) AS max_rev FROM rev)
SELECT s.s_suppkey, s.s_name, rev.total_rev
FROM supplier s JOIN rev ON rev.l_suppkey = s.s_suppkey, m
WHERE rev.total_rev = m.max_rev
"""


@register(
    "top_supplier_revenue",
    sql=_Q15_SQL,
    description="TPC-H Q15 shape: the revenue view + scalar-max "
    "equality — per-supplier quarterly revenue rolls up once, its "
    "single-row max cross-joins back (broadcast, 1 row), and the "
    "supplier(s) AT the max join the dim. Revenue is rounded to 4 "
    "decimals BEFORE the max/equality, so the float comparison is on "
    "identical quantized values in both engines (standard warehouse "
    "surface)",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_rev")
        )
    )
    m = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        supplier.join(rev, supplier.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(m))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_rev")
    )


_Q16_SQL = """
WITH excluded AS (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 9, 14, 23, 36, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
GROUP BY 1, 2
"""


@register(
    "brand_supplier_counts",
    sql=_Q16_SQL,
    description="TPC-H Q16 shape: distinct-supplier counts per (brand, "
    "size) after an ANTI join removes an excluded supplier set "
    "(negative-balance suppliers standing in for the complaints "
    "blacklist) — NOT IN decorrelated to left_anti, the size filter "
    "broadcast into the fact, two-level distinct aggregation "
    "(standard warehouse surface)",
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    sized = part.filter(F.col("p_size").isin(1, 9, 14, 23, 36, 45)).select(
        "p_partkey", "p_brand", "p_size"
    )
    return (
        lineitem.join(F.broadcast(sized), lineitem.l_partkey == sized.p_partkey)
        .join(excluded, lineitem.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q19_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register(
    "disjunctive_bracket_revenue",
    sql=_Q19_SQL,
    description="TPC-H Q19 shape: an OR of three (brand, size-range, "
    "quantity-range) brackets across BOTH join sides — the disjunctive "
    "predicate the optimizer must keep as a join post-condition while "
    "still pushing the per-side implied filters; one aggregate row, "
    "revenue rounded to 4 decimals (standard warehouse surface)",
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        lineitem.l_partkey == part.p_partkey,
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(bracket).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit (r8): k-anonymity's necessary complement — a group
# can be large (k-anonymous) yet expose everyone in it when the
# SENSITIVE attribute barely varies inside the group (Machanavajjhala
# et al. 2007). Quasi-identifiers: (nation, segment); sensitive:
# coarse balance band.

_L_DIV = 5

_L_DIV_SQL = f"""
SELECT c_nationkey AS nation_key,
       c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
            AS BIGINT) AS n_sensitive
FROM customer
GROUP BY 1, 2
HAVING count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < {_L_DIV}
"""


@register(
    "l_diversity_violations",
    sql=_L_DIV_SQL,
    description=f"l-diversity audit (l={_L_DIV}, Machanavajjhala 2007): "
    "quasi-identifier groups whose SENSITIVE attribute (coarse balance "
    "band) takes fewer than l distinct values — groups k-anonymity "
    "passes but an attribute-disclosure attack still cracks; one "
    "partial-agg scan with a distinct-count, band edges exact "
    "power-of-10 divisions of 2-decimal money ([EXT] privacy tier, "
    "beside k_anonymity_violations)",
)
def l_diversity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: count_distinct over a coarse band (≤ a few dozen values
    # per group) — the partial-agg expands to (group, band) then
    # collapses; no window, no join.
    customer = read_table(spark, sf_dir, "customer")
    return (
        customer.groupBy(
            F.col("c_nationkey").alias("nation_key"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(
                F.floor(F.col("c_acctbal") / 1000)
            ).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < _L_DIV)
    )


# ---------------------------------------------------------------------------
# t-closeness audit (r9): the distribution-distance completion of the
# privacy family (PII r2, k-anonymity r7, l-diversity r8).  A group can
# be k-anonymous AND l-diverse yet still leak when its sensitive
# distribution DIFFERS sharply from the global one (Li et al., ICDE
# 2007) — skewness disclosure.  Distance = total variation (half-L1),
# kept EXACT by integer cross-multiplication:
#   TVD(g) > t  <=>  t_den * SUM_b |n_gb*N - N_b*n_g| > 2*t_num*n_g*N
# (every operand a BIGINT count — no float division anywhere, so the
# violating set is bit-identical across engines; at extreme corpus
# sizes the products approach int64 and a production build compares as
# DECIMAL(38)).
#
# Deliberate perturbation (teeth): sampling noise makes every group's
# TVD shrink like 1/sqrt(group size), so a fixed t cannot bite at all
# scale factors on clean data.  Nations with key % 5 == 0 therefore
# get their low balance bands (< 2) folded to 0 — a ~27% mass shift
# whose TVD converges to ~0.135 as groups grow, safely above
# t = 1/8 = 0.125: at sf0.1 the violating set is EXACTLY the 5 planted
# nations, at sf0.01 noise adds a further real tail (21 of 25 — 4
# clean groups provably pass).

_TCLOSE_T_NUM, _TCLOSE_T_DEN = 1, 8

_TCLOSE_SQL = f"""
WITH b AS (
    SELECT c_nationkey AS nation_key,
           CASE WHEN c_nationkey % 5 = 0
                     AND CAST(floor(c_acctbal / 1000) AS BIGINT) < 2
                THEN 0
                ELSE CAST(floor(c_acctbal / 1000) AS BIGINT) END AS band,
           CAST(count(*) AS BIGINT) AS n_gb
    FROM customer GROUP BY 1, 2
),
nb AS (SELECT band, CAST(sum(n_gb) AS BIGINT) AS n_b FROM b GROUP BY 1),
tot AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n_total FROM b),
j AS (
    SELECT b.nation_key, b.n_gb, nb.n_b, tot.n_total,
           CAST(sum(b.n_gb) OVER (PARTITION BY b.nation_key) AS BIGINT)
               AS n_g,
           CAST(sum(nb.n_b) OVER (PARTITION BY b.nation_key) AS BIGINT)
               AS nb_present
    FROM b JOIN nb USING (band), tot
),
g AS (
    SELECT nation_key,
           CAST(max(n_g) AS BIGINT) AS group_size,
           CAST(sum(abs(n_gb * n_total - n_b * n_g))
                + max(n_g) * (max(n_total) - max(nb_present))
                AS BIGINT) AS tvd_num,
           CAST(2 * max(n_g) * max(n_total) AS BIGINT) AS tvd_den
    FROM j GROUP BY 1
)
SELECT nation_key, group_size, tvd_num, tvd_den
FROM g
WHERE {_TCLOSE_T_DEN} * tvd_num > {_TCLOSE_T_NUM} * tvd_den
"""


@register(
    "t_closeness_violations",
    sql=_TCLOSE_SQL,
    description=f"t-closeness audit (t = {_TCLOSE_T_NUM}/{_TCLOSE_T_DEN}, "
    "Li et al. 2007): per-nation sensitive-band distributions whose "
    "total-variation distance from the global distribution exceeds t "
    "— the skewness-disclosure attack k-anonymity and l-diversity both "
    "miss; exact integer cross-multiplied TVD (absent bands folded in "
    "closed form), one fact scan + two rollups OF THE ROLLUP + a "
    "1-row total broadcast; low bands of nations with key % 5 == 0 "
    "deliberately folded so the violating set is provably non-trivial "
    "at every SF ([EXT] privacy tier, completing PII / k-anonymity / "
    "l-diversity)",
)
def t_closeness_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: ONE data-proportional stage — the (nation, band) partial-
    # agg rollup of the fact scan; everything downstream (global band
    # rollup, 1-row total, per-group window + final agg) operates on
    # the <= |nations| x |bands| rollup.  No UDFs, no joins against the
    # fact table, integer arithmetic end to end.
    from pyspark.sql.window import Window

    customer = read_table(spark, sf_dir, "customer")
    raw_band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    band = F.when(
        (F.col("c_nationkey") % 5 == 0) & (raw_band < 2), F.lit(0).cast("long")
    ).otherwise(raw_band)
    b = (
        customer.groupBy(
            F.col("c_nationkey").alias("nation_key"), band.alias("band")
        )
        .agg(F.count(F.lit(1)).alias("n_gb"))
        .persist()  # three rollup consumers; released by CacheManager
        # dedup across runs (documented caller-owned convention)
    )
    nb = b.groupBy("band").agg(F.sum("n_gb").alias("n_b"))
    tot = b.agg(F.sum("n_gb").alias("n_total"))
    w = Window.partitionBy("nation_key")
    j = (
        b.join(F.broadcast(nb), "band")
        .crossJoin(F.broadcast(tot))  # 1-row global count
        .withColumn("n_g", F.sum("n_gb").over(w))
        .withColumn("nb_present", F.sum("n_b").over(w))
    )
    g = j.groupBy("nation_key").agg(
        F.max("n_g").alias("group_size"),
        (
            F.sum(
                F.abs(
                    F.col("n_gb") * F.col("n_total")
                    - F.col("n_b") * F.col("n_g")
                )
            )
            + F.max("n_g") * (F.max("n_total") - F.max("nb_present"))
        ).alias("tvd_num"),
        (2 * F.max("n_g") * F.max("n_total")).alias("tvd_den"),
    )
    return g.filter(
        _TCLOSE_T_DEN * F.col("tvd_num") > _TCLOSE_T_NUM * F.col("tvd_den")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (r8): heterogeneous rollups in ONE pass — the report
# shape the reference builds by running one pandas groupby per sheet
# (report.py) and that CUBE (corpus_cube_summary) over-produces

_GSETS_SQL = """
SELECT o_orderpriority AS priority,
       o_orderstatus AS status,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


@register(
    "grouping_sets_rollup",
    sql=_GSETS_SQL,
    description="GROUPING SETS: per-priority, per-status, and grand-"
    "total rollups in ONE scan via DataFrame.groupingSets + "
    "grouping_id to disambiguate aggregation-null from data-null — "
    "the three per-sheet pandas groupbys of the reference's report "
    "builder (report.py) as one Expand + one exchange, vs CUBE's 2^n "
    "superset ([EXT] analytics surface)",
)
def grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: Expand replicates each input row once per grouping set
    # (3x here, vs 4x under CUBE) BEFORE the partial agg, so the
    # exchange still carries only group cells; one shuffle total.
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [[F.col("o_orderpriority")], [F.col("o_orderstatus")], []],
        F.col("o_orderpriority"),
        F.col("o_orderstatus"),
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        "gid", "n_orders", "revenue",
    )
