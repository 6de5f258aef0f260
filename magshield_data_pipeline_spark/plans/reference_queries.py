"""Reference-surface queries (SURVEY §2.1–2.9) on the test star schema.

Each query re-expresses one reference operator pattern as declarative
DataFrame code. Scale notes are attached per query: which joins
broadcast, where the (only) shuffles are, and why the plan survives a
100×/1000× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.functions import scalars as S
from magshield_data_pipeline_spark.plans.registry import register
from magshield_data_pipeline_spark.sources.parquet import read_table


# ---------------------------------------------------------------------------
# P2 + A4 — pure scan / wide projection / full-row dedup
# (users export — /root/reference/modules/users.py:113-142)


@register(
    "users_projection_dedup",
    sql="""
    SELECT DISTINCT
        c_custkey    AS user_id,
        c_name       AS user_name,
        c_mktsegment AS segment,
        c_nationkey  AS nation_id
    FROM customer
    """,
    description="scan → wide projection+rename → full-row dedup (P2, A4)",
)
def users_projection_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: dedup is the only exchange; it hash-partitions on all output
    # columns — exactly what dropDuplicates compiles to. Column pruning
    # reaches the parquet scan (only 4 of 5 columns read).
    customer = read_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation_id"),
    ).dropDuplicates()


# ---------------------------------------------------------------------------
# J1–J3 + P3/P4 + F2 + F6 — broadcast left-join enrichment
# (quote export — /root/reference/modules/quote.py:104-233)


@register(
    "quote_enrichment",
    sql="""
    SELECT
        o.o_orderkey                                   AS quote_id,
        o.o_orderstatus                                AS status,
        COALESCE(c.c_name, '')                         AS customer_name,
        COALESCE(n.n_name, '')                         AS nation,
        COALESCE(r.r_name, '')                         AS region,
        concat_ws(';', CAST(c.c_custkey AS VARCHAR), c.c_name) AS customer_key,
        strftime(o.o_orderdate, '%d-%b-%y %-I:%M %p')  AS created_fmt,
        round(o.o_totalprice, 2)                       AS total
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey  = c.c_custkey
    LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region   r ON n.n_regionkey = r.r_regionkey
    """,
    description="broadcast left-join enrichment + coalesce defaults + "
    "date/key formatting (J1-J3, P3/P4, F2, F6)",
)
def quote_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference realizes these joins as in-memory dicts probed per row
    # (quote.py:104-131). Spark-first: broadcast the bounded dims
    # (nation/region) so those joins are exchange-free. Customer is
    # fact-proportional (150k × sf — it grows with the data), so it gets
    # NO broadcast hint: at test SFs the size check broadcasts it anyway,
    # and at 100 TB AQE picks sort-merge instead of OOMing the executors.
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            F.col("o_orderkey").alias("quote_id"),
            F.col("o_orderstatus").alias("status"),
            S.coalesce_str("c_name").alias("customer_name"),
            S.coalesce_str("n_name").alias("nation"),
            S.coalesce_str("r_name").alias("region"),
            S.composite_key("c_custkey", "c_name").alias("customer_key"),
            F.date_format("o_orderdate", "dd-MMM-yy h:mm a").alias("created_fmt"),
            F.round("o_totalprice", 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# F9/A2 — conditional counts (organisation export's linked-contact count —
# /root/reference/modules/organisation.py:124)


@register(
    "conditional_counts",
    sql="""
    SELECT
        c.c_custkey AS customer_id,
        count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END)          AS finished_orders,
        count(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_orders,
        count(o.o_orderkey)                                        AS total_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    description="conditional count per group (F9/A2 re-expressed relationally)",
)
def conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference counts matching entries inside a nested LINKS array;
    # relationally that's count(CASE WHEN ...) after the fact join. Scale:
    # partial aggregation (map-side combine) runs before the single
    # shuffle on c_custkey; AQE coalesces post-shuffle partitions.
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("customer_id"))
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_orders"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
                "urgent_orders"
            ),
            F.count("o_orderkey").alias("total_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J7/J8 — fan-out join preserving zero-match rows
# (opportunity × products — /root/reference/modules/opportunity.py:163-173,239-243)


@register(
    "order_part_fanout",
    sql="""
    SELECT
        o.o_orderkey  AS order_id,
        o.o_orderstatus AS status,
        l.l_partkey   AS part_id
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
    description="fan-out join: one row per matched item, zero matches → one "
    "row with null part (J7+J8, collect_list + explode_outer)",
)
def order_part_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference builds a per-order product list then fans out one row
    # per product (J7+J8); relationally that is exactly a plain left join,
    # and the join is the scale-safe shape: a single sort-merge shuffle on
    # the join key that AQE can skew-split, with no unbounded
    # collect_list array on hot orders. (An earlier revision kept the
    # collect_list+explode_outer intermediate; it was one extra
    # aggregation stage with a skew hazard AQE cannot split.)
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderstatus").alias("status"),
            F.col("l_partkey").alias("part_id"),
        )
    )


# ---------------------------------------------------------------------------
# Q5 — order-sensitive last-wins fold
# (task link resolution — /root/reference/modules/task.py:223-246)


@register(
    "last_wins_fold",
    sql="""
    WITH ranked AS (
        SELECT
            l_orderkey, l_partkey, l_suppkey,
            row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC
            ) AS rn,
            max(l_linenumber) OVER (PARTITION BY l_orderkey) AS last_line
        FROM lineitem
    )
    SELECT
        l_orderkey AS order_id,
        l_partkey  AS last_part_id,
        l_suppkey  AS last_supp_id,
        last_line
    FROM ranked WHERE rn = 1
    """,
    description="order-sensitive last-wins fold over a per-entity sequence "
    "(Q5) via max over a lexicographic struct key",
)
def last_wins_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference folds a LINKS array where later entries overwrite
    # earlier ones. Relationally: the lexicographic max of the
    # (l_linenumber, l_partkey, l_suppkey) struct IS the winner — the
    # key fields are exactly the output fields, so one max(struct)
    # replaces three max_by/max aggregates (measured ~40% faster at
    # sf0.1, results bit-identical). The struct key is correct at every
    # SF, unlike a packed-integer key: at SF 1e5 (~100 TB) partkey
    # needs 11 digits and suppkey 10, which no 19-digit BIGINT packing
    # can hold without silent overflow. The test data has duplicate
    # (l_linenumber, l_partkey) pairs per order, so l_suppkey extends
    # the key to a total order (deterministic under the driver's hash).
    # Scale: ONE shuffle, and partial aggregation is retained (the plan
    # shows partial_max before the exchange); the struct buffer does
    # force SortAggregate instead of hash aggregation — that sort is
    # the price of an overflow-safe key, paid per map task, and the
    # single-aggregate form keeps the sorted buffer minimal.
    lineitem = read_table(spark, sf_dir, "lineitem")
    pos = F.struct("l_linenumber", "l_partkey", "l_suppkey")
    return (
        lineitem.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(F.max(pos).alias("w"))
        .select(
            "order_id",
            F.col("w.l_partkey").alias("last_part_id"),
            F.col("w.l_suppkey").alias("last_supp_id"),
            F.col("w.l_linenumber").alias("last_line"),
        )
    )


# ---------------------------------------------------------------------------
# S5/O1/O2 — filter + sort + limit scan (mail ingest —
# /root/reference/modules/opportunity_stage.py:131-165)


@register(
    "mail_scan_topn",
    sql="""
    SELECT
        event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        user_id,
        event_type,
        round(value, 2) AS value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' AND event_type = 'signup'
    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC
    LIMIT 5
    """,
    description="server-side predicate + ORDER BY ... DESC LIMIT n scan "
    "(S5, O1, O2) with total-order tiebreak",
)
def mail_scan_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark compiles orderBy().limit(n) to TakeOrderedAndProject — a
    # per-partition top-n + driver merge, no full sort, no shuffle of the
    # losing rows. The predicate pushes to the parquet scan. This is the
    # 100 TB-safe shape for "latest n" queries. The oracle orders by
    # ts truncated to microseconds so both engines sort the same key —
    # Spark reads the nanosecond parquet column floored to µs
    # (sources/parquet.py) while DuckDB may keep full ns precision.
    events = read_table(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
            & (F.col("event_type") == "signup")
        )
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(5)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# J11 — multi-hop dimension chain + aggregation (task→opp→org 2-hop —
# /root/reference/modules/task.py:198-201,233-237; TPC-H Q5 shape)


@register(
    "multi_hop_revenue",
    sql="""
    SELECT
        n.n_name AS nation,
        r.r_name AS region,
        round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
        count(*) AS line_count
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey  = o.o_orderkey
    JOIN customer c ON o.o_custkey   = c.c_custkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    description="multi-hop join chain through 4 dims + grouped revenue agg "
    "(J11 generalized; TPC-H Q5 shape)",
)
def multi_hop_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: nation/region broadcast (bounded dims); lineitem⋈orders is
    # the one real shuffle (both sides huge at 100 TB — sort-merge with
    # AQE). Customer is fact-proportional, so no forced broadcast — the
    # planner broadcasts it while it fits and falls back to sort-merge
    # beyond the threshold. Join order: facts first, dims late, so
    # Catalyst pushes the dim attributes through instead of widening the
    # fact early.
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A5-adjacent — grouped aggregation suite (TPC-H Q1 shape; exercises
# sum/avg/count with map-side partial aggregation)


@register(
    "pricing_summary",
    sql="""
    SELECT
        l_returnflag AS return_flag,
        l_linestatus AS line_status,
        round(sum(l_quantity), 2)      AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        round(avg(l_quantity), 2)      AS avg_qty,
        round(avg(l_discount), 4)      AS avg_disc,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="grouped sum/avg/count with pushed filter (TPC-H Q1 shape)",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: filter pushes to parquet (row-group pruning on l_shipdate
    # min/max); partial agg collapses 60k→(flag,status) groups map-side,
    # so the shuffle moves only a handful of rows per task.
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# F2/F3/F4 — date formatting with parse-or-passthrough fallback


@register(
    "date_format_suite",
    sql="""
    SELECT
        o_orderkey AS order_id,
        COALESCE(strftime(try_strptime(iso, '%Y-%m-%d %H:%M:%S'), '%d-%b-%y %-I:%M %p'), iso) AS quote_fmt,
        COALESCE(strftime(try_strptime(iso, '%Y-%m-%d %H:%M:%S'), '%m/%d/%Y'), iso)           AS date_only_fmt,
        COALESCE(strftime(try_strptime(split_part(iso, ' ', 1), '%Y-%m-%d'), '%d/%m/%Y'), iso) AS ui_fmt,
        COALESCE(strftime(try_strptime(o_orderpriority, '%Y-%m-%d %H:%M:%S'), '%d-%b-%y %-I:%M %p'), o_orderpriority) AS fallback_passthrough
    FROM (SELECT o_orderkey, o_orderpriority, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso FROM orders)
    """,
    description="F2/F3/F4 date reformat with parse-failure passthrough "
    "(quote.py:175-182, task.py:109-116, invoice.py:137-145)",
)
def date_format_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("iso"),
    )
    return src.select(
        F.col("o_orderkey").alias("order_id"),
        S.format_date_quote("iso").alias("quote_fmt"),
        S.format_date_only("iso").alias("date_only_fmt"),
        S.format_date_ui("iso").alias("ui_fmt"),
        # a non-date string goes through unchanged — the reference's
        # except-branch behavior
        S.format_date_quote("o_orderpriority").alias("fallback_passthrough"),
    )


# ---------------------------------------------------------------------------
# F1/F5/F6/F7/F10/F14 — string/key/encoding function suite


@register(
    "string_function_suite",
    sql="""
    SELECT
        s.s_suppkey AS supplier_id,
        trim(regexp_replace(s.s_name, '[\\r\\n]', ' ', 'g'))  AS clean_name,
        trim(concat_ws(' ', COALESCE(s.s_name, ''), COALESCE(n.n_name, ''))) AS full_label,
        concat_ws(';', CAST(s.s_suppkey AS VARCHAR), s.s_name) AS supp_key,
        split_part(concat_ws(';', CAST(s.s_suppkey AS VARCHAR), s.s_name), ';', 2) AS name_back,
        concat_ws('||', s.s_name, CAST(s.s_suppkey AS VARCHAR), n.n_name) AS owner_site_key,
        'u!' || replace(replace(regexp_replace(base64(CAST(s.s_name AS BLOB)), '=+$', ''), '/', '_'), '+', '-') AS share_token,
        regexp_extract('/tmp/exports/' || s.s_name || '.xlsx', '([^/]+)$', 1) AS file_basename,
        array_to_string(list_filter([s.s_name, '', n.n_name], x -> x IS NOT NULL AND x != ''), ' and ') AS joined_nonempty,
        regexp_extract('<a href="https://ex.example/dl?url=rep%20' || CAST(s.s_suppkey AS VARCHAR) || '.csv">Download Report</a>',
                       '<a[^>]*href="([^"]*)"[^>]*>[^<]*Download Report', 1) AS report_href,
        replace(regexp_extract('<a href="https://ex.example/dl?url=rep%20' || CAST(s.s_suppkey AS VARCHAR) || '.csv">Download Report</a>',
                       '[?&]url=([^"&]*)', 1), '%20', ' ') AS report_url
    FROM supplier s
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    description="scalar function library: clean_text, full-name concat, "
    "composite key, split-part, share token, basename, non-empty array "
    "join, HTML href extract, URL query decode "
    "(F1,F5,F6,F7,F8,F10,F11,F12,F14)",
)
def string_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    supp_key = S.composite_key("s_suppkey", "s_name")
    # a synthetic report-mail anchor per supplier exercises F11/F12 on an
    # oracle-checkable surface (the real pipeline runs them in
    # sources/reports.py)
    html = F.concat(
        F.lit('<a href="https://ex.example/dl?url=rep%20'),
        F.col("s_suppkey").cast("string"),
        F.lit('.csv">Download Report</a>'),
    )
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey, "left")
        .select(
            F.col("s_suppkey").alias("supplier_id"),
            S.clean_text("s_name").alias("clean_name"),
            S.full_name("s_name", "n_name").alias("full_label"),
            supp_key.alias("supp_key"),
            S.split_part(supp_key, ";", 1).alias("name_back"),
            S.org_owner_site_key("s_name", "s_suppkey", "n_name").alias("owner_site_key"),
            S.share_token("s_name").alias("share_token"),
            S.basename(F.concat(F.lit("/tmp/exports/"), F.col("s_name"), F.lit(".xlsx"))).alias(
                "file_basename"
            ),
            S.join_nonempty(F.array("s_name", F.lit(""), "n_name")).alias("joined_nonempty"),
            S.extract_download_href(html).alias("report_href"),
            S.url_query_param(S.extract_download_href(html), "url").alias("report_url"),
        )
    )


# ---------------------------------------------------------------------------
# [EXT-adjacent] window tier — running total (the reference's commented-out
# "Cumulative Active Focus Org", /root/reference/modules/organisation.py:142)


@register(
    "running_total_window",
    sql="""
    SELECT
        o_custkey  AS customer_id,
        o_orderkey AS order_id,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ), 2) AS running_total
    FROM orders
    """,
    description="per-key running total window (SURVEY §2.6 [EXT]-adjacent)",
)
def running_total_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # Scale: one shuffle on o_custkey, per-partition sort — no global
    # sort. Skewed customers are bounded (orders per customer ≪ partition
    # size at any SF).
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "topk_per_group",
    sql="""
    SELECT customer_id, order_id, rank, round(total, 2) AS total
    FROM (
        SELECT
            o_custkey  AS customer_id,
            o_orderkey AS order_id,
            o_totalprice AS total,
            row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey DESC
            ) AS rank
        FROM orders
    )
    WHERE rank <= 3
    """,
    description="top-k per group via ranking window with total-order tiebreak",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
        .select("customer_id", "order_id", "rank", F.round("total", 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# J12 — semi-join reduction (task.py:141-180's "fetch only referenced dim
# rows") and its anti-join dual


@register(
    "semi_join_pushdown",
    sql="""
    SELECT l_orderkey AS order_id, l_partkey AS part_id, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
    """,
    description="left-semi join: scan rows whose key appears in a filtered "
    "driving set (J12 semi-join pushdown)",
)
def semi_join_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference collects distinct IDs and issues IN-batched fetches;
    # Spark-first this is a left-semi broadcast join: the filtered order
    # keys broadcast as a runtime filter against the lineitem scan —
    # the same reduction, without driver-side key collection.
    lineitem = read_table(spark, sf_dir, "lineitem")
    big_orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    return (
        lineitem.join(
            F.broadcast(big_orders), lineitem.l_orderkey == big_orders.o_orderkey, "left_semi"
        )
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("part_id"),
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


@register(
    "anti_join_orphans",
    sql="""
    SELECT c_custkey AS customer_id, c_name AS customer_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    description="left-anti join: entities with no matching fact rows",
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    urgent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
        )
    )


# ---------------------------------------------------------------------------
# U1/U2 + A4 — union of scans + dedup (page-fetch union —
# /root/reference/modules/quote.py:92, task.py:98-101)


@register(
    "union_dedup",
    sql="""
    SELECT o_orderkey AS order_id, o_orderpriority AS priority, round(o_totalprice, 2) AS total
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey AS order_id, o_orderpriority AS priority, round(o_totalprice, 2) AS total
    FROM orders WHERE o_totalprice > 450000
    """,
    description="union of two scans + full-row dedup (U1/U2 + A4) — the "
    "guard against page-overlap double reads",
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    proj = lambda df: df.select(  # noqa: E731
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        F.round("o_totalprice", 2).alias("total"),
    )
    urgent = proj(orders.filter(F.col("o_orderpriority") == "1-URGENT"))
    big = proj(orders.filter(F.col("o_totalprice") > 450000))
    return urgent.unionByName(big).dropDuplicates()


@register(
    "buyer_cohort_set_ops",
    sql="""
    SELECT 'retained' AS cohort, custkey FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE year(o_orderdate) = 1997
    )
    UNION ALL
    SELECT 'churned' AS cohort, custkey FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE year(o_orderdate) = 1997
    )
    """,
    description="native INTERSECT / EXCEPT set operators: 1996-to-1997 "
    "buyer retention and churn cohorts from two filtered key scans — the "
    "set-op completion of the union family (U1/U2); Catalyst compiles both "
    "to aggregated semi/anti joins, so the cost is the same keyed shuffle "
    "a hand-written join would pay",
)
def buyer_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: each side is DISTINCT-reduced (partial agg) BEFORE the
    # set op, so the semi/anti shuffle carries unique keys, not order
    # volume; both cohorts reuse the same two one-column scans and the
    # column-pruned fact read is year-filterable at the parquet footer.
    orders = read_table(spark, sf_dir, "orders")
    keys = lambda yr: (  # noqa: E731
        orders.filter(F.year("o_orderdate") == yr)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    y96, y97 = keys(1996), keys(1997)
    retained = y96.intersect(y97).select(
        F.lit("retained").alias("cohort"), "custkey"
    )
    churned = y96.subtract(y97).select(
        F.lit("churned").alias("cohort"), "custkey"
    )
    return retained.unionByName(churned)


# ---------------------------------------------------------------------------
# S3/A5 — metadata count probe (the reference's X-Total-Count header read —
# /root/reference/modules/opportunity.py:70-76)


@register(
    "count_probe",
    sql="""
    SELECT
        (SELECT count(*) FROM orders)   AS n_orders,
        (SELECT count(*) FROM lineitem) AS n_lineitem,
        (SELECT count(*) FROM customer) AS n_customers
    """,
    description="metadata-only table counts (S3 count probe / A5 pagination "
    "count): Spark answers count(*) from parquet row-group stats",
)
def count_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: count(*) over parquet is answered from footer statistics —
    # no column data read; the same metadata shortcut as the reference's
    # X-Total-Count probe, but per row group and distributed.
    counts = [
        read_table(spark, sf_dir, t)
        .groupBy()
        .agg(F.count("*").alias(f"n_{alias}"))
        for t, alias in (("orders", "orders"), ("lineitem", "lineitem"), ("customer", "customers"))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


# ---------------------------------------------------------------------------
# J4/J13 — the same dim joined under multiple roles (orgs probed with three
# different keys — /root/reference/modules/opportunity.py:128,206,208,229;
# invoice.py:108-120). TPC-H Q7 shape: nation as supplier-role and
# customer-role simultaneously.


NATION_FLOW_JOIN_SQL = """FROM lineitem l
    JOIN orders   o  ON l.l_orderkey  = o.o_orderkey
    JOIN customer c  ON o.o_custkey   = c.c_custkey
    JOIN supplier s  ON l.l_suppkey   = s.s_suppkey
    JOIN nation   n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation   n2 ON c.c_nationkey = n2.n_nationkey"""


def nation_flow_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, l_extendedprice, l_discount): the supplier-nation →
    customer-nation trade fact — the ONE definition of the 5-join edge
    derivation shared by the Q7 rollup (nation_pair_flows), PageRank
    and triangle counting; a role swap fixed here propagates to every
    consumer and its SQL twin (NATION_FLOW_JOIN_SQL). Scale: both
    nation copies broadcast (bounded dim); lineitem⋈orders is the one
    real shuffle."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("src")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("dst")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
        .select("src", "dst", "l_extendedprice", "l_discount")
    )


@register(
    "nation_pair_flows",
    sql="""
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
        count(*) AS n_flows
    FROM lineitem l
    JOIN orders   o  ON l.l_orderkey  = o.o_orderkey
    JOIN customer c  ON o.o_custkey   = c.c_custkey
    JOIN supplier s  ON l.l_suppkey   = s.s_suppkey
    JOIN nation   n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation   n2 ON c.c_nationkey = n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
    """,
    description="one dim joined under two roles (supplier nation vs customer "
    "nation) with aliased broadcast copies (J4/J13; TPC-H Q7 shape)",
)
def nation_pair_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale notes live on nation_flow_frame (the shared derivation).
    return (
        nation_flow_frame(spark, sf_dir)
        .groupBy(
            F.col("src").alias("supp_nation"),
            F.col("dst").alias("cust_nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_flows"),
        )
    )


# ---------------------------------------------------------------------------
# F13 — JSON field access on a JSON-string column (quote.py:110 consumes
# point-lookup JSON payloads)


@register(
    "json_props_extract",
    sql="""
    SELECT
        event_id,
        event_type,
        -- integral-only: DuckDB TRY_CAST rounds '12.5' to 13 where Spark
        -- try_cast nulls it; the regexp guard pins one shared semantics
        TRY_CAST(nullif(regexp_extract(trim(json_extract_string(props, '$.k')),
                                       '^-?[0-9]+$'), '') AS BIGINT) AS k_val
    FROM events
    """,
    description="JSON field access over a JSON-string column (F13, "
    "get_json_object)",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure projection; get_json_object evaluates JVM-side per row with
    # no shuffle introduced.
    events = read_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        S.json_get("props", "$.k").try_cast("bigint").alias("k_val"),
    )


# ---------------------------------------------------------------------------
# J4 + J13 — the same dim joined under THREE aliased roles, with a
# struct payload projected per role (invoice.py:101-120 joins the
# organisation dim as billing/shipping/owner; opportunity.py:128 probes
# the users dim at 206/208/229). Nation⋈region plays the struct-payload
# dim; the three FKs are customer nation, supplier nation, and a
# derived "origin" key.


@register(
    "three_role_nation_join",
    sql="""
    WITH dim AS (
        SELECT n_nationkey, n_name AS NAME, r_name AS REGION
        FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT
        cust.NAME   AS cust_nation,   cust.REGION   AS cust_region,
        supp.NAME   AS supp_nation,   supp.REGION   AS supp_region,
        origin.NAME AS origin_nation, origin.REGION AS origin_region,
        count(*) AS line_count,
        round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN dim cust   ON c.c_nationkey = cust.n_nationkey
    JOIN dim supp   ON s.s_nationkey = supp.n_nationkey
    JOIN dim origin ON l.l_partkey % 25 = origin.n_nationkey
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
    description="same struct-payload dim joined under three aliased roles "
    "(customer/supplier/origin nation) + grouped rollup (J4, J13)",
)
def three_role_nation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The dim is built ONCE (nation⋈region, both bounded) with its
    # payload as a struct column, then broadcast under three aliases —
    # three map-side hash joins, no extra exchange per role. The real
    # shuffles are lineitem⋈orders and the final groupBy; customer and
    # supplier are fact-proportional, so no forced broadcast (AQE
    # chooses while they fit).
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    dim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(
        "n_nationkey",
        F.struct(
            F.col("n_name").alias("NAME"), F.col("r_name").alias("REGION")
        ).alias("payload"),
    )

    def role(alias: str) -> DataFrame:
        return dim.select(
            F.col("n_nationkey").alias(f"{alias}_key"),
            F.col("payload").alias(alias),
        )

    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(role("cust")), F.col("c_nationkey") == F.col("cust_key"))
        .join(F.broadcast(role("supp")), F.col("s_nationkey") == F.col("supp_key"))
        .join(
            F.broadcast(role("origin")),
            F.col("l_partkey") % 25 == F.col("origin_key"),
        )
    )
    return joined.groupBy(
        F.col("cust.NAME").alias("cust_nation"),
        F.col("cust.REGION").alias("cust_region"),
        F.col("supp.NAME").alias("supp_nation"),
        F.col("supp.REGION").alias("supp_region"),
        F.col("origin.NAME").alias("origin_nation"),
        F.col("origin.REGION").alias("origin_region"),
    ).agg(
        F.count("*").alias("line_count"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# S1-S4 under the driver — the paged Python DataSource as a registered
# query: the same rows the parquet oracle sees, but read through
# page-partitioned scan + count probe + filter pushdown
# (sources/paged.py; reference scan contract quote.py:75-99,
# opportunity.py:65-89, task.py:79-104)


def _customer_jsonl(sf_dir: str) -> str:
    """Materialize (once per testdata file) the JSON-lines test double
    for the paginated HTTP API — the "server side", driver-local and
    tiny, shared by the batch paged scan and the incremental stream."""
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    dest = "/tmp/paged_api_{}_customer.jsonl".format(
        _os.path.basename(_os.path.normpath(sf_dir))
    )
    # freshness contract: the test double is current only for the exact
    # parquet file it was built from — keyed on (size, mtime_ns), not
    # row count, so a regenerated testdata file with the same
    # cardinality but different values forces a rebuild
    src_stat = _os.stat(f"{sf_dir}/customer.parquet")
    sig = f"{src_stat.st_size}:{src_stat.st_mtime_ns}"
    sig_path = dest + ".sig"
    reusable = False
    if _os.path.exists(dest) and _os.path.exists(sig_path):
        with open(sig_path, "r", encoding="utf-8") as f:
            reusable = f.read() == sig
    if not reusable:
        tbl = _pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
        )
        tmp = dest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for rec in tbl.to_pylist():
                f.write(_json.dumps(rec) + "\n")
        _os.replace(tmp, dest)  # atomic: concurrent runs see a full file
        with open(sig_path + ".tmp", "w", encoding="utf-8") as f:
            f.write(sig)
        _os.replace(sig_path + ".tmp", sig_path)
    return dest


@register(
    "paged_source_scan",
    sql="""
    SELECT
        c_custkey    AS cust_id,
        c_name       AS cust_name,
        c_acctbal    AS acctbal,
        c_mktsegment AS segment
    FROM customer
    WHERE c_acctbal > 500.0 AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    description="S1-S4 end-to-end: customer rows served page-by-page "
    "through the paged_json Python DataSource (partition-per-page, "
    "count probe, pushed range + IN filters, retry envelope) vs the "
    "parquet oracle",
)
def paged_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The measured query is the paged scan itself (the JSONL test
    # double materializes driver-side, not in the plan). Filters are
    # pushed into each page read (S4); pages become input partitions
    # (S1/S2) sized by the count probe (S3); every fetch runs inside
    # the retry/backoff envelope.
    from magshield_data_pipeline_spark.sources import paged as P

    dest = _customer_jsonl(sf_dir)
    P.register(spark)
    df = (
        spark.read.format("paged_json")
        .schema(
            "c_custkey bigint, c_name string, c_acctbal double, "
            "c_mktsegment string"
        )
        .option("path", dest)
        .option("pageSize", 500)  # the reference's top=500
        .load()
    )
    return df.filter(
        (F.col("c_acctbal") > 500.0)
        & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )


# ---------------------------------------------------------------------------
# Schema-evolution ingest: mergeSchema read + name-matched union (r6)
#
# Reference analog: the CUSTOMFIELDS payload drifts open-endedly across
# records (/root/reference/modules/equiment.py:129, invoice.py:155) —
# the batch-ingest counterpart is a parquet directory whose files were
# written under evolving schemas. The query materializes that state
# from `orders` (three disjoint batches, each with a different column
# set), exercises BOTH helpers in sources/parquet.py on it, and
# hash-checks the null-filled result against a DuckDB twin.

_DRIFT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CASE WHEN o_orderkey % 3 = 1 THEN o_orderpriority END
           AS o_orderpriority,
       CASE WHEN o_orderkey % 3 = 2 THEN o_orderstatus END AS o_orderstatus
FROM orders
"""


@register(
    "schema_drift_union",
    sql=_DRIFT_SQL,
    description="schema-evolution ingest end-to-end: two parquet batches "
    "written under DIFFERENT schemas into one directory, read back with "
    "mergeSchema (older files null-fill the added column), then unioned "
    "by NAME with a third drifted frame (unionByName allowMissingColumns "
    "— positional union would zip mismatched columns, the classic drift "
    "corruption); reference analog is the open-ended CUSTOMFIELDS drift "
    "(equiment.py:129, invoice.py:155)",
)
def schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The write targets a per-SF scratch dir (cheap: two column-pruned
    # order subsets) so the READ path under test is a genuine evolving
    # parquet directory, not an in-memory simulation. At 100 TB the
    # analog is years of daily drops under an additive schema policy,
    # and the mergeSchema footer merge is the one extra metadata pass
    # you pay to read them as one table.
    from magshield_data_pipeline_spark.sources.parquet import (
        evolve_union,
        read_evolved,
    )
    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch as _ensure_scratch,
        scratch_path as _scratch_path,
    )

    orders = read_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    b1 = orders.filter(key % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b2 = orders.filter(key % 3 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    # third batch drifts differently: skips o_orderpriority, adds
    # o_orderstatus — the union must align by name across ALL of them
    b3 = orders.filter(key % 3 == 2).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    # ONE deterministic scratch dir per (SF, layout signature), built
    # once and published by atomic rename (sources/scratch.py): no
    # uuid-per-invocation accumulation (ADVICE r6), no stale reuse
    # after a layout change (the batch spec is hashed into the path),
    # and no overwrite-under-a-lazy-reader flake — published trees are
    # immutable, so a concurrent bench/pytest run on the same SF reads
    # the same complete directory. The glob read below unions both
    # subdirs' footers exactly as a flat evolving directory would.
    base = _scratch_path(
        "schema_drift",
        sf_dir,
        "b1 key%3=0 (okey,ckey,price); "
        "b2 key%3=1 (okey,ckey,price,priority) v1",
    )

    def _build(tmp: str) -> None:
        b1.write.parquet(tmp + "/batch1")
        b2.write.parquet(tmp + "/batch2")

    _ensure_scratch(base, _build)
    # widest schema, b1 rows null-fill ('batch*' avoids the 'k=v'
    # pattern partition discovery would misread as a partition column)
    merged = read_evolved(spark, base + "/batch*")
    return evolve_union(merged, b3).select(
        "o_orderkey", "o_custkey", "o_totalprice",
        "o_orderpriority", "o_orderstatus",
    )


# ---------------------------------------------------------------------------
# Q2-shaped correlated minimum: cheapest supplier per part (r6)

_MINCOST_SQL = """
WITH costs AS (
    -- NO round() on the quotient: a free-form double can sit at a
    -- decimal .5 boundary where Spark's BigDecimal(shortest-string)
    -- HALF_UP and DuckDB's numeric rounding disagree by 1 ulp of the
    -- grid; the RAW quotient is IEEE-identical on identical operands,
    -- hashes identically, and ranks identically
    SELECT l_partkey, l_suppkey,
           l_extendedprice / l_quantity AS unit_cost
    FROM lineitem WHERE l_quantity > 0
),
best AS (
    SELECT l_partkey, l_suppkey, unit_cost,
           row_number() OVER (
               PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey
           ) AS rn
    FROM costs
)
SELECT b.l_partkey AS partkey, b.l_suppkey AS suppkey,
       s.s_name AS supp_name, b.unit_cost
FROM best b JOIN supplier s ON b.l_suppkey = s.s_suppkey
WHERE b.rn = 1 AND b.l_partkey % 10 = 0
"""


@register(
    "part_min_cost_supplier",
    sql=_MINCOST_SQL,
    description="the TPC-H Q2 shape — a correlated `= (SELECT min(...))` "
    "subquery rewritten as one min_by partial aggregate + dim join-back: "
    "per part, the supplier quoting the lowest unit cost (ties to lowest "
    "suppkey); no ranking window on the Spark side — the argmin "
    "collapses map-side before the exchange, the decorrelation every "
    "optimizer textbook derives, written directly",
)
def part_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: ONE partial-agg shuffle on l_partkey (min_by struct key);
    # the supplier dim broadcasts. The naive correlated form would
    # re-scan lineitem per part — the rewrite is the whole point.
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    costs = lineitem.filter(F.col("l_quantity") > 0).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    best = F.min_by(
        F.struct("l_suppkey", "unit_cost"),
        F.struct("unit_cost", "l_suppkey"),
    )
    per_part = (
        costs.groupBy("l_partkey")
        .agg(best.alias("_b"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("_b.l_suppkey").alias("suppkey"),
            F.col("_b.unit_cost").alias("unit_cost"),
        )
        .filter(F.col("partkey") % 10 == 0)
    )
    return per_part.join(
        F.broadcast(
            supplier.select(
                F.col("s_suppkey").alias("suppkey"),
                F.col("s_name").alias("supp_name"),
            )
        ),
        "suppkey",
    ).select("partkey", "suppkey", "supp_name", "unit_cost")


# ---------------------------------------------------------------------------
# Q11-shaped global-share threshold (r6)

_SHARE_FRAC = 0.05

_NATION_SHARE_SQL = f"""
WITH rev AS (
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
),
tot AS (SELECT round(sum(revenue), 4) AS total FROM rev)
SELECT nation, revenue
FROM rev CROSS JOIN tot
WHERE revenue > {_SHARE_FRAC} * total
"""


@register(
    "nation_value_share",
    sql=_NATION_SHARE_SQL,
    description="the TPC-H Q11 shape — a HAVING threshold against a "
    "scalar subquery over the WHOLE table (groups worth more than "
    f"{_SHARE_FRAC:.0%} of global revenue): the rollup is computed once "
    "and its single-row total re-joined, not recomputed per group; "
    "revenue and total both rounded to the same 4 decimals so the "
    "threshold compare runs on identical operands in both engines",
)
def nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the per-nation rollup is one partial-agg shuffle; the
    # global total derives from the ROLLUP (25 rows), not a second
    # fact scan, and broadcasts as a single row (count_probe pattern).
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    rev = (
        lineitem.join(
            supplier, lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .persist()
    )
    tot = rev.agg(F.round(F.sum("revenue"), 4).alias("total"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("revenue") > F.lit(_SHARE_FRAC) * F.col("total"))
        .select("nation", "revenue")
    )


# ---------------------------------------------------------------------------
# Q21-shaped EXISTS / NOT EXISTS composite (r6)

_SOLE_RETURN_SQL = """
WITH base AS (
    SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
),
returned AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM base WHERE l_returnflag = 'R'
),
candidates AS (
    SELECT r.l_orderkey, r.l_suppkey
    FROM returned r
    WHERE EXISTS (
        SELECT 1 FROM base o
        WHERE o.l_orderkey = r.l_orderkey AND o.l_suppkey <> r.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM returned x
        WHERE x.l_orderkey = r.l_orderkey AND x.l_suppkey <> r.l_suppkey
    )
)
SELECT s.s_name AS supp_name,
       CAST(count(*) AS BIGINT) AS n_orders
FROM candidates c JOIN supplier s ON c.l_suppkey = s.s_suppkey
GROUP BY 1
"""


@register(
    "sole_return_suppliers",
    sql=_SOLE_RETURN_SQL,
    description="the TPC-H Q21 shape — EXISTS and NOT EXISTS correlated "
    "subqueries composed on one fact: suppliers who are the ONLY "
    "supplier with a returned item on a multi-supplier order, counted "
    "per supplier; decorrelated to a left-semi join (another supplier "
    "exists) plus a left-anti join (no other returning supplier) over "
    "key-level dedup frames — no correlated re-scan per row",
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both EXISTS rewrites are key-only frames deduped BEFORE
    # the joins (distinct (order, supp) pairs, far smaller than line
    # items), shuffled once on l_orderkey; the supplier dim broadcasts.
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    base = lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
    pairs = base.select("l_orderkey", "l_suppkey").distinct()
    returned = (
        base.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .persist()
    )
    other_any = pairs.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_ret = returned.select(
        F.col("l_orderkey").alias("x_key"), F.col("l_suppkey").alias("x_supp")
    )
    with_other = returned.join(
        other_any,
        (F.col("l_orderkey") == F.col("o_key"))
        & (F.col("l_suppkey") != F.col("o_supp")),
        "left_semi",
    )
    sole = with_other.join(
        other_ret,
        (F.col("l_orderkey") == F.col("x_key"))
        & (F.col("l_suppkey") != F.col("x_supp")),
        "left_anti",
    )
    return sole.join(
        F.broadcast(
            supplier.select(
                F.col("s_suppkey").alias("l_suppkey"),
                F.col("s_name").alias("supp_name"),
            )
        ),
        "l_suppkey",
    ).groupBy("supp_name").agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# RANGE-frame time window: rolling 7-day revenue (r6)

_ROLL_SQL = """
WITH daily AS (
    SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS day_no,
           round(sum(o_totalprice), 2) AS day_rev
    FROM orders GROUP BY 1
)
SELECT CAST(day_no AS BIGINT) AS day_no, day_rev,
       round(sum(day_rev) OVER (
           ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 2) AS rev_7d
FROM daily
"""


@register(
    "rolling_7day_revenue",
    sql=_ROLL_SQL,
    description="RANGE-frame window over event time: per-day revenue "
    "plus its trailing 7-day sum — RANGE (value-based) framing, not "
    "ROWS, so missing days shorten the frame instead of silently "
    "stretching it across gaps (the moving-average bug ROWS framing "
    "hides); the window runs over the |days| rollup, never raw orders, "
    "and both levels round to the money grid",
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one partial-agg shuffle to the daily rollup (~2400 rows at
    # any SF); the RANGE window orders that rollup only. A global sort
    # of thousands of rows is a no-op; the raw fact never sees a
    # window. rev_7d re-rounds a sum of exact 2-decimal addends.
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("day_no")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
    w = Window.orderBy("day_no").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "day_no",
        "day_rev",
        F.round(F.sum("day_rev").over(w), 2).alias("rev_7d"),
    )


# ---------------------------------------------------------------------------
# Text-format ingestion with corrupt-record quarantine: JSONL (r7)

_JSONL_CORRUPT_LINES = (
    '{"o_orderkey": 999999999, "o_orderpriority": "1-URGENT", '
    '"o_totalprice": not_json}\n'
    '{"o_orderkey": "trailing garbage"\n'
)
_JSONL_N_CORRUPT = 2

_JSONL_SQL = f"""
WITH good AS (
    SELECT o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 20 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_good,
       CAST({_JSONL_N_CORRUPT} AS BIGINT) AS n_corrupt,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
FROM good
"""


@register(
    "jsonl_ingest_rollup",
    sql=_JSONL_SQL,
    description="newline-delimited JSON ingestion with PERMISSIVE "
    "corrupt-record quarantine: an orders subset round-trips through "
    "JSONL (Spark json writer) alongside a batch of deliberately "
    "malformed lines; the read carries an EXPLICIT schema + "
    "_corrupt_record column, so malformed lines surface as quarantine "
    "rows (counted) instead of poisoning the load or being silently "
    "dropped — the log/event-feed ingestion contract at 100 TB, where "
    "a bad producer must never abort the batch (reference analog: the "
    "CSV/Excel sniffing tolerance, opportunity_stage.py:56-80); the "
    "oracle recomputes the clean rollup from the raw table plus the "
    "known corrupt-line count",
)
def jsonl_ingest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: JSONL parses at full partition parallelism with the
    # explicit schema (no inference scan); the corrupt-record column
    # is the row-level quarantine feed (dq_quarantine_rows' ingest
    # sibling). Scratch layout is write-once per (SF, batch spec),
    # atomically published (sources/scratch.py convention).
    import os as _os

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch as _ensure_scratch,
        scratch_path as _scratch_path,
    )

    orders = read_table(spark, sf_dir, "orders")
    base = _scratch_path(
        "orders_jsonl",
        sf_dir,
        "key%20=0 (okey,priority,price) + " + _JSONL_CORRUPT_LINES,
    )

    def _build(tmp: str) -> None:
        (
            orders.filter(F.col("o_orderkey") % 20 == 0)
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .write.json(tmp + "/good")
        )
        _os.makedirs(tmp + "/bad", exist_ok=True)
        with open(tmp + "/bad/corrupt.json", "w") as f:
            f.write(_JSONL_CORRUPT_LINES)

    _ensure_scratch(base, _build)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderpriority", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json([base + "/good", base + "/bad"])
    )
    # one pass: corrupt rows counted, clean rows aggregated
    return raw.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias(
            "n_corrupt"
        ),
        F.round(
            F.sum(
                F.when(F.col("_corrupt_record").isNull(), F.col("o_totalprice"))
            ),
            2,
        ).alias("revenue"),
        F.count_distinct(
            F.when(
                F.col("_corrupt_record").isNull(), F.col("o_orderpriority")
            )
        ).alias("n_priorities"),
    )


# ---------------------------------------------------------------------------
# Columnar-format round-trip: ORC (r7)

_ORC_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderkey % 7 = 0 AND o_totalprice > 50000.0
GROUP BY 1
"""


@register(
    "orc_roundtrip_scan",
    sql=_ORC_SQL,
    description="second columnar format proven end-to-end: an orders "
    "subset written to ORC and read back with a selective predicate — "
    "the filter reaches the ORC reader as a pushed filter (plan-"
    "asserted in tests/test_plan_shapes.py) exactly as it does for "
    "parquet, so a deployment mixing the two lake formats keeps scan "
    "pruning on both; oracle recomputes from the raw table",
)
def orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch as _ensure_scratch,
        scratch_path as _scratch_path,
    )

    orders = read_table(spark, sf_dir, "orders")
    base = _scratch_path(
        "orders_orc", sf_dir, "key%7=0 (okey,priority,price) v1"
    )

    def _build(tmp: str) -> None:
        (
            orders.filter(F.col("o_orderkey") % 7 == 0)
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .write.orc(tmp)
        )

    _ensure_scratch(base, _build)
    return (
        spark.read.orc(base)
        .filter(F.col("o_totalprice") > 50000.0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Spark-native CSV scan with corrupt-record quarantine (r7) — upgrades
# S6 (CSV reader + sniffer, reports.py pandas bridge) with the
# distributed-scan evidence path

# header first — option('header') strips the first line of EVERY file,
# not just the main batch. Both data lines corrupt the PRICE column:
# the CSV reader parses only REFERENCED columns (columnPruning), so a
# bad value in an unreferenced column is never even parsed, and a
# short row merely null-fills — neither marks the record corrupt;
# quarantine semantics are per-parsed-column, a real (documented)
# CSV-at-scale subtlety
_CSV_CORRUPT_LINES = (
    "o_orderkey,o_totalprice,o_orderpriority\n"
    "999999991,NOT_A_NUMBER,1-URGENT\n"
    "999999992,ALSO_BAD,2-HIGH\n"
)
_CSV_N_CORRUPT = 2

_CSV_SQL = f"""
WITH good AS (
    SELECT o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 30 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_good,
       CAST({_CSV_N_CORRUPT} AS BIGINT) AS n_corrupt,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
FROM good
"""


@register(
    "csv_ingest_rollup",
    sql=_CSV_SQL,
    description="Spark-native distributed CSV scan with PERMISSIVE "
    "corrupt-record quarantine (upgrades S6, whose reports.py "
    "pandas-bridge reader covers the driver-side sniffing path): an "
    "orders subset round-trips through headered CSV alongside "
    "deliberately malformed lines (bad numeric, short row); the read "
    "carries an explicit schema + _corrupt_record so bad lines are "
    "counted quarantine rows, never an abort or silent drop — same "
    "contract as jsonl_ingest_rollup on the second text format; oracle "
    "recomputes the clean rollup from the raw table",
)
def csv_ingest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch as _ensure_scratch,
        scratch_path as _scratch_path,
    )

    orders = read_table(spark, sf_dir, "orders")
    base = _scratch_path(
        "orders_csv",
        sf_dir,
        "key%30=0 (okey,price,priority) header + " + _CSV_CORRUPT_LINES,
    )

    def _build(tmp: str) -> None:
        (
            orders.filter(F.col("o_orderkey") % 30 == 0)
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
            .write.option("header", "true")
            .csv(tmp + "/good")
        )
        _os.makedirs(tmp + "/bad", exist_ok=True)
        with open(tmp + "/bad/corrupt.csv", "w") as f:
            f.write(_CSV_CORRUPT_LINES)

    _ensure_scratch(base, _build)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderpriority", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv([base + "/good", base + "/bad"])
    )
    return raw.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias(
            "n_corrupt"
        ),
        F.round(
            F.sum(
                F.when(F.col("_corrupt_record").isNull(), F.col("o_totalprice"))
            ),
            2,
        ).alias("revenue"),
        F.count_distinct(
            F.when(
                F.col("_corrupt_record").isNull(), F.col("o_orderpriority")
            )
        ).alias("n_priorities"),
    )


# ---------------------------------------------------------------------------
# S1/S2 as an INCREMENTAL STREAM (late r7): the paged source's
# streaming twin. The reference re-fetches the whole endpoint on every
# HTTP trigger (callable.py full-refresh); the scale-correct form
# checkpoints a page cursor and fetches only new pages per micro-batch
# (sources/paged.py::PagedJsonStreamReader). Spark's AvailableNow
# falls back to single-batch for Python streaming sources, so the
# drain loop runs a continuous trigger and stops when the stream
# offset reaches the count probe's total — every page then went
# through a separate micro-batch, offsets checkpointed between.

_PAGED_STREAM_SQL = """
SELECT c_mktsegment AS segment,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS acctbal_sum
FROM customer
GROUP BY 1
"""


@register(
    "paged_stream_scan",
    sql=_PAGED_STREAM_SQL,
    description="the paginated source as an INCREMENTAL STREAM: "
    "customer pages arrive one micro-batch at a time through the "
    "paged_json simple stream reader (offset = checkpointed page "
    "cursor; readBetweenOffsets replays a batch exactly on recovery), "
    "drained page-by-page under a continuous trigger until the offset "
    "reaches the count probe's total, into a complete-mode per-segment "
    "rollup — the scale-correct form of the reference's full-refresh "
    "loop (callable.py), paying for the feed once instead of per "
    "trigger (S1/S2 streaming twin)",
)
def paged_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tempfile
    import time as _time
    import uuid as _uuid

    from magshield_data_pipeline_spark.sources import paged as P

    dest = _customer_jsonl(sf_dir)
    with open(dest, "r", encoding="utf-8") as f:
        total = sum(1 for ln in f if ln.strip())
    P.register(spark)
    # page size scales with the feed so the drain is TWO micro-batches
    # at any SF — the minimum that still proves the INCREMENTAL path
    # (offsets committed between batches; the 50-row floor keeps even
    # the sf0.001 feed multi-batch).  Each micro-batch is a ~2s
    # PROTOCOL floor regardless of rows (measured r9: addBatch ~2s =
    # the simple-reader round-trip — driver-side page prefetch, rows
    # pickled to one executor stage, complete-mode state rewrite;
    # getBatch/latestOffset are <50ms), so batch count, not data,
    # decides this query's wall time: 4 pages measured 2x the wall of
    # 2 pages at identical results.  readBetweenOffsets replay is
    # pinned independently in tests/test_paged_source.py, so shrinking
    # the drain loses no recovery coverage.
    page_size = max(50, -(-total // 2))
    stream = (
        spark.readStream.format("paged_json")
        .schema(
            "c_custkey bigint, c_name string, c_acctbal double, "
            "c_mktsegment string"
        )
        .option("path", dest)
        .option("pageSize", page_size)
        .load()
    )
    agg = stream.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
    )
    name = f"paged_stream_{_uuid.uuid4().hex[:8]}"
    # state-partition sizing (r12, the same knob streaming/windows.py's
    # run_available_now exposes): the complete-mode rollup keys on
    # |segments| = 5 groups, so 8 state partitions — frozen from
    # shuffle.partitions at first checkpoint — replace 32 near-empty
    # state files + tasks per micro-batch; partitioning never changes
    # results, and the fresh per-run checkpoint makes the override safe
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    q = None
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation",
                    _tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        import ast as _ast

        deadline = _time.time() + 120
        while _time.time() < deadline:
            prog = q.lastProgress
            if prog and prog["sources"]:
                # endOffset arrives as a STRING in progress events —
                # the str() of the Python offset dict ("{'row': 500}")
                end = prog["sources"][0]["endOffset"]
                end = _ast.literal_eval(end) if isinstance(end, str) else end
                if end and int(end.get("row", 0)) >= total:
                    break
            _time.sleep(0.05)
        else:
            raise TimeoutError(
                f"paged_stream_scan: offset never reached {total} rows"
            )
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination(30)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return spark.table(name)


# ---------------------------------------------------------------------------
# binaryFile source (r8): opaque-blob ingestion — the multimodal lake
# pattern where media lives as FILES beside the metadata tables

_BINFILE_N = 20  # fixed count, bounded at every SF (not a modulus)

_BINFILE_SQL = f"""
SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.bin'
           AS file_name,
       CAST(length(text) AS BIGINT) AS byte_len,
       md5(text) AS content_md5
FROM documents WHERE doc_id < {_BINFILE_N}
"""


@register(
    "binary_file_ingest",
    sql=_BINFILE_SQL,
    description="spark.read.format('binaryFile') over a directory of "
    "opaque blobs: per-file (name, byte length, content MD5) — the "
    "ingestion path for media stored as FILES rather than parquet "
    "binary columns (reference analog: the attachment download path, "
    "opportunity_stage.py:56-80); oracle recomputes from the documents "
    "rows the blobs were materialized from",
)
def binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: binaryFile assigns one partition per file group (standard
    # FileScan split planning, small files coalesced by
    # maxPartitionBytes/openCostInBytes), so a million-blob directory
    # fans out across executors like any other file source; content is
    # only materialized into rows that survive column pruning — a
    # metadata-only query (path, length) never reads the bytes.
    import os as _os

    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch as _ensure_scratch,
        scratch_path as _scratch_path,
    )

    docs = read_table(spark, sf_dir, "documents")
    base = _scratch_path(
        "doc_blobs", sf_dir, f"doc_id<{_BINFILE_N} utf8-text .bin v1"
    )

    def _build(tmp: str) -> None:
        # bounded by construction: a FIXED count of fixture docs (a
        # modulus would grow with the corpus and turn this driver-side
        # materialization into an unbounded collect)
        rows = (
            docs.filter(F.col("doc_id") < _BINFILE_N)
            .select("doc_id", "text")
            .collect()
        )
        _os.makedirs(tmp, exist_ok=True)
        for r in rows:
            path = _os.path.join(tmp, f"doc_{r['doc_id']:06d}.bin")
            with open(path, "wb") as f:
                f.write(r["text"].encode("utf-8"))

    _ensure_scratch(base, _build)
    blobs = spark.read.format("binaryFile").load(base)
    return blobs.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# Python DataSource WRITER round-trip (r8): the write half of the
# custom-connector story (K2/K3 upload-then-swap, distributed)

_PYSINK_SQL = """
WITH sub AS (
    SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 17 = 0
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM sub GROUP BY o_orderstatus
"""


@register(
    "python_sink_roundtrip",
    sql=_PYSINK_SQL,
    description="Python DataSource WRITER proven end-to-end: an orders "
    "subset written through the task-staged atomic-commit jsonl_sink "
    "(per-task staging, driver-side rename publish + _SUCCESS "
    "manifest — the distributed form of the reference's "
    "upload-then-swap, report.py), read back and rolled up; oracle "
    "recomputes from the raw table, and the build asserts the "
    "manifest row count (S/K custom-connector tier, write half)",
)
def python_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os as _os

    from magshield_data_pipeline_spark.sources import jsonl_sink as _sink
    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch as _ensure_scratch,
        scratch_path as _scratch_path,
    )

    orders = read_table(spark, sf_dir, "orders")
    base = _scratch_path(
        "orders_pysink", sf_dir, "key%17=0 (okey,status,price) jsonl_sink v2 job-unique parts"
    )

    def _build(tmp: str) -> None:
        _sink.register(spark)
        (
            orders.filter(F.col("o_orderkey") % 17 == 0)
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.format("jsonl_sink")
            .option("path", tmp)
            .mode("append")
            .save()
        )
        # the committed manifest must account for every row written
        with open(_os.path.join(tmp, "_SUCCESS")) as f:
            manifest = _json.load(f)
        staged_left = _os.listdir(_os.path.join(tmp, "_staged"))
        if staged_left:
            raise RuntimeError(f"uncommitted stage debris: {staged_left}")
        n_src = orders.filter(F.col("o_orderkey") % 17 == 0).count()
        if manifest["rows"] != n_src:
            raise RuntimeError(
                f"manifest rows {manifest['rows']} != source rows {n_src}"
            )

    _ensure_scratch(base, _build)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("pathGlobFilter", "part-*.jsonl")
        .json(base)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# streaming append into the snapshot LEDGER (r9): foreachBatch +
# idempotent per-epoch commit — the exactly-once streaming-lakehouse
# contract (Structured Streaming replays a failed epoch with the SAME
# batch id; sources/snapshots.py::append_stream_batch makes the replay
# a no-op, so at-least-once delivery becomes exactly-once table state)

_SSA_SQL = """
SELECT c_mktsegment AS segment,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS acctbal_sum,
       CAST(2 AS BIGINT) AS n_versions,
       CAST(2 AS BIGINT) AS n_epochs
FROM customer
GROUP BY 1
"""


@register(
    "snapshot_stream_append",
    sql=_SSA_SQL,
    description="exactly-once STREAMING append into the snapshot "
    "ledger: the paged customer stream drains in two micro-batches "
    "through writeStream.foreachBatch, each epoch committed via "
    "sources/snapshots.py::append_stream_batch (manifest records the "
    "batch id; replays are no-ops — the Delta/Iceberg txn contract); "
    "the final table reads back by manifest and must equal the full "
    "batch rollup with EXACTLY 2 versions from 2 distinct epochs — a "
    "double-commit or lost epoch breaks the hash ([EXT] streaming + "
    "lakehouse composition)",
)
def snapshot_stream_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: per epoch, cost is the epoch's rows (one parquet write +
    # one manifest link); the ledger gives downstream consumers
    # read_changes-style incremental access to exactly the new epoch.
    import ast as _ast
    import tempfile as _tempfile
    import time as _time
    import uuid as _uuid

    from magshield_data_pipeline_spark.sources import paged as P
    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch,
        scratch_path,
    )

    dest = _customer_jsonl(sf_dir)
    with open(dest, "r", encoding="utf-8") as f:
        total = sum(1 for ln in f if ln.strip())
    P.register(spark)
    base = scratch_path(
        "snap_stream_customer", sf_dir,
        f"foreachBatch append_stream_batch 2 pages of {total} v1",
    )

    def _build(tmp: str) -> None:
        page_size = max(50, -(-total // 2))
        stream = (
            spark.readStream.format("paged_json")
            .schema(
                "c_custkey bigint, c_name string, c_acctbal double, "
                "c_mktsegment string"
            )
            .option("path", dest)
            .option("pageSize", page_size)
            .load()
        )

        def sink(batch_df, batch_id: int) -> None:
            if batch_df.isEmpty():
                return  # an empty trailing trigger commits nothing
            SN.append_stream_batch(batch_df, tmp, int(batch_id), n_files=1)

        name = f"snap_stream_{_uuid.uuid4().hex[:8]}"
        q = (
            stream.writeStream.foreachBatch(sink)
            .option(
                "checkpointLocation",
                _tempfile.mkdtemp(prefix=f"ckpt_{name}_"),
            )
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                prog = q.lastProgress
                if prog and prog["sources"]:
                    end = prog["sources"][0]["endOffset"]
                    end = (
                        _ast.literal_eval(end) if isinstance(end, str) else end
                    )
                    if end and int(end.get("row", 0)) >= total:
                        break
                _time.sleep(0.05)
            else:
                raise TimeoutError(
                    f"snapshot_stream_append: offset never reached {total}"
                )
            # let the final in-flight epoch COMMIT before stopping: the
            # offset check above proves the source was fully read, not
            # that foreachBatch finished writing the last table version
            while _time.time() < deadline:
                vs = SN.versions(tmp)
                if vs and sum(
                    e["rows"]
                    for e in SN.read_manifest(tmp, vs[-1])["files"]
                ) >= total:
                    break
                _time.sleep(0.05)
        finally:
            q.stop()
            q.awaitTermination(30)

    ensure_scratch(base, _build)
    vs = SN.versions(base)
    epochs = {SN.read_manifest(base, v)["batch_id"] for v in vs}
    return (
        SN.read(spark, base)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
        )
        .withColumn("n_versions", F.lit(len(vs)).cast("long"))
        .withColumn("n_epochs", F.lit(len(epochs)).cast("long"))
    )
