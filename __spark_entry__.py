"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``magshield_data_pipeline_spark``; the registry in
``magshield_data_pipeline_spark.plans`` maps SURVEY.md §2's operator
inventory to (Spark plan, oracle SQL) pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from magshield_data_pipeline_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the multi-hop revenue rollup (SURVEY §2.5 J11 /
    TPC-H Q5 shape): lineitem ⋈ orders ⋈ broadcast dims → grouped agg.
    """
    return _registry.QUERY_REGISTRY["multi_hop_revenue"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _registry.oracle_sql()
