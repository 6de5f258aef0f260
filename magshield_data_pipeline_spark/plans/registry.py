"""Query registry: every operator from SURVEY §2 as a (Spark plan, DuckDB
oracle SQL) pair over the driver's test tables.

Each entry is the idiomatic-Spark restatement of one reference operator
pattern, expressed on the TPC-H-ish star schema (FIXTURES.md §A role
mapping: orders/lineitem = fact with fan-out; customer/supplier/nation/
region/part = broadcast dims; documents/embeddings/events = the [EXT]
scale-tier fixtures).

Conventions that keep the driver's order-insensitive value-hash stable:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are wrapped in ``round(..., 2..6)`` — the source money
  columns carry exactly 2 decimals, so real sums are exact multiples of
  0.01/0.0001 and rounding absorbs summation-order noise;
- timestamps that reach the output are formatted to strings;
- every top-k / limit has a total-order tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One oracle-checked query: Spark plan + equivalent DuckDB SQL.

    ``sql=None`` marks a genuinely non-SQL-expressible operator (custom
    stateful streaming, LSH pipelines); the driver then records a weaker
    rows-only check.
    """

    fn: QueryFn
    sql: Optional[str]
    description: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: Optional[str], description: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERY_REGISTRY[name] = QuerySpec(fn=fn, sql=sql, description=description)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in QUERY_REGISTRY.items() if spec.sql is not None
    }


# importing the plan modules populates the registry
from magshield_data_pipeline_spark.plans import reference_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import ext_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import nested_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import window_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import temporal_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import analytics_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import export_queries  # noqa: E402,F401
from magshield_data_pipeline_spark.plans import curation_queries  # noqa: E402,F401
