"""Oracle-checked analytical query plans over the test star schema."""

from magshield_data_pipeline_spark.plans.registry import (
    QUERY_REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["QUERY_REGISTRY", "QuerySpec", "oracle_sql", "queries"]
