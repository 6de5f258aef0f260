"""Source readers (SURVEY §2.1 S1–S8)."""

from magshield_data_pipeline_spark.sources.parquet import (
    STAR_TABLES,
    load_star_schema,
    read_table,
)

__all__ = ["STAR_TABLES", "load_star_schema", "read_table"]
