"""Parquet star-schema source.

The test harness's tables (TESTDATA.md): TPC-H-ish star schema plus
``events`` (stream fixture), ``documents`` (text corpus) and
``embeddings`` (vector fixture). Parquet gives the engine column
pruning, predicate pushdown, and row-group statistics for free — the
capabilities the reference hand-rolls over its REST API with
``brief=false`` column selection and ``X-Total-Count`` probes
(/root/reference/modules/quote.py:81,95).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.parquet`` carries TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default (PARQUET_TYPE_ILLEGAL); we read the nanos
    as a long and rebuild a microsecond timestamp (floor division —
    matching how nanosecond timestamps truncate to µs elsewhere).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_star_schema(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every test table as a lazily-planned DataFrame.

    No I/O happens here — each entry is a logical scan node; Catalyst
    prunes columns/filters per consuming query, so loading "everything"
    costs nothing until an action runs.
    """
    return {t: read_table(spark, sf_dir, t) for t in STAR_TABLES}
