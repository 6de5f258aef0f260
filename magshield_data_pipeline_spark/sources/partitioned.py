"""Hive-style partitioned table layout + partition pruning.

The single most common 100 TB scan-reduction technique: write the fact
table into ``col=value`` directories (``df.write.partitionBy(...)``) so
that

- a LITERAL predicate on the partition column eliminates directories at
  PLANNING time (static partition pruning — the scan's
  ``PartitionFilters``, zero data files opened for pruned months), and
- a JOIN against a filtered dimension eliminates directories at
  RUNTIME (dynamic partition pruning — Spark broadcasts the dim's
  partition-key set and injects ``dynamicpruningexpression(key IN ...)``
  into the fact scan before it starts).

Reference analog: the 15-day mail lookback
(/root/reference/modules/opportunity_stage.py:135-141) — a server-side
time-pruned scan; here the "server side" is the directory layout
itself. This complements, not replaces, the intra-file skipping tier
(operators/layout.py Z-order/Hilbert): partitioning eliminates whole
directories by a coarse key (day/month/source), clustering orders rows
WITHIN files for row-group stats — at 100 TB you want both.

Partition-count discipline (the 100 TB posture): the partition key must
be LOW cardinality (thousands, not millions — each value is a
filesystem directory and a metastore entry; a per-day key over a decade
is ~3.6k, fine; a per-user key is a metastore outage), and each
partition should hold ≥ the rows of a few target files. The write below
``repartition(partition_cols)`` first so every partition directory gets
one task's worth of output files instead of one file per (task ×
partition) — the classic small-files explosion; pair with
``operators/scale.py::compaction_bins`` when append batches accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources.parquet import read_table
from magshield_data_pipeline_spark.sources.scratch import (
    ensure_scratch,
    scratch_path,
)

# Layout spec for the derived partitioned copy of the fixture fact
# table. Every input that determines the directory's contents is named
# here; sources/scratch.py hashes it into the path, so a code change
# to the layout gets a FRESH directory instead of silently reusing a
# stale one, and concurrent first builds publish atomically.
_LAYOUT_SPEC = (
    "orders partitionBy o_month=date_format(o_orderdate,'yyyy-MM') "
    "repartition-by-key v1"
)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Write *df* as a hive-partitioned parquet directory tree.

    ``repartition(partition_cols)`` shuffles each partition's rows to
    one task so the layout produces one file per partition directory
    per output batch, not ``tasks × partitions`` small files.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partition-level idempotent backfill: rewrite ONLY the partitions
    present in *df*, leaving every other directory untouched.

    ``partitionOverwriteMode=dynamic`` scopes mode=overwrite to the
    partitions the incoming frame actually contains — the 100 TB
    incremental-ETL primitive: re-running one day's batch replaces that
    day's directory atomically-per-partition instead of (STATIC mode)
    truncating the whole table, and re-delivery converges because the
    write is a pure function of the batch. The reference analog is the
    per-entity full-refresh upsert (one_drive.py's overwrite-by-name
    sink) done at partition rather than file granularity.

    The conf is set per-write via ``option()`` (Spark ≥ 3.0), so the
    session default stays untouched for other writers.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def orders_by_month_path(sf_dir: str) -> str:
    return scratch_path("orders_by_month", sf_dir, _LAYOUT_SPEC)


def ensure_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize (once per SF + layout spec) the orders fact
    partitioned by a derived ``o_month`` column and return the
    partition-aware frame.

    Idempotent and concurrency-safe via sources/scratch.py: contents
    are a pure function of (SF fixture, ``_LAYOUT_SPEC``), the spec
    hash lives in the path so a layout change gets a fresh directory,
    and the build publishes by atomic rename so an existing directory
    is always complete and is never rewritten under a reader.
    ``o_month`` is a STRING (``yyyy-MM``): hive partition values are
    directory names, and a string key round-trips partition discovery
    without type-inference surprises.
    """

    def build(tmp: str) -> None:
        orders = read_table(spark, sf_dir, "orders")
        write_partitioned(
            orders.withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            ),
            tmp,
            ["o_month"],
        )

    return spark.read.parquet(
        ensure_scratch(orders_by_month_path(sf_dir), build)
    )


def last_months_filter(
    spark: SparkSession, sf_dir: str, n_months: int = 3
) -> list[str]:
    """The reference's lookback predicate as partition-key literals:
    the last *n_months* calendar months present in the fixture, as
    ``yyyy-MM`` strings ready for an ``isin`` partition filter.

    The max-date probe is a single-row aggregate collect — the same
    driver-side metadata probe as the reference's ``X-Total-Count``
    scan sizing (count_probe convention); at 100 TB it reads parquet
    footer stats, not data.
    """
    orders = read_table(spark, sf_dir, "orders")
    last = orders.agg(
        F.max(F.date_format("o_orderdate", "yyyy-MM")).alias("m")
    ).collect()[0]["m"]
    year, month = int(last[:4]), int(last[5:7])
    months = []
    for _ in range(n_months):
        months.append(f"{year:04d}-{month:02d}")
        month -= 1
        if month == 0:
            year, month = year - 1, 12
    return sorted(months)
