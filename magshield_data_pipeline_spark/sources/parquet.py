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

# Runtime confs every plan depends on. Set on each read_table call so
# plans are correct under ANY caller's SparkSession (the grading driver
# builds a plain one, without our session factory):
#  - UTC session timezone: date_format/to_timestamp semantics must not
#    depend on the host timezone;
#  - LAST_WIN map-key dedup: map_from_entries over CUSTOMFIELDS must keep
#    the last duplicate key, matching Python-dict build semantics
#    (/root/reference/modules/quote.py:202);
#  - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which Spark's
#    reader rejects by default (PARQUET_TYPE_ILLEGAL).
# These are runtime-settable SQL confs; setting them is idempotent but
# session-wide — documented engine behavior, not a hidden side effect.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Spark 4 defaults ANSI on, where a malformed value ABORTS the job
    # (CAST_INVALID_INPUT, DIVIDE_BY_ZERO, INVALID_ARRAY_INDEX). This
    # engine reproduces the reference's dict-probe semantics — a bad
    # value is DATA and resolves to null/miss, never an abort — so the
    # null-tolerant mode is part of the engine contract. Hot spots also
    # use try_cast/get/nullif explicitly, so they stay correct even if
    # a caller forces ANSI back on.
    "spark.sql.ansi.enabled": "false",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    for k, v in _RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-TZ TimestampType instant.

    The driver has shipped two physical layouts round-over-round:
    TIMESTAMP(NANOS) (reads as nanos-since-epoch long under
    ``nanosAsLong``; rebuilt with µs floor division) and plain
    TIMESTAMP(MICROS) without isAdjustedToUTC (reads as
    TIMESTAMP_NTZ; under the UTC session TZ contract the NTZ→TZ cast
    is value-identical to DuckDB's naive-timestamp ``epoch()``).
    Branching on the observed dtype keeps every downstream plan
    layout-independent."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _session_plan_cache(spark: SparkSession) -> dict:
    """Session-scoped memo of base-table READ PLANS (r12, guide §6).

    ``spark.read.parquet`` pays a py4j round trip plus JVM file
    listing + footer schema inference on EVERY call (~0.1 s per
    table); a query touching 7 tables spent ~0.9 s of its build in
    re-inferring schemas that cannot change (the fixture dirs are
    immutable for a session's lifetime). This memo plays the role a
    table catalog's metadata cache plays in production (Iceberg/Hive
    avoid per-query listing the same way — the strongest practical
    argument for manifest-backed formats at scale, guide §6.3).

    It stores LAZY DataFrames (logical scan plans) only — never rows,
    never materialized results: every action still computes from the
    parquet inputs, and `release_caches` / data-cache hygiene is
    unaffected. Keyed on the session object itself so the memo dies
    with the session (the bench's chunked fresh sessions each start
    cold). DataFrames are immutable, so sharing one plan object
    across queries is safe.
    """
    cache = getattr(spark, "_magshield_plan_cache", None)
    if cache is None:
        cache = {}
        spark._magshield_plan_cache = cache
    return cache


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``."""
    ensure_runtime_confs(spark)
    cache = _session_plan_cache(spark)
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_event_ts(df)
        cache[key] = df
    return df


def read_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``read_table`` plus a conditional round-robin repartition for
    CPU-fan-out consumers (shingle/signature/n-gram explodes, md5-per-
    token projections): the driver's single-file, single-row-group
    fixtures give the scan exactly ONE split, serializing everything
    before the first exchange on one core. When the scan yields fewer
    partitions than the session's parallelism, one cheap repartition of
    the narrow source rows parallelizes the downstream CPU work; on a
    real multi-file corpus the condition is false and this is a NO-OP —
    no extra exchange at scale. (Same rule as export_queries'
    ``_read_spread``; results are partitioning-invariant for every
    consumer, which each query's oracle hash re-proves.)

    The target is the session's FULL parallelism (r12: the old
    ``min(cores, 16)`` cap idled half of local[32] through every
    downstream Python/shingle stage — a constant tuned for neither
    local mode nor a cluster; deriving it from defaultParallelism is
    the scale-adaptive form, guide §2)."""
    df = read_table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if scan_partitions(spark, sf_dir, name, df) < target:
        return df.repartition(target)
    return df


def scan_partitions(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame
) -> int:
    """Split count of a base-table scan, memoized per session (r12).

    ``df.rdd.getNumPartitions()`` converts the plan to an RDD on the
    JVM (analysis + physical planning, ~0.1-0.3 s) on every call; the
    split count of an immutable fixture file under fixed reader confs
    is a constant per session, so probe it once.
    """
    cache = _session_plan_cache(spark)
    key = (sf_dir, name, "nsplits")
    n = cache.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        cache[key] = n
    return n


def load_star_schema(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every test table as a lazily-planned DataFrame.

    No I/O happens here — each entry is a logical scan node; Catalyst
    prunes columns/filters per consuming query, so loading "everything"
    costs nothing until an action runs.
    """
    return {t: read_table(spark, sf_dir, t) for t in STAR_TABLES}


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time — the normal state of a years-old
    100 TB log): ``mergeSchema`` unions the per-file footers into the
    widest schema and older files surface the missing columns as null.
    Off by default in Spark because footer-merging costs one extra
    metadata pass — turn it on only for genuinely evolving directories.
    """
    ensure_runtime_confs(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)


def evolve_union(*dfs: DataFrame) -> DataFrame:
    """Union frames whose schemas drifted (columns added/reordered):
    ``unionByName(allowMissingColumns=True)`` matches by NAME and
    null-fills gaps — positional ``union`` would silently zip
    mismatched columns together, the classic schema-drift corruption.
    Column types must still agree where names coincide (fail loud)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def write_point_lookup_optimized(
    df: DataFrame, path: str, bloom_cols: dict[str, int]
) -> None:
    """Write parquet with COLUMN BLOOM FILTERS for the given columns —
    the scan-reduction rung between runtime pruning and min/max
    row-group stats (COVERAGE.md's ladder).

    ``bloom_cols`` maps column name → expected distinct count (NDV);
    parquet-mr sizes each split-block bloom filter from the NDV at the
    default 1% false-positive rate, rounded up to a power-of-two byte
    count. Where this wins at 100 TB: POINT predicates (``k = ?``,
    ``k IN (...)``) on HIGH-CARDINALITY columns the layout is NOT
    sorted or partitioned by — there min/max stats span nearly the full
    key domain in every row group and discriminate nothing, while the
    bloom filter answers "definitely absent" per row group and the
    reader skips it entirely. Do NOT bloom the Z-order/partition
    columns (stats already discriminate) or low-cardinality columns
    (every group contains every value; pure overhead). The filter costs
    its bytes once at write time and nothing at read time for
    non-point scans.

    Reference analog: the per-id Graph lookups
    (/root/reference/modules/opportunity_stage.py:95-110) — point
    probes into a large keyed store, served there by the remote API's
    index, here by the file format's own membership sketch.
    """
    writer = df.write
    for col, ndv in bloom_cols.items():
        writer = writer.option(
            f"parquet.bloom.filter.enabled#{col}", "true"
        ).option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
    writer.parquet(path)
