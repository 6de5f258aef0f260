"""Scale tooling: co-located bucketed joins and skew salting.

None of this exists in the reference (its joins are in-memory dict
probes at CRM scale); these are the knobs a 100 TB deployment of the
same queries needs:

- **bucketed tables** (`write_bucketed`): pre-shuffle a fact table once
  into hash buckets on its join key; every later join/aggregation on
  that key is exchange-free (the shuffle is amortized across every
  downstream query). This is how a fact-to-fact join like
  lineitem⋈orders stops being the per-query bottleneck.
- **salted join** (`salted_join`): when one join key is pathologically
  hot (one customer with 10% of all rows), AQE's skew splitting handles
  sort-merge joins, but pre-salting is the general fix: spread each key
  over N deterministic salt buckets on the big side, replicate the
  small side N×, join on (key, salt).
- **salted aggregation** (`salted_sum_count`): two-stage partial
  aggregation for decomposable aggregates over skewed group keys —
  groupBy(key, salt) map-side shrink, then groupBy(key) final merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist *df* as a bucketed+sorted table on *key*. Joins and
    groupBys between tables bucketed on the same key with the same
    bucket count run with ZERO exchanges (see the plan test)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a deterministic salt from
    a hash of the full row (hot keys spread over *salt_buckets* reduce
    tasks); the small side is replicated once per salt value. Result
    rows are identical to the unsalted join — each big row carries
    exactly one salt and each small match exists once per salt.

    Only joins that never emit UNMATCHED small-side rows are allowed:
    a right/full outer join would surface each unmatched small row once
    per salt replica (*salt_buckets* duplicates)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            "rows would appear once per salt replica"
        )
    # deterministic full-row hash: stable under stage recomputation (a
    # positional id like monotonically_increasing_id can move a row to a
    # different salt when a lost map task replays against a reordered
    # parent — the SPARK-23207 duplication/loss class). Limitation:
    # bit-identical duplicate rows share a salt; if a hot key's rows are
    # literal duplicates, aggregate them to weighted rows first.
    big_cols = [F.col(c) for c in big.columns]
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*big_cols), F.lit(salt_buckets)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    cond = (big_s[on] == small_s[on]) & (big_s["_salt"] == small_s["_salt"])
    joined = big_s.join(small_s, cond, how)
    # keep one copy of the join key (from the big side), drop salts
    return joined.drop(small_s[on]).drop(big_s["_salt"]).drop(small_s["_salt"])


def salted_sum_count(
    df: DataFrame, key: str, value: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-stage skew-safe aggregation: sum/count per *key*. Stage 1
    shrinks each (key, salt) group map-side; stage 2 merges the at-most
    *salt_buckets* partials per key — the hot key's work is spread over
    salt_buckets tasks instead of one.

    The salt comes from a per-row unique id, NOT from the value column:
    value-derived salts collapse when a hot key carries few distinct
    values (constant counters), putting the hot key back in one task.
    Sum/count are indifferent to WHICH salt a row gets, so a
    nondeterministic-under-retry id is safe here."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count("*").alias("_pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias(f"sum_{value}"),
        F.sum("_pcnt").alias("n_rows"),
    )


def key_skew_profile(
    df: DataFrame, key: str, top_n: int = 20, hot_threshold: float = 0.01
) -> DataFrame:
    """The diagnostic that decides WHEN to reach for salting/AQE skew
    handling: per-key row share of the would-be shuffle key. Returns
    the *top_n* heaviest keys as
    (key_rank, key_value, n_rows, share_ppm, is_hot) — share in parts
    per million so the output stays integer/exact (a rounded double
    share flips at half-ulp boundaries between engines), ``is_hot`` =
    share above *hot_threshold*.

    Scale shape: one partially-aggregated groupBy on the key, then a
    top-n heap (TakeOrderedAndProject, never a full sort). Run it on a
    sample or a single partition-day at 100 TB — the shape is the same.
    The total row count rides along via a broadcast single-row frame.
    """
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_value",
            "n_rows",
            # exact integer ppm: floor(n * 1e6 / total) — identical in
            # any engine, no float rounding in the hashed output
            F.floor(F.col("n_rows") * 1_000_000 / F.col("_total")).alias("share_ppm"),
        )
        .withColumn("is_hot", F.col("share_ppm") >= int(hot_threshold * 1_000_000))
        .orderBy(F.col("n_rows").desc(), F.col("key_value"))
        .limit(top_n)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key_value"))
    return ranked.withColumn("key_rank", F.row_number().over(w)).select(
        "key_rank", "key_value", "n_rows", "share_ppm", "is_hot"
    )


def sequence_gaps(
    df: DataFrame,
    id_col: str,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Gaps in an integer id sequence — (gap_after, resumes_at,
    n_missing) — WITHOUT a global-ordered window.

    The naive formulation (`lead(id) OVER (ORDER BY id)`) single-
    partitions the entire table (Spark warns `No Partition Defined for
    Window operation`): a completeness audit over a 100 TB fact would
    serialize through one task. Two-level bucketing keeps every window
    bounded:

    1. intra-bucket: partition the window by ``id div bucket_size`` —
       ≤ bucket_size rows per partition, fully parallel; emits gaps
       whose endpoints share a bucket;
    2. seams: a per-bucket (min, max) rollup — n/bucket_size rows —
       ordered by bucket id catches every gap that crosses one or more
       bucket boundaries (empty buckets just widen the seam). The
       summary window is global but over the TINY rollup; recurse the
       same trick if n/bucket_size is ever itself large.

    Each gap is emitted exactly once: intra-bucket if both endpoints
    share a bucket, else by the seam pass. Output is identical to the
    naive global window (equivalence-tested).
    """
    ids = df.select(F.col(id_col).cast("long").alias("id")).withColumn(
        "bucket", F.floor(F.col("id") / bucket_size)
    )
    wb = Window.partitionBy("bucket").orderBy("id")
    intra = (
        ids.withColumn("next_id", F.lead("id").over(wb))
        .filter(F.col("next_id") - F.col("id") > 1)
        .select("id", "next_id")
    )
    summary = ids.groupBy("bucket").agg(
        F.min("id").alias("min_id"), F.max("id").alias("max_id")
    )
    ws = Window.orderBy("bucket")
    seams = (
        summary.withColumn("next_min", F.lead("min_id").over(ws))
        .filter(F.col("next_min") - F.col("max_id") > 1)
        .select(F.col("max_id").alias("id"), F.col("next_min").alias("next_id"))
    )
    return intra.unionByName(seams).select(
        F.col("id").alias("gap_after"),
        F.col("next_id").alias("resumes_at"),
        (F.col("next_id") - F.col("id") - 1).cast("long").alias("n_missing"),
    )


def compaction_bins(
    files: DataFrame,
    size_col: str,
    order_col: str,
    target: int,
    bucket_size: int = 64,
) -> DataFrame:
    """Sequential compaction planning for the small-files problem:
    walk file (or partition) metadata in *order_col* order and assign
    each entry the output bin ``floor(cum_size_before / target)`` —
    consecutive entries coalesce until a bin reaches *target* (a bin
    overflows by at most one entry; true bin packing is NP-hard and
    FFD would reorder by size, destroying the sort-order locality a
    z-ordered/partitioned layout exists to provide).

    Built WITHOUT a global row window (the same two-level shape as
    :func:`sequence_gaps`): the prefix sum decomposes exactly into an
    intra-bucket running sum (window partitioned by
    ``order div bucket_size`` — bounded, parallel) plus a per-bucket
    total offset (global window over the TINY n/bucket_size rollup).
    At 100 TB the metadata table is ~10⁶ rows for 128 MB files — the
    rollup is thousands — but the naive single-partition cumsum is
    exactly the shape that stops being a planning no-op first.

    *order_col* must be numeric and unique per row (a partition index,
    day number, file sequence). Returns the input columns plus
    ``bin_id``.
    """
    if target <= 0:
        raise ValueError("target must be positive")
    f = files.withColumn("_bkt", F.floor(F.col(order_col) / bucket_size))
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum(size_col).over(w_local), F.lit(0))
    totals = f.groupBy("_bkt").agg(F.sum(size_col).alias("_btot"))
    w_seam = (
        Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_btot").over(w_seam), F.lit(0))
    ).select("_bkt", "_boff")
    return (
        f.join(offsets, "_bkt")
        .withColumn(
            "bin_id",
            F.floor((local_before + F.col("_boff")) / target).cast("long"),
        )
        .drop("_bkt", "_boff")
    )
