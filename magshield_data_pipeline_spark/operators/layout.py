"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

Not in the reference (its data lives in a CRM's API); this is the data-
layout lever a 100 TB deployment needs beyond single-key bucketing
(operators/scale.py): sorting a table by ONE key gives perfect file
skipping on that key and none on any other, while interleaving the bits
of TWO (or more) keys into a Morton code and range-partitioning on it
keeps files tight in EVERY interleaved dimension at once — each file's
per-column min/max footer then prunes scans filtered on either key
(the same idea as Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything here is integer bit arithmetic on JVM-side built-ins
(shiftright/bitwiseAND/shiftleft folds — whole-stage codegen, no UDFs),
deterministic and exactly reproducible in any engine, which is what
makes the layout operator oracle-checkable: the registry query asserts
per-bucket min/max envelopes, i.e. the very statistics file skipping
reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints: bit i of ``x`` lands at
    position 2i, bit i of ``y`` at 2i+1 (little-endian interleave).
    ``bits`` caps how many low bits of each input participate — callers
    quantize/clamp inputs to ``[0, 2^bits)`` first."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i + 1)
    return z


def interleave_bits_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical Morton code as ANSI/DuckDB SQL text — generated
    from the same ``bits`` constant so the Spark plan and the oracle
    can never drift (the shared-literal pattern used by the SRP/LSH
    operators)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def interleave_bits_multi(cols: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton code: bit i of dimension d lands at position
    ``i * n_dims + d``. The 2-dim :func:`interleave_bits` is the
    ``n_dims=2`` special case (same bit layout). Use for 3+-key
    layouts (e.g. customer × day × region); cap ``bits × n_dims`` at 63
    so the code fits a signed long."""
    n = len(cols)
    if not cols:
        raise ValueError("interleave_bits_multi needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} dims overflows a signed long")
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(1), i * n + d
            )
    return z


def zorder_bucket(z: Column, bits: int = 16, n_buckets: int = 16) -> Column:
    """Bucket id = the Morton code's top ``log2(n_buckets)`` bits — the
    stand-in for 'which file would this row land in' after a
    range-partitioned write on the z key. n_buckets must be a power of
    two."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 2 * bits - n_buckets.bit_length() + 1
    return F.shiftright(z, shift)


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 16,
) -> DataFrame:
    """Attach a Morton z-key and repartition by its range — the write-
    side layout op: ``zorder_layout(df, "custkey", "day").write...``
    produces files whose per-column min/max footers are tight on BOTH
    keys. Range partitioning samples the z-key distribution, so file
    row counts stay balanced even when the key space is dense in one
    corner (the reason this beats fixed bucket-by-prefix at skew)."""
    with_z = df.withColumn(
        "_zkey", interleave_bits(F.col(x_col), F.col(y_col), bits)
    )
    return with_z.repartitionByRange(n_files, "_zkey")


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_buckets: int = 16,
) -> DataFrame:
    """Per-z-bucket envelope statistics — exactly what a file-skipping
    scan reads from footers: row count and each dimension's min/max per
    bucket. Tight (non-overlapping) envelopes are the proof the layout
    prunes; one partially-aggregated groupBy, no sort, no shuffle
    beyond the 16-group exchange."""
    z = interleave_bits(F.col(x_col), F.col(y_col), bits)
    return (
        df.select(
            zorder_bucket(z, bits, n_buckets).alias("bucket"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
