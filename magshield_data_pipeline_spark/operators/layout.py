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


# ---------------------------------------------------------------------------
# Hilbert curve — the locality-optimal space-filling alternative to Morton


def with_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "_hkey",
) -> DataFrame:
    """Append the 2-D Hilbert-curve index of (x, y) ∈ [0, 2^bits)².

    Why beside Morton: consecutive Hilbert indexes are ALWAYS
    Manhattan-adjacent cells (property-tested), while the Morton curve
    jumps across the plane at power-of-two boundaries — so Hilbert
    range-partitioned files have strictly tighter worst-case
    per-dimension envelopes, at the cost of a more complex key
    computation. Same write-side usage as `zorder_layout`:
    repartitionByRange on the key.

    The standard per-level reflect+rotate recurrence (Hamilton's
    algorithm as popularized in Warren, Hacker's Delight §16; the
    Wikipedia `xy2d` form) runs bits levels, each a constant bundle of
    integer CASE/AND/XOR expressions. Levels chain through
    `withColumns` PROJECTIONS, not nested expressions — each level
    references the previous level's named columns once, keeping the
    plan linear in `bits` (naive expression nesting doubles the tree
    per level: 2^bits nodes by level 16). All integer arithmetic —
    engine-exact, whole-stage-codegen friendly, no UDFs.
    """
    out = df.withColumns(
        {
            "_hx": F.col(x_col).cast("long"),
            "_hy": F.col(y_col).cast("long"),
            out_col: F.lit(0).cast("long"),
        }
    )
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        out = out.withColumns(
            {
                out_col: F.col(out_col)
                + F.lit(s).cast("long")
                * F.lit(s)
                * (F.lit(3) * rx).bitwiseXOR(ry).cast("long"),
                # reflect (rx==1) then swap, only in the ry==0 half
                "_hx": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                        F.col("_hy")
                    ),
                ).otherwise(F.col("_hx")),
                "_hy": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                        F.col("_hx")
                    ),
                ).otherwise(F.col("_hy")),
            }
        )
    return out.drop("_hx", "_hy")


def hilbert_sql_ctes(bits: int = 16) -> str:
    """The identical Hilbert recurrence as chained SQL CTEs (one per
    level, mirroring the withColumns projections), starting from a CTE
    named ``dims(x, y)`` and ending in ``h0(x, y, hkey)``. Generated
    from the same ``bits`` constant as :func:`with_hilbert` so plan and
    oracle cannot drift."""
    ctes = [
        "h_init AS (SELECT x, y, CAST(x AS BIGINT) AS hx, "
        "CAST(y AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hkey FROM dims)"
    ]
    prev = "h_init"
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        name = f"h{k}"
        ctes.append(
            f"{name} AS (SELECT x, y,\n"
            f"  hkey + {s} * {s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hkey,\n"
            f"  CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - hy ELSE hy END ELSE hx END AS hx,\n"
            f"  CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - hx ELSE hx END ELSE hy END AS hy\n"
            f"FROM {prev})"
        )
        prev = name
    ctes.append(f"h0_out AS (SELECT x, y, hkey FROM {prev})")
    return ",\n".join(ctes)


def hilbert_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_buckets: int = 16,
) -> DataFrame:
    """Per-Hilbert-bucket envelope statistics — the same footer-style
    (n_rows, per-dim min/max) readout as `zorder_bucket_stats`, over
    the Hilbert key's top bits. Comparing the two tables on the same
    dims shows Hilbert's tighter envelopes directly."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 2 * bits - n_buckets.bit_length() + 1
    keyed = with_hilbert(
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y")),
        "x", "y", bits,
    )
    return (
        keyed.select(
            F.shiftright(F.col("_hkey"), shift).alias("bucket"), "x", "y"
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
