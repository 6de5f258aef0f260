"""Mergeable frequency sketches (SURVEY §2.10 [EXT] — training-data tier).

Count-Min Sketch (Cormode & Muthukrishnan 2005): a depth×width grid of
counters; each key increments one counter per depth row (row chosen by
an independent hash), and a key's frequency estimate is the MIN of its
depth counters — always an OVERestimate (collisions only add), with
error ≤ εN at probability 1−δ for width=e/ε, depth=ln(1/δ).

Why this matters at 100 TB: like the HLL pattern
(plans/window_queries.py `sharded_hll_union`), the sketch is MERGEABLE —
per-shard/per-day sketches sum cell-wise into the global sketch, so
frequency questions ("how often does this token/URL/fingerprint occur
corpus-wide?") never re-scan raw data. The sketch is a fixed
depth×width table (here 4×128 = 512 longs) regardless of input size.

Cross-engine determinism: the row hash is an md5 prefix (both engines
compute identical md5), mapped to a bucket via the first 4 hex nibbles
mod width — integer arithmetic end-to-end, so sketch cells and
estimates hash-match exactly (no float tolerance needed, unlike HLL
whose sketch bytes are engine-specific).

Reference parity: the reference has no sketch tier (its counts are
exact pandas groupbys, e.g. get_lead_statuses — magshield_data_pipeline/utils.py);
this is the [EXT] scale path for the same "frequency of key" question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 128


def cms_bucket(key: Column, d: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of *key* in depth row *d*: first 16 bits of
    md5(f"{d}|{key}") mod width. Seeding by prefixing the depth index
    gives depth pairwise-independent-enough hash rows from one md5."""
    nib = F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}|"), key)), 1, 4), 16, 10)
    return (nib.cast("long") % width).alias(f"bucket_{d}")


def cms_bucket_sql(key_expr: str, d: int, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of :func:`cms_bucket` (DuckDB has no conv(); the hex
    prefix is decoded nibble-by-nibble like the simhash oracle)."""
    nibs = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{d}|' || {key_expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({nibs}) % {width})"


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
    shard_col: Column | None = None,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) — at most depth×width rows.

    One scan: each input row fans out to *depth* (d, bucket) cells via
    a literal-array explode (no join, no extra scan), then ONE
    partial-aggregated groupBy. The map-side combine collapses every
    task's contribution to ≤ depth×width cells before the exchange, so
    the shuffle carries O(depth×width × n_tasks) rows no matter how
    many input rows — the whole point of a sketch.

    *weight_col* turns it into a weighted-count sketch (e.g. bytes per
    URL instead of occurrences). *shard_col* keys the output by a shard
    expression too — (shard, d, bucket, cnt), one sketch per shard from
    the SAME single scan (the materialize-per-partition shape a 100 TB
    pipeline stores; :func:`cms_merge` folds them back).
    """
    key = F.col(key_col).cast("string")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cols = [
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
        w.alias("w"),
    ]
    group = [F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket")]
    if shard_col is not None:
        cols.insert(0, shard_col.alias("shard"))
        group.insert(0, F.col("shard"))
    return df.select(*cols).groupBy(*group).agg(F.sum("w").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union per-shard sketches into the global one: cell-wise sum.
    Linearity of the counters is what makes the sketch mergeable —
    sketch(A ∪ B) = sketch(A) + sketch(B) exactly (not approximately)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each row of *keys*: est = min over
    depth rows of the key's cell. The sketch (≤ depth×width rows)
    broadcasts; estimating N keys is N×depth lookups against it — no
    shuffle of the key side at all."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        # an absent cell means nothing ever hashed there → count 0
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )
