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
    gives depth pairwise-independent-enough hash rows from one md5.

    Null-safe: ``concat_ws`` folds a null key to the bare depth prefix
    (a real, countable bucket) instead of a null bucket — a plain
    concat would hash null keys to null cells that the estimate join
    can never find, silently UNDERestimating null-key frequency and
    breaking the est ≥ exact guarantee."""
    h = F.md5(F.concat_ws("|", F.lit(str(d)), key))
    nib = F.conv(F.substring(h, 1, 4), 16, 10)
    return (nib.cast("long") % width).alias(f"bucket_{d}")


def cms_bucket_sql(key_expr: str, d: int, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of :func:`cms_bucket` (DuckDB has no conv(); the hex
    prefix is decoded nibble-by-nibble like the simhash oracle).
    ``concat_ws`` mirrors the null-key folding."""
    md5 = f"md5(concat_ws('|', '{d}', {key_expr}))"
    nibs = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1)"
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


# ---------------------------------------------------------------------------
# K-Minimum-Values (KMV) distinct sketch with set-operation support
# (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007)

KMV_K = 64


def kmv_hash(key: Column) -> Column:
    """Uniform hash for KMV: md5 hex of the stringified key. Fixed-width
    hex compares lexicographically == numerically, so 'k smallest
    hashes' is a plain string sort — exact in both engines.

    Null-safe via ``concat_ws``: a null key hashes the bare salt (one
    real value — null IS one distinct value to a distinct-counter). A
    plain concat would produce a null hash, which sorts NULLS FIRST in
    Spark but NULLS LAST in DuckDB — a silent cross-engine sketch
    divergence the moment a null key appears."""
    return F.md5(F.concat_ws("|", F.lit("kmv"), key.cast("string")))


def kmv_hash_u(h: Column) -> Column:
    """Map a kmv hash to U ∈ (0, 1]: first 32 bits / 2^32 — exact
    integer-to-double arithmetic (cross-engine identical). A zero
    prefix yields null (nullif guard) rather than a div-by-zero
    downstream; P(zero) = 2^-32 per hash."""
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    return F.nullif(v, F.lit(0.0)) / F.lit(4294967296.0)


def kmv_hash_u_sql(h_expr: str) -> str:
    """DuckDB twin of :func:`kmv_hash_u` (nibble-decode like the CMS /
    E-S oracles)."""
    nibs = " + ".join(
        f"(strpos('0123456789abcdef', substr({h_expr}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}.0"
        for i in range(8)
    )
    return f"(nullif(({nibs}), 0.0) / 4294967296.0)"


def kmv_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """The KMV sketch per group: the k smallest DISTINCT key hashes —
    (group, h, rn). Fixed k rows per group regardless of group size
    (WindowGroupLimit prunes to k map-side before the exchange), and
    the sketch MERGES: the union's sketch is the k smallest of the
    concatenated sketches — which is why KMV supports intersections
    (Beyer et al.) where HLL supports only unions.

    Distinct estimate from a sketch: (k-1)/U(h_k) when the group has
    ≥ k distinct keys, else the sketch IS the exact distinct set.
    """
    from pyspark.sql.window import Window

    hashes = df.select(
        F.col(group_col).alias("segment"),
        kmv_hash(F.col(key_col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("segment").orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def kmv_pair_overlap(kmv: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise segment overlap from KMV sketches ALONE — no rescan of
    raw data. For each segment pair (a < b): merge the two sketches
    (k smallest of the union), count merged-k hashes present in BOTH
    input sketches (`matched`), and estimate

    - union distinct:  (k-1)/U(h_k), or the exact merged count when
      the union carries fewer than k hashes (the standard KMV small-set
      degeneration — the sketch IS the set);
    - Jaccard: matched / |merged-k|;
    - intersection: Jaccard × union.

    All arithmetic runs on identical operands in both engines (exact
    integer-derived doubles), so results are engine-reproducible;
    output rounding is hygiene, not a tolerance. Scale: the sketch
    table is k rows per segment — pairs×k rows total, driver-free and
    broadcastable for any realistic segment count; the quadratic pair
    blowup is in SEGMENTS (small), never in keys.
    """
    from pyspark.sql.window import Window

    # the sketch frame feeds three consumers (segment list + both pair
    # sides) — persist so the distinct + ranked sketch build runs once
    # (caller-owned lifetime, the srp/jaccard contract)
    kmv = kmv.persist()
    segs = kmv.select("segment").distinct()
    pairs = (
        segs.select(F.col("segment").alias("seg_a"))
        .crossJoin(segs.select(F.col("segment").alias("seg_b")))
        .filter(F.col("seg_a") < F.col("seg_b"))
    )
    side = kmv.select("segment", "h")
    ha = pairs.join(
        F.broadcast(side), F.col("segment") == F.col("seg_a")
    ).select("seg_a", "seg_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    hb = pairs.join(
        F.broadcast(side), F.col("segment") == F.col("seg_b")
    ).select("seg_a", "seg_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ha.unionByName(hb)
        .groupBy("seg_a", "seg_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("seg_a", "seg_b").orderBy("h")
    topk = merged.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )
    agg = topk.groupBy("seg_a", "seg_b").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("matched"),
        F.max(F.when(F.col("rn") == k, kmv_hash_u(F.col("h")))).alias("u_k"),
    )
    union_est = F.when(
        F.col("n_k") < k, F.col("n_k").cast("double")
    ).otherwise((F.lit(float(k - 1))) / F.col("u_k"))
    jac = F.col("matched").cast("double") / F.col("n_k")
    return agg.select(
        "seg_a",
        "seg_b",
        "n_k",
        "matched",
        F.round(union_est, 4).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 4).alias("intersection_est"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (r9): the bounded-memory top-k classic


def misra_gries_candidates(
    df: DataFrame,
    key_col: str,
    k: int = 16,
    emit_partition_totals: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries summaries (Misra & Gries 1982): k
    counters per partition — increment a tracked key, evict-by-global-
    decrement when a new key arrives with all counters full.  Returns
    (key, mg_count) candidate rows, at most k per input partition.

    The guarantee that makes it a CANDIDATE GENERATOR: a key with true
    partition frequency > n_p/(k+1) always survives its partition's
    summary, and a globally-heavy key (freq > N/k) is heavy in at
    least one partition by pigeonhole — so the union of summaries is a
    SUPERSET of the global heavy hitters whatever the partitioning.
    Callers verify candidates with one exact counting pass over the
    (tiny, broadcastable) candidate set — the standard two-pass
    heavy-hitters protocol.

    100 TB shape: state is k counters per task REGARDLESS of key
    cardinality (unlike an exact groupBy, whose shuffle carries every
    distinct key); the output is ≤ k×partitions rows.  Arrow
    mapInPandas, dict state maintained across the partition's batches
    — no shuffle until the trivially small candidate rollup.

    ``emit_partition_totals=True`` appends ONE extra row per partition
    with ``key = NULL`` and ``mg_count = rows seen`` — the global N
    the heavy-hitter threshold needs, gathered in the SAME pass so the
    two-pass protocol really is two scans (keys are never emitted as
    NULL: null inputs are skipped, so the sentinel cannot collide)."""
    if k < 1:
        raise ValueError(f"misra_gries_candidates: k must be >= 1, got {k}")
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("mg_count", LongType()),
        ]
    )

    def gen(batches):
        import pandas as _pd

        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            for key in pdf[key_col]:
                if key is None:
                    continue
                seen += 1
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:  # global decrement — the MG eviction step
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        rows = list(counters.items())
        if emit_partition_totals:
            rows.append((None, seen))
        if rows:
            yield _pd.DataFrame(rows, columns=["key", "mg_count"]).astype(
                {"mg_count": "int64"}
            )
        else:
            yield _pd.DataFrame(
                {"key": _pd.Series(dtype="object"),
                 "mg_count": _pd.Series(dtype="int64")}
            )

    return df.select(key_col).mapInPandas(gen, schema)
