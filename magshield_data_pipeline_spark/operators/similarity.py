"""Similarity search over embedding columns (SURVEY §2.10 [EXT]).

Two tiers:

- **brute-force top-k** (`brute_force_topk`): the correctness baseline.
  The query set broadcasts (it is always the small side); the corpus
  streams through one scan computing cosine per (query, vector) pair,
  then a per-query top-k window. No shuffle of the corpus beyond the
  window's partition-by-query exchange — at 100 TB the scan dominates
  and parallelizes perfectly.
- **IVF (inverted-file) top-k** (`ivf_topk`): the scale path. Vectors
  are assigned to their nearest centroid once (broadcast centroids, one
  scan); a query then probes only its own centroid's cluster, cutting
  compared pairs by ~n_clusters×. Centroid choice is pluggable — here a
  deterministic subset of the data stands in for k-means output, which
  keeps the operator oracle-checkable; swap in real centroids without
  touching the plan shape.

All vector math is JVM-side higher-order functions (zip_with/aggregate
fold) over `array<double>` — no Python UDFs. Arrays are cast
float→double first so scores are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double_vec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to *decimals* — rounding BEFORE any
    ordering is what keeps top-k ranks engine-reproducible (last-ulp
    float noise cannot flip an order on a rounded key). A zero vector
    (padding / failed-encode sentinel) scores null, not an abort —
    matching cosine_arrow's behavior under any ANSI setting."""
    denom = F.nullif(norm(a) * norm(b), F.lit(0.0))
    return F.round(dot(a, b) / denom, decimals)


def normalize_vec(a: Column) -> Column:
    """Unit-normalize once per VECTOR so pair scoring is a plain dot
    product — at scale the pair join dominates, and cosine-per-pair
    recomputes both norms for every pair (3 array folds/pair vs 1).
    Zero vectors normalize to an all-null vector (→ null scores), not
    a division error."""
    n = F.nullif(norm(a), F.lit(0.0))
    return F.transform(a, lambda x: x / n)


def dot_score(a: Column, b: Column, decimals: int = 6) -> Column:
    """Rounded dot product — cosine when both sides are pre-normalized."""
    return F.round(dot(a, b), decimals)


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization: q_i = floor(x_i · 127 / max|x| + ½).

    The memory lever for ANN at 100 TB: an int8 corpus is 4× smaller
    than float32 (8× vs double), and the pair score becomes an integer
    dot product — exact arithmetic, no float accumulation order to
    worry about. A zero/null-max vector quantizes to nulls (callers
    filter null scores), mirroring the nullif-guarded cosine.

    Cross-engine note: feed this ROUNDED values (e.g. unit-normalized
    then round(x, 6)) — multiply/divide/floor are IEEE exactly-rounded,
    so on identical inputs the quantized codes are bit-identical in
    Spark and DuckDB; unrounded normalize folds could differ in the
    last ulp and flip a floor boundary."""
    m = F.nullif(F.array_max(F.transform(vec, F.abs)), F.lit(0.0))
    return F.transform(vec, lambda x: F.floor(x * 127.0 / m + 0.5).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two quantized vectors — exact (no float
    rounding), null if either side carries nulls."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_arrow(a: Column, b: Column, decimals: int = 6) -> Column:
    """Arrow-vectorized cosine via a pandas UDF — the alternative hot
    path when vectors are wide enough that per-element Catalyst
    expression folds lose to numpy BLAS (the JVM path wins for short
    vectors; measure per workload). Batches move driver→worker as Arrow
    columns, 10-100× cheaper than row-at-a-time Python UDFs.

    The UDF body is self-contained (local imports, no package
    references): executor workers don't share the driver's sys.path.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(xs, ys):  # pd.Series of list<float> → pd.Series of double
        import numpy as _np
        import pandas as _pd

        out = []
        for x, y in zip(xs, ys):
            xa = _np.asarray(x, dtype=_np.float64)
            ya = _np.asarray(y, dtype=_np.float64)
            denom = _np.sqrt((xa * xa).sum()) * _np.sqrt((ya * ya).sum())
            out.append(round(float(xa.dot(ya) / denom), decimals) if denom else None)
        return _pd.Series(out, dtype="float64")

    return _cos(a, b)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    impl: str = "sql",
) -> DataFrame:
    """Top-k nearest corpus vectors per query vector by cosine.

    *queries* is broadcast (the small side by construction); self-matches
    (same id) are excluded. Ties on the rounded score break by vec_id so
    the result is a total order. ``impl``: 'sql' computes the dot
    product with JVM higher-order functions; 'arrow' routes it through
    the vectorized pandas UDF (identical results — see the parity test).
    """
    score_fn = cosine if impl == "sql" else cosine_arrow
    corpus = emb.select(F.col(id_col), as_double_vec(vec_col).alias("v"))
    qs = queries.select(
        F.col(query_id_col), as_double_vec(query_vec_col).alias("qv")
    )
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            score_fn(F.col("v"), F.col("qv")).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid_id, v) — each vector assigned to its
    highest-cosine centroid (ties → lowest centroid id). Centroids
    broadcast; one corpus scan. The returned ``v`` is UNIT-NORMALIZED:
    normalization happens once per vector here, so every downstream
    pair/probe scoring is a single dot-product fold."""
    corpus = emb.select(
        F.col(id_col), normalize_vec(as_double_vec(vec_col)).alias("v")
    )
    cents = centroids.select(
        F.col(id_col).alias("centroid_id"),
        normalize_vec(as_double_vec(vec_col)).alias("cv"),
    )
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        id_col,
        "v",
        "centroid_id",
        dot_score(F.col("v"), F.col("cv")).alias("cscore"),
    )
    # argmax as an aggregation, NOT a ranking window: max_by over a
    # lexicographic struct key ((cscore, -centroid_id) → best score,
    # ties to lowest centroid id). Partial aggregation collapses each
    # map task's C candidates per vector before the exchange, so the
    # shuffle carries ~N rows instead of N×C — and no sort at all.
    best = F.max_by(
        F.struct(F.col("centroid_id"), F.col("v")),
        F.struct(F.col("cscore"), (-F.col("centroid_id")).alias("tie")),
    )
    return (
        scored.groupBy(id_col)
        .agg(best.alias("_best"))
        .select(id_col, F.col("_best.centroid_id"), F.col("_best.v").alias("v"))
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: probe only the query's own cluster
    (nprobe=1; raise by joining more clusters per query — plan shape is
    identical). Returns (query_id, vec_id, score, rank)."""
    assigned = assign_clusters(emb, centroids, id_col, vec_col)
    q_assigned = (
        assign_clusters(
            queries.select(
                F.col(query_id_col).alias(id_col), F.col(vec_col)
            ),
            centroids,
            id_col,
            vec_col,
        )
        .select(
            F.col(id_col).alias(query_id_col),
            F.col("centroid_id"),
            F.col("v").alias("qv"),
        )
    )
    scored = (
        assigned.join(F.broadcast(q_assigned), "centroid_id")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            # both sides pre-normalized by assign_clusters → plain dot
            dot_score(F.col("v"), F.col("qv")).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


# ---------------------------------------------------------------------------
# Signed-random-projection (SRP) LSH — the hash-bucketed ANN scale path


def srp_hyperplanes(
    n_bands: int = 4, rows_per_band: int = 8, dim: int = 64, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic random hyperplanes for SRP-LSH, shaped
    [band][row][dim]. Components are drawn from a seeded PRNG and
    rounded to 6 decimals so the SAME literal values embed exactly into
    both the Spark plan and the DuckDB oracle SQL (the established
    constant-sharing pattern that keeps hash operators oracle-checkable).
    """
    import random

    rnd = random.Random(seed)
    return [
        [[round(rnd.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(rows_per_band)]
        for _ in range(n_bands)
    ]


def srp_band_buckets(
    df: DataFrame,
    planes: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket): each band's bucket packs the sign bits of the
    vector's dot products with that band's hyperplanes. Two vectors with
    cosine similarity s agree on one plane with probability 1 - θ/π
    (θ = arccos s), so near-parallel vectors collide in some band with
    high probability while the corpus spreads uniformly — the same
    banded-join shape as MinHash LSH (operators/dedup.py), applied to
    dense vectors. One projection scan, no shuffle here; the candidate
    join downstream is the only wide op.

    Dot signs are taken on values rounded to 6 decimals (cross-engine
    IEEE parity: both engines fold the product sum sequentially, and
    rounding absorbs any last-ulp noise before the sign decision).
    """
    v = as_double_vec(vec_col)
    buckets = []
    for rows in planes:
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(rows):
            plane_lit = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(F.round(dot(v, plane_lit), 6) >= 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            bucket = bucket + bit
        buckets.append(bucket.cast("long"))
    # ALL band buckets come out of ONE projection (a per-band union
    # would re-scan the source once per band); posexplode unpivots the
    # bucket array to (band, bucket) rows with band = array position
    return df.select(
        F.col(id_col),
        F.posexplode(F.array(*buckets)).alias("band", "bucket"),
    )


def srp_candidate_pairs(
    df: DataFrame,
    planes: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct candidate near-neighbor pairs: vectors sharing any
    band's bucket. The self-join keys on (band, bucket) — bounded
    bucket population, never all-pairs — and the distinct collapses
    multi-band collisions. Verify candidates with exact cosine
    downstream (the SRP analog of minhash→jaccard verification)."""
    # both self-join sides read the bucket projection; persist so the
    # 32-fold dot computation runs once (cache lifetime caller-owned,
    # CacheManager dedups by plan — same contract as jaccard_pairs)
    b = srp_band_buckets(df, planes, id_col, vec_col).persist()
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"), F.col(f"b.{id_col}").alias("vec_b")
        )
        .distinct()
    )


def srp_multiprobe_topk(
    emb: DataFrame,
    queries: DataFrame,
    planes: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    use_q20_index: bool = True,
) -> DataFrame:
    """Multi-probe SRP-LSH retrieval (Lv et al., VLDB 2007 applied to
    sign-random-projection): each query probes its own (band, bucket)
    PLUS every bucket at Hamming distance 1 within the band (one sign
    bit flipped — the buckets a near-neighbor most likely fell into
    when one dot product straddled zero). Recall rises the way adding
    hash tables would, WITHOUT re-indexing or multiplying the corpus
    index: the corpus side stays one bucket row per (vector, band);
    only the tiny query side fans out ×(1 + rows_per_band).

    Candidates then verify with exact cosine and rank to top-k (ties
    to lowest id) — the SRP→verify composition with a widened net.
    Returns (query_id, vec_id, score, rank).

    Scale: corpus bucket index is one projection scan (reusable across
    query batches — persist it); the probe join is equi on
    (band, bucket) with bounded bucket population; exact cosine runs
    per CANDIDATE only, and vectors re-attach by id. The structural
    guarantee `multiprobe candidates ⊇ single-probe candidates` is
    tested (the original bucket is always probed).
    """
    rows_per_band = len(planes[0])
    # index choice: the Catalyst float-sign projection (oracle-classic)
    # or the vectorized q20 integer-sign index (the production path —
    # see srp_band_buckets_q20_arrow; boundary caveat documented there)
    index = srp_band_buckets_q20_arrow if use_q20_index else srp_band_buckets
    corpus = index(emb, planes, id_col, vec_col)
    qb = index(
        queries.select(F.col(query_id_col).alias(id_col), F.col(vec_col)),
        planes, id_col, vec_col,
    ).select(F.col(id_col).alias(query_id_col), "band", "bucket")
    probe_list = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i))
            for i in range(rows_per_band)
        ],
    )
    probes = qb.select(
        query_id_col, "band", F.explode(probe_list).alias("bucket")
    )
    cand = (
        probes.join(corpus, ["band", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col)
        .distinct()
    )
    vecs = emb.select(F.col(id_col), as_double_vec(vec_col).alias("v"))
    qvecs = queries.select(
        F.col(query_id_col), as_double_vec(vec_col).alias("qv")
    )
    scored = (
        cand.join(vecs, id_col)
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(F.col("v"), F.col("qv")).alias("score"),
        )
        # zero vectors score null (guarded cosine) and are unrankable:
        # drop them BEFORE the window so ranks agree with any engine's
        # null-ordering convention
        .filter(F.col("score").isNotNull())
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def srp_verified_pairs(
    df: DataFrame,
    planes: list[list[list[float]]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_q20_index: bool = True,
) -> DataFrame:
    """SRP candidates verified with EXACT cosine ≥ *threshold* — the
    end-to-end hash-bucketed semantic-dedup pipeline, mirroring the
    minhash→jaccard composition (operators/dedup.py): the LSH stage
    bounds the pair count, the verify stage removes false positives.

    Returns (vec_a, vec_b, score). Scale: the candidate set is the only
    pair-shaped frame — the two vector joins re-attach embeddings by id
    (shuffle on id, AQE-sized), and the cosine fold runs once per
    CANDIDATE, never per corpus pair. Scores are rounded to 6 decimals
    before the threshold so the filter decision is engine-reproducible.

    The DEFAULT index is the vectorized q20 integer-sign bucket scan
    (:func:`srp_band_buckets_q20_arrow` — ~5× less CPU than the 32-fold
    Catalyst float projection, measured at sf0.1; decision-boundary
    caveat documented there). The float index stays available
    (``use_q20_index=False``) as the oracle-classic sibling for
    equivalence tests; the VERIFY stage is index-independent, so the
    only output difference is candidates whose dot sits within ~2⁻²¹
    of a hyperplane.
    """
    cand_fn = srp_candidate_pairs_q20 if use_q20_index else srp_candidate_pairs
    cand = cand_fn(df, planes, id_col, vec_col)
    vecs = df.select(F.col(id_col), as_double_vec(vec_col).alias("v"))
    return (
        cand.join(vecs.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va")), "vec_a")
        .join(vecs.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("va"), F.col("vb")).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-shaped) and one-pass Gram/covariance matrix


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Cluster-blocked semantic deduplication (the SemDeDup shape,
    Abbas et al. 2023): assign every vector to its nearest centroid,
    compare pairs ONLY within a cluster, and drop any vector that has a
    same-cluster neighbor with cosine ≥ *threshold* and a smaller id.

    Returns every input id with its verdict:
    ``(vec_id, centroid_id, kept)`` — survivors are ``kept``, and
    anti-joining the corpus against ``kept = false`` ids is the dedup.

    Survivor policy (documented, deliberately non-iterative): drop b
    iff ∃ a < b in b's cluster with sim(a,b) ≥ t. One pass — pair
    join, aggregate, anti-join — unlike greedy-sequential SemDeDup
    (which skips comparisons against already-dropped items and cannot
    be expressed without per-cluster sequential state). Near-dup SETS
    can lose more than greedy keeps (if a~b, a~c but b≁c, greedy keeps
    {a,c}, this keeps {a}); for dedup that is the conservative
    direction, and the min-id survivor matches exact_dedup's convention
    (operators/dedup.py).

    Scale: centroid assignment is one broadcast scan
    (:func:`assign_clusters`); the pair join keys on centroid_id so
    compared pairs shrink ~n_clusters× vs all-pairs (the blocking that
    makes embedding dedup feasible at 100 TB — same reason LSH bands
    block minhash). Dropped-id set stays distributed end-to-end
    (left_anti join, no collect).

    Hot-cluster cap: AQE's skew-join split rebalances *partitions*,
    not the O(n²_cluster) pair count — a degenerate centroid set (one
    centroid, or heavily skewed assignment) would silently degrade the
    blocked join toward all-pairs. With *max_cluster_size* set, any
    cluster above the cap is sub-split by a uniform id hash into
    ceil(n/cap) sub-blocks and pairs are compared within a sub-block
    only, so pair cost per original cluster drops from n² to ~n·cap.
    Sub-splitting REFINES the (already approximate) blocking: pairs
    landing in different sub-blocks of a hot cluster are not compared
    — the conservative direction for a guard (misses dups, never
    invents them), and exactly SemDeDup's own tradeoff when it caps
    k-means cluster sizes. Clusters at or under the cap are untouched
    (ceil(n/cap) = 1 ⇒ sub id 0 for every member), so enabling the
    guard with a cap no cluster exceeds is a plan-only change with a
    bit-identical result — which is how the registry query keeps its
    oracle while exercising the guard code path.
    """
    # the assignment frame feeds BOTH self-join sides and the final
    # verdict select — without persist each consumer re-runs the full
    # corpus scan + centroid scoring (3× the one pass this operator
    # advertises). Cache lifetime is caller-owned, same contract as
    # srp_candidate_pairs/jaccard_pairs (CacheManager dedups by plan;
    # bench/oracle harness release caches between queries).
    assigned = assign_clusters(emb, centroids, id_col, vec_col).persist()
    paired = assigned
    if max_cluster_size is not None:
        if max_cluster_size <= 0:
            raise ValueError("max_cluster_size must be positive")
        # tiny rollup (one row per centroid) — AQE broadcasts it; the
        # sub id derives from a uniform hash of the row id so a hot
        # cluster splits evenly even under adversarial id patterns
        sizes = assigned.groupBy("centroid_id").agg(
            F.ceil(
                F.count(F.lit(1)) / F.lit(float(max_cluster_size))
            ).alias("_nsub")
        )
        paired = assigned.join(F.broadcast(sizes), "centroid_id").withColumn(
            "_sub", F.pmod(F.xxhash64(F.col(id_col)), F.col("_nsub"))
        )
    a, b = paired.alias("a"), paired.alias("b")
    same_block = F.col("a.centroid_id") == F.col("b.centroid_id")
    if max_cluster_size is not None:
        same_block = same_block & (F.col("a._sub") == F.col("b._sub"))
    dropped = (
        a.join(
            b,
            same_block & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(dot_score(F.col("a.v"), F.col("b.v")) >= threshold)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def gram_matrix(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle Gram matrix G[i,j] = Σ_rows v_i·v_j in ONE pass —
    the d×d sufficient statistic behind PCA / whitening / covariance of
    an embedding corpus. Each row expands to its d(d+1)/2 upper-
    triangle products via nested array transforms (JVM-side, no UDF),
    then one partial-aggregated groupBy (i, j) sums them: every map
    task collapses to ≤ d(d+1)/2 cells before the exchange, so the
    shuffle is O(d² × n_tasks) regardless of row count — the same
    fixed-size-summary shape as the CMS/HLL sketches. The driver-side
    eigendecomposition of a d×d matrix (d = 64 here) is trivial; the
    distributed part is exactly this aggregation.

    Cross-engine float discipline: each product is rounded to 6
    decimals BEFORE summation, so the true cell total is a multiple of
    1e-6, and the output rounds to the SAME 6 decimals — identity
    rounding whose half-quantum slack (5e-7) summation-order noise
    (~1e-12) can never cross (the registry's money-sum convention;
    rounding COARSER would be unsafe, since a multiple of 1e-6 lands
    exactly on a coarser .5 boundary for ~1% of cells and float error
    would then decide the direction). float32×float32 is exact in
    double, so the pre-round products are themselves identical across
    engines.

    Output: (i, j, g, n_rows) with 0-based i ≤ j.

    Measured alternative (rejected): a single wide aggregate of
    d(d+1)/2 sum expressions avoids the explode but plans ~18 s and
    runs 2× slower at sf0.1 — 2080 aggregation buffers defeat codegen
    and bloat the task binary to ~6 MB. The explode+rollup keeps one
    small generic buffer per cell and stays inside whole-stage
    codegen; :func:`gram_matrix_arrow` is the BLAS path beyond that.
    """
    v = as_double_vec(vec_col)
    pairs = F.flatten(
        F.transform(
            v,
            lambda x, i: F.transform(
                F.slice(v, i + 1, F.size(v) - i),
                lambda y, k: F.struct(
                    i.alias("i"),
                    (i + k).alias("j"),
                    F.round(x * y, 6).alias("p"),
                ),
            ),
        )
    )
    return (
        emb.select(F.explode(pairs).alias("c"))
        .groupBy(
            F.col("c.i").cast("int").alias("i"),
            F.col("c.j").cast("int").alias("j"),
        )
        .agg(
            F.round(F.sum("c.p"), 6).alias("g"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance LUT scoring


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential fold — both engines evaluate
    (((0+(a1-b1)²)+(a2-b2)²)+…) left-to-right on exact double inputs
    (0.0+x is exact), so the result is bit-identical cross-engine for
    float32-derived values; no rounding needed for comparisons."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vector_chunks(
    df: DataFrame, m: int, subdim: int, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, s, chunk): split each vector into m contiguous subvectors
    of subdim dims — one posexplode, zero shuffle."""
    v = as_double_vec(vec_col)
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(v, s * subdim + 1, subdim),
    )
    return df.select(F.col(id_col), F.posexplode(chunks).alias("s", "chunk"))


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    subdim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding (Jégou et al., TPAMI 2011): each vector becomes m
    small code ids — the code table is ~m bytes/vector vs 4·d bytes of
    float32, a 32× memory compression at (m=8, d=64, 256-entry
    codebooks). *codebook* rows are full vectors whose per-subspace
    chunks form each subspace's code entries (a deterministic data
    subset stands in for trained k-means codebooks here, exactly like
    `ivf_topk`'s centroids — swap in trained ones plan-unchanged).

    Assignment: argmin squared-L2 per (vector, subspace), ties to the
    lowest code id, via one broadcast join + min_by partial aggregate —
    the same single-scan shape as :func:`assign_clusters`. This is the
    ONE pass that touches full vectors; every later query runs against
    codes only. Returns (id, s, code_id).
    """
    # fail loud on a dim mismatch: a vector shorter than m*subdim
    # slices into a ragged last chunk whose zip_with pads nulls —
    # silently wrong codes. raise_error fires only on offending rows.
    def _guarded(chunked):
        return chunked.withColumn(
            "chunk",
            F.when(F.size("chunk") == subdim, F.col("chunk")).otherwise(
                F.raise_error(
                    F.lit(
                        f"pq_encode: vector dim is not m*subdim = {m}*{subdim}"
                    )
                )
            ),
        )

    chunks = _guarded(vector_chunks(emb, m, subdim, id_col, vec_col))
    cchunks = _guarded(vector_chunks(codebook, m, subdim, id_col, vec_col)).select(
        F.col("s"), F.col(id_col).alias("code_id"), F.col("chunk").alias("cchunk")
    )
    scored = chunks.join(F.broadcast(cchunks), "s").select(
        id_col,
        "s",
        "code_id",
        # rounding is defensive only: the sequential fold is already
        # bit-identical cross-engine (see l2sq)
        F.round(l2sq(F.col("chunk"), F.col("cchunk")), 9).alias("dist"),
    )
    best = F.min_by(F.col("code_id"), F.struct(F.col("dist"), F.col("code_id")))
    return scored.groupBy(id_col, "s").agg(best.alias("code_id"))


def pq_topk(
    emb: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    subdim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC):
    precompute, per query, the dot product of each query subvector with
    every codebook entry (the LUT — m×C×n_queries rows, tiny), then
    score a corpus vector as the SUM of m LUT lookups on its codes.

    The plan is the point: after encoding, per-pair scoring involves NO
    vector arithmetic — just an m-way broadcast-LUT join over the code
    table and a partial-aggregated sum. At 100 TB the code table is
    32× smaller than the corpus and the only full-size pass is the
    one-time encode; brute_force_topk re-reads full vectors per query
    batch. Each LUT part is rounded to 6 decimals so the m-part total
    is a multiple of 1e-6 and the final round(…,6) is engine-exact
    (quantized-addend discipline).

    Returns (query_id, vec_id, approx_score, rank) — scores approximate
    dot-product similarity; verify candidates with exact cosine
    downstream when recall matters (same pattern as SRP→verify).
    """
    codes = pq_encode(emb, codebook, m, subdim, id_col, vec_col)
    qchunks = vector_chunks(
        queries.select(F.col(query_id_col).alias(id_col), F.col(vec_col)),
        m, subdim, id_col, vec_col,
    ).select(F.col(id_col).alias(query_id_col), "s", F.col("chunk").alias("qchunk"))
    cchunks = vector_chunks(codebook, m, subdim, id_col, vec_col).select(
        F.col("s"), F.col(id_col).alias("code_id"), F.col("chunk").alias("cchunk")
    )
    lut = qchunks.join(F.broadcast(cchunks), "s").select(
        query_id_col,
        "s",
        "code_id",
        F.round(dot(F.col("qchunk"), F.col("cchunk")), 6).alias("part"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code_id"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("part"), 6).alias("approx_score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_score", "rank")
    )


def gram_matrix_arrow(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """BLAS-backed Gram matrix: `mapInPandas` computes each Arrow
    batch's local Eᵀ·E with one dsyrk-shaped numpy matmul and emits the
    d(d+1)/2 upper-triangle partials; ONE tiny groupBy sums them.

    This is the 100 TB production path for the same statistic as
    :func:`gram_matrix` — per-batch BLAS is orders faster than the
    per-element Catalyst fold, and the shuffle still carries only
    O(d² × batches) rows. The tradeoff is float64 summation-order
    noise (~1e-9 relative): results are NOT engine-reproducible to the
    last bit, so the ORACLE-exact quantized-addend variant stays the
    registry query and this one is closeness-tested against it
    (tests/test_sketches_sampling.py).

    The UDF body is self-contained (local imports) — executor workers
    don't share the driver's sys.path.
    """
    from pyspark.sql.functions import col

    d_probe = len(emb.select(vec_col).first()[0])
    out_schema = "i int, j int, partial double, n_rows long"

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        iu = _np.triu_indices(d_probe)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _np.asarray(list(pdf.iloc[:, 0]), dtype=_np.float64)
            g = mat.T @ mat
            yield _pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "partial": g[iu],
                    "n_rows": _np.int64(mat.shape[0]),
                }
            )

    partials = emb.select(col(vec_col)).mapInPandas(gen, schema=out_schema)
    return partials.groupBy("i", "j").agg(
        F.sum("partial").alias("g"), F.sum("n_rows").alias("n_rows")
    )


_Q20 = 1 << 20  # power-of-two quantum: x*2^20 is an exponent shift, exact


def gram_matrix_arrow_q20(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized-numpy Gram matrix that is **bit-exact cross-engine**,
    closing the evidence gap the float BLAS path (:func:`gram_matrix_arrow`)
    leaves: there, raw-float64 dsyrk partials carry summation-order
    noise, so results can't be hash-compared against an oracle.

    The trick is quantizing each PRODUCT to the binary grid 2⁻²⁰
    before any summation: q(p) = floor(p·2²⁰ + ½) as int64. Every step
    is exact IEEE-754 — p = v_i·v_j is exact in double for float32
    inputs, p·2²⁰ is an exponent shift, +½ and floor are exact below
    2⁵², and the per-cell total is *integer* arithmetic, so it is
    identical regardless of batch boundaries, partitioning, or engine.
    g = Σq / 2²⁰ is exact while Σq < 2⁵³ (~8·10¹⁵ unit-scale products
    per cell — beyond 100 TB corpora; past that, keep the int64).
    Contrast with decimal round(p, 6): 10⁻⁶ is not a binary fraction,
    so replicating Spark/DuckDB HALF_UP decimal ties in numpy is not
    provably exact — the binary grid sidesteps ties entirely.

    Cost shape is the Arrow path's: per batch, d slab multiplies
    (mat[:,i:i+1]·mat[:,i:], C-vectorized) replace one dsyrk — a small
    constant over BLAS, orders faster than the Catalyst per-element
    explode of d(d+1)/2 cells per row — and the shuffle still carries
    only O(d²·batches) rows. This is the registry/production path;
    the float dsyrk variant remains for when the last bit may float.
    """
    from pyspark.sql.functions import col

    d_probe = len(emb.select(vec_col).first()[0])
    out_schema = "i int, j int, qsum long, n_rows long"

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        d = d_probe
        iu = _np.triu_indices(d)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _np.asarray(list(pdf.iloc[:, 0]), dtype=_np.float64)
            out = _np.empty((d, d), dtype=_np.int64)
            for i in range(d):
                prods = mat[:, i : i + 1] * mat[:, i:]
                out[i, i:] = (
                    _np.floor(prods * float(_Q20) + 0.5)
                    .astype(_np.int64)
                    .sum(axis=0)
                )
            yield _pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "qsum": out[iu],
                    "n_rows": _np.int64(mat.shape[0]),
                }
            )

    partials = emb.select(col(vec_col)).mapInPandas(gen, schema=out_schema)
    return partials.groupBy("i", "j").agg(
        (F.sum("qsum").cast("double") / F.lit(float(_Q20))).alias("g"),
        F.sum("n_rows").alias("n_rows"),
    )


def brute_force_topk_q20_arrow(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int = 10_000,
) -> DataFrame:
    """Vectorized (numpy-batched) brute-force top-k that is
    **hash-exact cross-engine** — the q20 discipline from
    :func:`gram_matrix_arrow_q20` generalized to similarity scoring.

    Why the float paths can't do this: a 64-term float dot product is
    a SUM, and numpy's pairwise summation, Catalyst's sequential fold,
    and DuckDB's accumulator visit the addends in different orders —
    last-ulp noise that `round(score, 6)` can only hide until a value
    sits near a rounding boundary. Quantizing each PRODUCT first —
    q(p) = floor(p·2²⁰ + ½) as int64 — removes the order dependence
    entirely: every per-element step is exact IEEE-754, and the score
    is an INTEGER sum, identical under any batching, partitioning, or
    engine. Ranking on an integer needs no rounding contract at all.

    Inputs are unit-normalized and rounded to 6 decimals JVM-side
    first (the proven cross-engine expression), so ``score_q / 2²⁰``
    approximates cosine to ~1e-6 — rank-faithful at the quantization
    resolution, with ties broken by id.

    Scale: queries ship to every worker inside the closure (they are
    the small side by construction); the corpus streams through ONE
    `mapInPandas` scan doing an m×d · d×q numpy multiply per batch —
    the BLAS-shaped hot path — and only (corpus × queries) score rows
    reach the top-k window, partitioned by query. This is the
    production scoring path with a hard oracle, not a closeness test.

    The "queries are the small side" contract is ENFORCED, not assumed:
    *max_queries* caps the driver collect (the repo's fail-fast
    convention — PQ dim guard, DQ empty-rule guard, linkage block
    guard); a fact-sized query frame raises instead of silently
    OOM-ing the driver. Id columns keep their input dtypes in the
    output schema (string/int ids both work; the only requirement is
    that both id columns share a comparable type for the self-match
    filter).
    """
    nr = emb.select(
        F.col(id_col),
        F.transform(
            normalize_vec(as_double_vec(vec_col)), lambda x: F.round(x, 6)
        ).alias("r"),
    ).filter(
        # zero vectors normalize to all-null arrays (nullif guard) and
        # are unscorable — exclude them, mirrored by the oracle's
        # nonzero-norm predicate
        ~F.array_contains(
            F.transform(F.col("r"), lambda x: x.isNull()), F.lit(True)
        )
    )
    qframe = (
        queries.select(
            F.col(query_id_col),
            F.transform(
                normalize_vec(as_double_vec(query_vec_col)),
                lambda x: F.round(x, 6),
            ).alias("qr"),
        )
        # a zero query vector normalizes to all-null → NaN in numpy →
        # floor(NaN).astype(int64) fabricates INT64_MIN scores; drop it
        # here exactly as the corpus side (and the oracle's nonzero-norm
        # predicate) do
        .filter(
            ~F.array_contains(
                F.transform(F.col("qr"), lambda x: x.isNull()), F.lit(True)
            )
        )
    )
    # fail-loud size guard BEFORE the driver collect: take(cap+1) stops
    # scanning as soon as the cap is exceeded, so an accidentally
    # fact-sized query frame raises instead of materializing on the
    # driver (mirrors linkage's max_block_size convention)
    qrows = qframe.take(max_queries + 1)
    if len(qrows) > max_queries:
        raise ValueError(
            f"brute_force_topk_q20_arrow: query frame exceeds max_queries="
            f"{max_queries}; queries must be the broadcast-small side "
            "(raise max_queries deliberately, or batch the queries)"
        )
    q_ids = [r[query_id_col] for r in qrows]
    q_mat = [list(r["qr"]) for r in qrows]
    # id columns keep their INPUT dtypes (ADVICE r6: the schema was
    # hardcoded 'long', corrupting/failing non-integer ids)
    id_type = emb.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {query_id_col} {qid_type}, score_q long"

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        qm = _np.asarray(q_mat, dtype=_np.float64)  # q × d
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy()
            mat = _np.asarray(list(pdf.iloc[:, 1]), dtype=_np.float64)  # b × d
            # per-element quantized products, then an exact integer sum:
            # b × q × d would be large, so loop queries (q is tiny)
            for qi, qid in enumerate(q_ids):
                prods = mat * qm[qi][None, :]
                scores = (
                    _np.floor(prods * 1048576.0 + 0.5)
                    .astype(_np.int64)
                    .sum(axis=1)
                )
                yield _pd.DataFrame(
                    {
                        id_col: ids,
                        # the scalar broadcasts across the batch; no
                        # int64 coercion — qid keeps its input dtype
                        query_id_col: [qid] * len(ids),
                        "score_q": scores,
                    }
                )

    scored = (
        nr.mapInPandas(gen, schema=out_schema)
        .filter(F.col(id_col) != F.col(query_id_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_q").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score_q", "rank")
    )


def srp_band_buckets_q20_arrow(
    df: DataFrame,
    planes: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized SRP bucket index with an **exact integer sign
    decision** — the q20 discipline applied to the 32-fold sign scan
    that is the measured cost center of every SRP query (~2.4 s of a
    3.9 s multiprobe run at sf0.1 on the Catalyst fold path).

    Bit i of a band's bucket is ``Σ_d floor(v_d·p_d·2²⁰ + ½) ≥ 0`` —
    an integer sum of exactly-computable addends, so the decision is
    identical under any summation order, batching, or engine (numpy
    here, a list comprehension in the oracle SQL). NOTE the decision
    boundary differs from the float path's ``round(dot, 6) ≥ 0`` by
    ~2⁻²¹ around zero, so this is a SIBLING index with its own oracle,
    not a drop-in replacement: a dot within half a quantum of zero may
    bucket differently (agreement is ~100% in practice — tested).

    One mapInPandas corpus scan; per batch, 32 vectorized
    multiply-quantize-sum passes (numpy C loops) replace 32 Catalyst
    per-element aggregate folds. Same (id, band, bucket) output shape
    as :func:`srp_band_buckets` — every downstream pair/probe join
    composes unchanged.
    """
    n_bands, rows_per_band = len(planes), len(planes[0])
    plane_rows = [
        [planes[b][i] for i in range(rows_per_band)] for b in range(n_bands)
    ]
    out_schema = f"{id_col} long, band int, bucket long"

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        pm = _np.asarray(plane_rows, dtype=_np.float64)  # bands×rows×d
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy()
            mat = _np.asarray(list(pdf.iloc[:, 1]), dtype=_np.float64)
            for b in range(pm.shape[0]):
                bucket = _np.zeros(len(ids), dtype=_np.int64)
                for i in range(pm.shape[1]):
                    prods = mat * pm[b, i][None, :]
                    q = (
                        _np.floor(prods * 1048576.0 + 0.5)
                        .astype(_np.int64)
                        .sum(axis=1)
                    )
                    bucket |= (q >= 0).astype(_np.int64) << i
                yield _pd.DataFrame(
                    {id_col: ids, "band": _np.int32(b), "bucket": bucket}
                )

    src = df.select(F.col(id_col), as_double_vec(vec_col).alias("v"))
    return src.mapInPandas(gen, schema=out_schema)


def srp_candidate_pairs_q20(
    df: DataFrame,
    planes: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`srp_candidate_pairs` on the vectorized q20 bucket index —
    identical banded-join composition, the projection scan swapped for
    the integer-exact numpy path."""
    b = srp_band_buckets_q20_arrow(df, planes, id_col, vec_col).persist()
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
