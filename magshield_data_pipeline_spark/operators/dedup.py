"""Deduplication operators for training-data pipelines (SURVEY §2.10 [EXT]).

Four tiers, cheapest to most thorough, all built from JVM-side column
expressions (no Python UDFs — hashing/regex run inside whole-stage
codegen):

- **exact**: MD5 fingerprint of normalized text → one shuffle on a
  uniform key; generalizes the reference's full-row ``drop_duplicates``
  (/root/reference/modules/users.py:142 et al., SURVEY A4) to
  content-keyed dedup.
- **MinHash + LSH banding**: per-doc signature of k min-hashes over
  word shingles, banded into buckets; candidate pairs = docs sharing a
  band bucket. The bucket join is the only shuffle, and its key is a
  hash → uniform. This is the 100 TB path: no all-pairs comparison.
- **SimHash**: bit-majority fingerprint over shingle hashes; equal
  fingerprints (or small hamming distance) → near-dups. One explode +
  one groupBy shuffle on doc_id.
- **exact n-gram Jaccard**: the verification baseline — explode
  distinct shingles, self-join on shingle, count intersections. Exact
  but quadratic in the worst case; use LSH at scale (hot shingles skew
  the join — production would cap shingle document-frequency first).

Hash parity note: every hash here is MD5 (identical hex output in
Spark and DuckDB), so each operator has an exact SQL oracle twin in
plans/ext_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magshield_data_pipeline_spark.operators.text import fingerprint, normalize_text

# MinHash parameters: K hash functions banded into BANDS bands of
# ROWS_PER_BAND. P(candidate | jaccard j) = 1 - (1 - j^ROWS)^BANDS.
MINHASH_K = 8
MINHASH_BANDS = 4
ROWS_PER_BAND = MINHASH_K // MINHASH_BANDS

SIMHASH_BITS = 16  # nibbles of the md5 prefix; production would use 64


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles over normalized text. Documents shorter than
    *n* words contribute one shingle (the whole text) so every doc has a
    non-empty shingle set.

    Implementation note: shingles are built by zip_with over n shifted
    slices of the word array — element-wise over already-computed
    arrays. The naive alternative (transform over an index sequence with
    element_at(words, i+j)) embeds the full text-split expression in
    EVERY element access; Catalyst does not share it inside higher-order
    lambdas, which made shingling O(words²) regex work per document
    (~180 s for the minhash query at sf0.1 — this shape runs it in ~2 s).
    """
    words = F.split(normalize_text(text), " ")
    k = F.size(words)
    m = k - (n - 1)  # shingle count when k >= n
    sh = F.slice(words, F.lit(1), m)
    for j in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(words, F.lit(1 + j), m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(k >= n, sh).otherwise(F.array(F.array_join(words, " ")))


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct (normalized) text — the lowest id wins,
    making the survivor set deterministic. Scale: one shuffle keyed on
    the MD5 fingerprint (uniform, skew-free), implemented as a
    ``min(struct(id, …))`` aggregate so the map side pre-combines per
    fingerprint (HashAggregate, no Window/Sort over full rows) — the
    same survivor rule as :func:`incremental_exact_dedup`.

    Requirements/semantics of the ``min(struct)`` shape:

    - every carried column must be ORDERABLE — a map-typed column fails
      analysis (structs/arrays are fine). Project unorderable columns
      out before calling and join them back on *id_col* afterwards;
    - ties on *id_col* (two rows, same fingerprint, same id) break
      deterministically by the remaining columns in ``df.columns``
      order — unlike a row_number ranking, which breaks such ties
      arbitrarily. With unique ids the survivor set is identical."""
    cols = df.columns
    rest = [c for c in cols if c != id_col]
    with_fp = df.withColumn("fp", fingerprint(text_col))
    winner = F.min(F.struct(id_col, *rest)).alias("w")
    return (
        with_fp.groupBy("fp")
        .agg(winner)
        .select(*[F.col(f"w.{c}").alias(c) for c in cols], "fp")
    )


def incremental_exact_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Dedup an INCOMING batch against an existing corpus — the shape a
    100 TB pipeline actually runs (continuous ingestion), where
    re-deduping the whole corpus per batch would be quadratic total
    work. Two stages, both keyed on the uniform MD5 fingerprint:

    1. anti-join the batch's fingerprints against the corpus's distinct
       fingerprint set (one shuffle; at scale the corpus side is a
       pre-materialized fingerprint index, not a recomputation);
    2. intra-batch exact dedup via one ``min(struct)`` partial
       aggregate — the lowest id wins, same survivor rule as
       :func:`exact_dedup`, without a ranking window.

    Returns the surviving batch rows as (id, fp, *keep)."""
    corpus_fp = corpus.select(fingerprint(text_col).alias("fp")).distinct()
    return incremental_exact_dedup_indexed(
        corpus_fp, batch, text_col, id_col, keep
    )


def incremental_exact_dedup_indexed(
    corpus_fp: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`incremental_exact_dedup` against a MATERIALIZED
    fingerprint index (*corpus_fp* has one ``fp`` column) — the shape
    a per-epoch pipeline actually runs at 100 TB: the corpus is never
    re-fingerprinted per batch; the index is written once and the
    epoch plan scans a narrow (fp) parquet relation instead of the
    corpus text (the batch-side plan contains no corpus-shaped
    subtree — pinned by tests/test_plan_shapes.py for
    incremental_curation_epoch)."""
    batch_fp = batch.select(
        F.col(id_col), *[F.col(c) for c in keep], fingerprint(text_col).alias("fp")
    )
    fresh = batch_fp.join(corpus_fp.select("fp"), "fp", "left_anti")
    winner = F.min(F.struct(id_col, *keep)).alias("w")
    return (
        fresh.groupBy("fp")
        .agg(winner)
        .select("fp", F.col(f"w.{id_col}").alias(id_col), *[F.col(f"w.{c}").alias(c) for c in keep])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def lsh_band_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bucket) rows: the LSH index. Docs sharing a bucket in
    any band are near-dup candidates. One row per doc per band.

    Built relationally — explode shingles ONCE, then every seed's
    min-hash as a partially-aggregated min in a single groupBy — instead
    of k array-expression columns that would each re-evaluate the
    shingle build. Map-side combine means the shuffle carries one
    signature candidate per (doc, partition), not per shingle; this is
    also the shape that scales (state per doc is k hashes, period).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col)).alias("_s")
    )
    sig = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("_s")))).alias(f"h{i}")
            for i in range(MINHASH_K)
        ]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                    )
                ).alias("bucket"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return sig.select(
        F.col(id_col), F.explode(bands).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate near-dup pairs (doc_a < doc_b) from the LSH
    index. The self-join shuffles on (band, bucket) — a hash key, so
    uniform; bucket sizes are tiny for any sane banding, so the join
    fan-out is bounded."""
    buckets = lsh_band_buckets(df, text_col, id_col)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def incremental_candidate_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidates for an INCOMING batch: batch docs probed
    against the corpus LSH index, plus intra-batch candidates — the
    near-dup complement of :func:`incremental_exact_dedup`, and the
    shape continuous ingestion actually runs at 100 TB (the corpus
    bucket table is materialized once and probed per batch; per-batch
    cost is O(batch buckets + collisions), never O(corpus²)).

    Returns (doc_a, doc_b, vs_corpus): ``vs_corpus=true`` rows pair a
    batch doc with a corpus doc; ``false`` rows are intra-batch pairs
    (doc_a < doc_b). Both joins shuffle on the uniform (band, bucket)
    hash key."""
    corpus_buckets = lsh_band_buckets(corpus, text_col, id_col).select(
        "band", "bucket", F.col(id_col).alias("_corpus_id")
    )
    batch_buckets = lsh_band_buckets(batch, text_col, id_col)
    vs_corpus = (
        batch_buckets.join(corpus_buckets, ["band", "bucket"])
        .select(
            F.col(id_col).alias("doc_a"),
            F.col("_corpus_id").alias("doc_b"),
            F.lit(True).alias("vs_corpus"),
        )
        .distinct()
    )
    intra = minhash_candidate_pairs(batch, text_col, id_col).select(
        "doc_a", "doc_b", F.lit(False).alias("vs_corpus")
    )
    return vs_corpus.unionByName(intra)


# ---------------------------------------------------------------------------
# SimHash


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bit-majority SimHash fingerprint (SIMHASH_BITS wide, from the md5
    hex prefix of each shingle). Equal fingerprints → near-dup block key.
    Plan: explode shingles → per-bit conditional sums in one groupBy on
    the doc id (single shuffle, partially aggregated map-side). The bit
    width is a parameter: 16 here so the oracle SQL stays reviewable;
    production uses 64 with the identical plan shape."""
    hex_chars = SIMHASH_BITS // 4
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col)).alias("s"),
    ).select(
        F.col(id_col), F.substring(F.md5(F.col("s")), 1, hex_chars).alias("h")
    )
    sums = []
    for j in range(SIMHASH_BITS):
        ci, bi = j // 4, 3 - (j % 4)
        nibble = F.conv(F.substring(F.col("h"), ci + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nibble, bi).bitwiseAND(F.lit(1))
        sums.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    per_doc = exploded.groupBy(id_col).agg(*sums)
    fp_expr = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << (SIMHASH_BITS - 1 - j))).otherwise(
            F.lit(0)
        )
        fp_expr = term if fp_expr is None else fp_expr + term
    return per_doc.select(F.col(id_col), fp_expr.cast("bigint").alias("simhash"))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word shingles for every
    pair sharing at least one shingle; keep pairs ≥ *threshold*.

    *max_df* caps shingle document-frequency: shingles appearing in
    more than ``max_df`` documents are dropped from BOTH the
    intersection and the per-doc set sizes, so the result is the exact
    Jaccard over the rare-shingle subset. This bounds the self-join
    fan-out per shingle at max_df²/2 — without it a hot shingle (a
    boilerplate phrase in millions of docs) makes the join quadratic,
    the one plan shape that cannot survive 100 TB. ``None`` = uncapped
    exact verifier for small corpora."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col))).alias("s")
    )
    if max_df is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("s")
        )
        # The capped shingle frame feeds THREE consumers (both self-join
        # sides and the per-doc sizes) with different partitionings, so
        # without persistence the expensive shingle generate + cap join
        # re-evaluates per consumer (measured 5.4 s → 2.5 s at sf0.1
        # from this one persist). The cache is the df-capped frame —
        # bounded by corpus size × max_df — and MEMORY_AND_DISK spills
        # rather than OOMs; at 100 TB the production move is the same
        # idea one step further: materialize the capped shingle index
        # to storage once and share it across all pair jobs.
        # Cache lifetime is caller-owned: the returned plan references
        # the persisted frame, so this function cannot unpersist it.
        # Spark's CacheManager dedups by logical plan — repeated calls
        # on the same input reuse ONE entry; callers sweeping many
        # distinct inputs in one session should unpersist between runs
        # (spark.catalog.clearCache() or df.unpersist()).
        sh = sh.join(rare, "s", "inner").select(id_col, "s").persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("i"))
    )
    na, nb = sizes.alias("na"), sizes.alias("nb")
    jac = F.col("i") / (F.col("na.n") + F.col("nb.n") - F.col("i"))
    return (
        inter.join(na, F.col("doc_a") == F.col(f"na.{id_col}"))
        .join(nb, F.col("doc_b") == F.col(f"nb.{id_col}"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Connected components — dup PAIRS → dup CLUSTERS


def _materialize(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Truncate lineage between iterations. Default: ``localCheckpoint``
    (executor-local blocks — fastest, but a lost executor mid-iteration
    fails the job on a real cluster). With *checkpoint_dir* set, use
    reliable ``checkpoint()`` against that path (HDFS/object store):
    blocks survive executor loss at the cost of a write per round —
    the right trade on a 1000-executor run where preemption is routine.
    """
    if checkpoint_dir is not None:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _materialize_observed(
    df: DataFrame, checkpoint_dir: str | None, *metrics
) -> tuple[DataFrame, dict]:
    """:func:`_materialize` fused with a convergence probe (r12, guide
    §1.2 "don't compute things twice"): ``df.observe(...)`` collects
    *metrics* (CollectMetricsExec accumulators) DURING the eager
    checkpoint's materialization job, so each iteration pays ONE Spark
    job instead of checkpoint + a second full aggregate pass. The
    metrics see exactly the materialized rows — same values the
    separate ``agg`` read, verified by the loop's unchanged fixpoint
    (every CC/BFS/paths oracle hash is invariant to this fusion)."""
    from pyspark.sql import Observation

    obs = Observation()
    out = _materialize(df.observe(obs, *metrics), checkpoint_dir)
    return out, obs.get


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) for every vertex in *edges*, where
    cluster_id = min doc_id reachable — turning near-dup PAIRS into
    dedup CLUSTERS (keep one doc per cluster).

    Iterative min-label propagation: each round every vertex adopts the
    smallest label among itself and its neighbors; fixpoint after
    O(diameter) rounds. Dedup graphs are unions of small cliques, so
    the diameter is tiny (2-3) in practice; *max_iter* bounds
    pathological chains.

    Scale notes: each round is one join (labels ⋈ edges, shuffled on
    the vertex id) + one partially-aggregated min — no sorts, no
    windows. Lineage is truncated each round (the classic
    iterative-algorithm hazard) via ``localCheckpoint``, or reliable
    ``checkpoint()`` when *checkpoint_dir* is given — see
    :func:`_materialize` for the failure-domain tradeoff. The
    driver-side loop is control flow only — the convergence probe
    aggregates to a single count, it never collects data rows. For
    graphs with huge components, swap in the large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce") —
    same per-round join shape, provably fewer rounds.
    """
    # symmetric edge list (a→b and b→a), one row per directed neighbor.
    # Materialized ONCE: the edge frame is typically an expensive
    # pair-producing pipeline (LSH/jaccard), and the per-round join
    # would otherwise re-evaluate it every iteration.
    fwd = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    sym = _materialize(
        fwd.union(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        ),
        checkpoint_dir,
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # one pass computes the stepped label AND carries the old one;
        # the changed-count rides the checkpoint job as an observed
        # metric (r12) — one Spark job per round, not two
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        stepped, probe = _materialize_observed(
            stepped,
            checkpoint_dir,
            F.sum(
                (F.col("label") != F.col("_old")).cast("long")
            ).alias("changed"),
        )
        changed = int(probe["changed"] or 0)
        labels = stepped.select("id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # stopping silently would return labels that LOOK valid but split
        # long-chain components — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph has a component with diameter > max_iter — raise "
            "max_iter or switch to large-star/small-star"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the scale path :func:`connected_components` points at.

    Min-label propagation needs O(diameter) rounds: fine for dedup
    cliques (diameter 2-3), ruinous for chain-shaped components. The
    star algorithm contracts components in O(log²) rounds regardless of
    shape, with the same per-round cost envelope (each half-round is
    one groupBy-on-vertex shuffle + one partially-aggregated min):

    - **large-star**: every node points its LARGER neighbors at the
      minimum of its neighborhood (incl. itself) — long chains fold
      toward small ids without waiting for hop-by-hop propagation;
    - **small-star**: every node points its smaller-or-equal neighbors
      (and itself) at the neighborhood minimum — flattening partial
      trees into stars.

    Fixpoint: the edge set is a union of stars rooted at component
    minima. The per-round convergence probe is ONE aggregate pass —
    ``(count, bit_xor(xxhash64(u, v)))`` over the (distinct) edge set,
    an order-insensitive set checksum — instead of the two full
    ``exceptAll`` exchanges an exact symmetric-difference costs. When
    the stats match the previous round's, a single belt-and-braces
    ``exceptAll`` confirms true set equality before declaring the
    fixpoint (it runs ONCE, at convergence, not per round — a 64-bit
    checksum collision combined with an equal count is ~2^-64, but the
    confirmation makes a false fixpoint impossible rather than
    unlikely). Same fail-loud non-convergence contract as the label
    propagation variant; same output schema, verified equal by tests.
    """

    # bit_xor, not sum: order-insensitive like sum but cannot
    # overflow (sum of hashes trips ANSI long-overflow checks); the
    # (count, checksum) pair rides each round's checkpoint job as
    # observed metrics (r12) — one Spark job per round, not two
    _STAT_METRICS = (
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("sig"),
    )

    def _observed_stats(probe: dict) -> tuple[int, int]:
        return int(probe["n"]), int(probe["sig"])

    e, probe = _materialize_observed(
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct(),  # don't re-run the pair pipeline per round
        checkpoint_dir,
        *_STAT_METRICS,
    )
    e_stats = _observed_stats(probe)
    converged = False
    for _ in range(max_iter):
        # -- large-star: for each u, m = min(N(u) ∪ {u}); emit (v, m)
        # for the strictly-larger neighbors v
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # -- small-star on the large-star output: orient (hi, lo), for
        # each u emit (v, m) for v ∈ N(u) ∪ {u} with m = min(N(u) ∪ {u})
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        omins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small, probe = _materialize_observed(
            oriented.join(omins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(omins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct(),
            checkpoint_dir,
            *_STAT_METRICS,
        )
        # fixpoint probe: rides the checkpoint job, no extra pass
        small_stats = _observed_stats(probe)
        if small_stats == e_stats:
            # stats agree — confirm exact set equality once (both
            # frames are distinct, so exceptAll is set difference)
            if small.exceptAll(e).count() == 0 and e.exceptAll(small).count() == 0:
                e = small
                converged = True
                break
        e, e_stats = small, small_stats
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — raise max_iter"
        )
    # fixpoint edges are (node → component min) stars; roots map to
    # themselves
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        e.union(roots)
        .distinct()
        .select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup


def bloom_build(
    fps: DataFrame, fp_col: str = "fp", m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """ONE-row frame: a Bloom filter over *fps* as a sparse
    ``map<long, long>`` (word index → 64-bit word). Spark does not
    expose ``bloom_filter_agg`` to SQL/PySpark, so the filter is built
    from first principles with JVM expressions only: k seeded xxhash64
    positions per key, ``bit_or`` partial aggregation per word, one
    map_from_arrays fold. At the defaults (2^20 bits, k=5) the map is
    ≤128 KB — broadcastable at any corpus size that fits its false-
    positive budget; size m_bits ~ 14×n for ~1e-4 fp rate.

    In production the filter is built ONCE as the corpus fingerprint
    index is maintained, persisted beside it, and only re-broadcast per
    batch — the build here is the demo path."""
    pos = fps.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(fp_col), F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("p")
    )
    words = pos.select(
        (F.col("p") / 64).cast("long").alias("w"),
        F.expr("shiftleft(1L, cast(p % 64 AS int))").alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("word"))
    return words.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("word")).alias("bloom")
    )


def bloom_might_contain(
    fp_col: str, bloom_col: str, m_bits: int = 1 << 20, k: int = 5
) -> Column:
    """True iff every one of the fingerprint's k bits is set in the
    filter map — may false-positive (resolved by an exact join
    downstream), never false-negative. Takes column NAMES: the bit
    masks need ``shiftleft`` with a column-valued shift count, which
    PySpark's wrapper doesn't expose, so the expression is built as
    SQL text over the named columns."""
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(F.col(fp_col), F.lit(i)), F.lit(m_bits))
        word = F.coalesce(
            F.element_at(F.col(bloom_col), (p / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        mask = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64({fp_col}, {i}), {m_bits}) % 64 AS int))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """:func:`incremental_exact_dedup` with a broadcast Bloom prefilter
    — IDENTICAL output (the filter never false-negatives, and its false
    positives are resolved by the same exact anti-join), different
    100 TB cost profile: rows the filter proves fresh skip the corpus-
    index shuffle entirely, so the anti-join moves only
    ``dup_rate + fp_rate`` of the batch instead of all of it. The
    filter itself is a ≤128 KB broadcast; the corpus fingerprint index
    is probed, not scanned, by the survivors.

    Returns the surviving batch rows as (fp, id, *keep) — same contract
    as :func:`incremental_exact_dedup`, verified equal by tests."""
    corpus_fp = corpus.select(fingerprint(text_col).alias("fp")).distinct()
    bloom = bloom_build(corpus_fp, "fp", m_bits, k)
    batch_fp = batch.select(
        F.col(id_col), *[F.col(c) for c in keep], fingerprint(text_col).alias("fp")
    )
    probed = batch_fp.crossJoin(F.broadcast(bloom)).withColumn(
        "might", bloom_might_contain("fp", "bloom", m_bits, k)
    ).drop("bloom")
    definite_new = probed.filter(~F.col("might")).drop("might")
    candidates = probed.filter(F.col("might")).drop("might")
    verified_new = candidates.join(corpus_fp, "fp", "left_anti")
    fresh = definite_new.unionByName(verified_new)
    winner = F.min(F.struct(id_col, *keep)).alias("w")
    return (
        fresh.groupBy("fp")
        .agg(winner)
        .select(
            "fp",
            F.col(f"w.{id_col}").alias(id_col),
            *[F.col(f"w.{c}").alias(c) for c in keep],
        )
    )


def lsh_band_buckets_stateless(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """:func:`lsh_band_buckets` as a PURE PROJECTION — per-doc min-hash
    via ``array_min(transform(shingles, …))`` instead of the
    explode+groupBy rollup, producing IDENTICAL (id, band, bucket)
    rows (min over the same shingle set; pytest-pinned equivalence).

    Exists for Structured Streaming: an aggregation would force the
    band derivation into a stateful stage (and forbid the downstream
    stream-static index join in append mode), while this form keeps
    the whole signature stateless so it pipelines inside the stream's
    scan stage.  Batch callers should prefer the relational form: the
    map-side-combined groupBy shuffles one signature candidate per
    (doc, partition), whereas this evaluates k transforms over each
    doc's full shingle array in one task — same asymptotics, larger
    constant on long docs.  A doc with no shingles yields a NULL
    bucket (array_min of empty), which every downstream equi-join
    drops — the same outcome as the relational form's missing row.
    """
    sh = word_shingles(text_col)

    # seed captured via a factory, NOT `lambda x, i=i`: pyspark reads a
    # transform lambda's ARITY, and a two-parameter lambda is the
    # (element, index) form — the default would be silently rebound to
    # the array-index Column
    def _seeded(seed: int):
        return lambda x: F.md5(F.concat(F.lit(f"{seed}|"), x))

    mins = [F.array_min(F.transform(sh, _seeded(i))) for i in range(MINHASH_K)]
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[mins[b * ROWS_PER_BAND + r] for r in range(ROWS_PER_BAND)]
                    )
                ).alias("bucket"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
