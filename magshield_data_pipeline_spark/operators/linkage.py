"""Entity resolution / record linkage ([EXT] — the CRM-adjacent tier).

The classic three-stage pipeline (Fellegi–Sunter lineage; Christen,
"Data Matching" 2012):

1. **blocking** — a cheap deterministic key partitions candidates so
   the pair comparison never goes quadratic in the table (the same
   reason LSH bands block MinHash: compare within buckets only);
2. **pair scoring** — a string-similarity measure on the blocked pairs
   (normalized Levenshtein here: JVM-side `F.levenshtein`, identical
   integer edit distance in DuckDB, so scores are engine-exact);
3. **survivorship** — pick the best-scoring match per left record
   (`max_by` partial aggregate — argmax without a ranking window).

Reference parity: the reference resolves entities by exact id joins
only (organisation/opportunity lookups — magshield_data_pipeline/utils.py);
fuzzy linkage is the [EXT] capability a real CRM consolidation needs.

Scale: cost = Σ_blocks |dirty_b|·|clean_b| — governed entirely by the
blocking key's selectivity. A hot block is a skew case (AQE or
`scale.salted_join`); production stacks MULTIPLE blocking passes
(prefix, phonetic, n-gram) and unions candidates, same plan shape per
pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def name_similarity(a: Column, b: Column, decimals: int = 6) -> Column:
    """Normalized Levenshtein similarity: 1 − lev(a,b)/max(len) ∈ [0,1].
    Integer edit distance and integer lengths → the quotient is
    computed on identical operands in both engines; rounding is output
    hygiene. Null on null input, 1.0 on two empty strings."""
    lev = F.levenshtein(a, b).cast("double")
    denom = F.greatest(F.length(a), F.length(b)).cast("double")
    return F.round(
        F.when(denom == 0, F.lit(1.0)).otherwise(F.lit(1.0) - lev / denom),
        decimals,
    )


def _guard_block_size(side: DataFrame, cap: int, side_name: str) -> DataFrame:
    """Fail-loud hot-block guard: attach each row's blocking-group size
    and `raise_error` if any group exceeds *cap*. Pair cost is
    Σ_blocks |dirty_b|·|clean_b|, so ONE degenerate key (constant,
    null-heavy, low-cardinality) silently goes quadratic — the same
    contract-by-caller-discipline hole the PQ dim guard and the DQ
    empty-rule guard close elsewhere; raising beats a 100 TB cross
    product. Cost: one partial-aggregated count per side + a self
    equi-join on bk (AQE broadcasts the tiny size rollup)."""
    sizes = side.groupBy("bk").agg(F.count(F.lit(1)).alias("_bn"))
    # the guard must be a FILTER predicate: an unused projected column
    # holding raise_error would be pruned away by the optimizer
    guard = F.when(F.col("_bn") <= cap, F.lit(True)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"link_candidates: {side_name} blocking group "),
                F.col("bk").cast("string"),
                F.lit(f" exceeds max_block_size={cap} ("),
                F.col("_bn").cast("string"),
                F.lit(
                    " rows) — choose a more selective block_key "
                    "or salt the hot block"
                ),
            )
        ).cast("boolean")
    )
    return side.join(sizes, "bk").filter(guard).drop("_bn")


def link_candidates(
    dirty: DataFrame,
    clean: DataFrame,
    block_key: Column,
    id_col: str = "id",
    name_col: str = "name",
    threshold: float = 0.8,
    max_block_size: int | None = None,
) -> DataFrame:
    """Blocked candidate pairs with similarity ≥ threshold:
    (dirty_id, clean_id, sim). *block_key* is evaluated against each
    side's columns by name — both sides must expose the columns it
    references. With *max_block_size* set, any blocking group larger
    than the cap on either side raises at execution time
    (:func:`_guard_block_size`) instead of going quadratic."""
    d = dirty.select(
        F.col(id_col).alias("dirty_id"),
        F.col(name_col).alias("dirty_name"),
        block_key.alias("bk"),
    )
    c = clean.select(
        F.col(id_col).alias("clean_id"),
        F.col(name_col).alias("clean_name"),
        block_key.alias("bk"),
    )
    if max_block_size is not None:
        if max_block_size <= 0:
            raise ValueError("max_block_size must be positive")
        d = _guard_block_size(d, max_block_size, "dirty")
        c = _guard_block_size(c, max_block_size, "clean")
    return (
        d.join(c, "bk")
        .select(
            "dirty_id",
            "clean_id",
            name_similarity(F.col("dirty_name"), F.col("clean_name")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def best_match(pairs: DataFrame) -> DataFrame:
    """Survivorship: the single best candidate per dirty record —
    highest sim, ties to the LOWEST clean id. A max_by over a
    lexicographic struct key: partial aggregation collapses each map
    task's candidates before the exchange; no ranking window, no
    sort."""
    best = F.max_by(
        F.struct(F.col("clean_id"), F.col("sim")),
        F.struct(F.col("sim"), (-F.col("clean_id")).alias("tie")),
    )
    return (
        pairs.groupBy("dirty_id")
        .agg(best.alias("_b"))
        .select(
            "dirty_id",
            F.col("_b.clean_id").alias("matched_id"),
            F.col("_b.sim").alias("sim"),
        )
    )
