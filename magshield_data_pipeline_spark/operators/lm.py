"""Char n-gram language-model fluency scoring (SURVEY §2.10 [EXT] text
tier) — the CCNet/Gopher-style "perplexity filter" curation step,
re-expressed so it is engine-exact.

CCNet (Wenzek et al., LREC 2020) ranks web documents by the perplexity
of a KenLM 5-gram model and keeps the most-fluent tail. The engine-
native restatement here:

- **Train**: one corpus scan → char n-gram counts (``train_ngram_counts``;
  a single groupBy rollup — partial aggregation applies, the key space
  is alphabet^n bounded, millions of rows at most, broadcastable).
- **Score**: each document's n-grams join the broadcast count table and
  roll up per document (``fluency_score``). Instead of float
  ``sum(log p)`` — whose libm evaluation is engine-noise by this repo's
  own exactness discipline — the score is the INTEGER
  ``sum(bit_length(count) - 1)`` = ``sum(floor(log2 count))``: the
  standard quantized-log trick, exact in both Spark and any SQL oracle
  (``length(bin(count)) - 1``), monotone in the true log-likelihood at
  the per-gram level. Unseen grams contribute 0 (the floor of a
  0-count is undefined; 0 is the conservative "no evidence" choice and
  keeps the score a pure sum over the broadcast-join hits).

Returned per document: ``lm_hits`` (grams found in the model),
``lm_grams`` (total grams), ``lm_score`` (the integer quantized-log
sum). Downstream filters rank by ``lm_score / lm_grams`` — kept as two
integers so the division happens where the caller controls rounding.

100 TB shape: train = one scan + one bounded-key shuffle; score = one
scan + a broadcast hash join + a per-doc partial agg. No UDFs anywhere;
every expression is whole-stage-codegen Catalyst.

Reference analog: none (the reference has no corpus-quality operators);
this extends the [EXT] quality tier (operators/quality.py's rule gate)
with a model-based signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams(text: Column | str, n: int) -> Column:
    """All overlapping char n-grams of *text* as an array<string>;
    documents shorter than n yield an empty array. Pure Catalyst
    (sequence + substring inside a transform — one projection, no
    explode until the caller asks)."""
    if n < 1:
        raise ValueError(f"char_ngrams: n must be >= 1, got {n}")
    c = F.col(text) if isinstance(text, str) else text
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
        lambda i: F.substring(c, i, F.lit(n)),
    )
    return F.when(F.length(c) >= n, grams).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def train_ngram_counts(
    df: DataFrame, text_col: str, n: int = 3, lowercase: bool = True
) -> DataFrame:
    """One scan → the (gram, cnt) model table. ``lowercase`` folds case
    so the model sees canonical text (the CCNet convention); grams keep
    punctuation/whitespace — boundary grams carry real signal."""
    c: Column = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(char_ngrams(c, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fluency_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    lowercase: bool = True,
) -> DataFrame:
    """Score every document against the trained model: explode the
    document's n-grams, LEFT join the broadcast model table, and roll
    up ``(lm_hits, lm_grams, lm_score)`` per document — where
    ``lm_score = Σ (bit_length(cnt) - 1) = Σ floor(log2 cnt)`` over the
    grams the model knows (integer-exact; oracle twin is
    ``length(bin(cnt)) - 1``).

    The model broadcasts (alphabet^n-bounded); the fact side is one
    corpus scan + one per-doc partial aggregation. Duplicate grams in a
    document each count — this is a sum over token positions, like the
    log-likelihood it quantizes.
    """
    c: Column = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    grams = df.select(
        F.col(id_col),
        F.explode_outer(char_ngrams(c, n)).alias("gram"),
    )
    joined = grams.join(F.broadcast(model), "gram", "left")
    return joined.groupBy(id_col).agg(
        F.count("cnt").alias("lm_hits"),
        F.count("gram").alias("lm_grams"),
        F.sum(
            F.when(
                F.col("cnt").isNotNull(),
                F.length(F.bin(F.col("cnt"))) - F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("lm_score"),
    )


def dsir_model(
    df: DataFrame,
    text_col: str,
    target: Column,
    n: int = 3,
    lowercase: bool = True,
) -> DataFrame:
    """ONE corpus scan → the paired (gram, r_cnt, t_cnt) model table
    behind DSIR importance resampling (Xie et al., NeurIPS 2023):
    ``r_cnt`` counts the gram over every row, ``t_cnt`` only over rows
    where *target* holds — conditional aggregation, so the target model
    costs nothing beyond the raw one. The key space is alphabet^n
    bounded (same argument as :func:`train_ngram_counts`), so the table
    broadcasts."""
    c: Column = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(char_ngrams(c, n)).alias("gram"), target.alias("is_t"))
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.count(F.when(F.col("is_t"), F.lit(1))).alias("t_cnt"),
        )
    )


def dsir_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document DSIR importance weight, engine-exact: the true
    log ratio Σ [log p_target(gram) − log p_raw(gram)] is replaced by
    the INTEGER ``Σ [floor(log2 t_cnt) − floor(log2 r_cnt)]`` (0 for a
    gram the target model never saw — the conservative no-evidence
    floor, same convention as :func:`fluency_score`), dropping the
    normalizer terms, which shift every document's score by the same
    per-gram constant and so never change the selection ORDER the
    weight exists for. Emits ``(n_grams, target_hits, dsir_score)``;
    downstream importance samplers rank by ``dsir_score / n_grams``
    (two integers — the caller owns the rounding)."""
    c: Column = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    grams = df.select(
        F.col(id_col),
        F.explode_outer(char_ngrams(c, n)).alias("gram"),
    )
    joined = grams.join(F.broadcast(model), "gram", "left")
    q_t = F.when(
        F.col("t_cnt") > 0, F.length(F.bin(F.col("t_cnt"))) - F.lit(1)
    ).otherwise(F.lit(0))
    q_r = F.when(
        F.col("r_cnt").isNotNull(), F.length(F.bin(F.col("r_cnt"))) - F.lit(1)
    ).otherwise(F.lit(0))
    return joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count(F.when(F.col("t_cnt") > 0, F.lit(1))).alias("target_hits"),
        F.sum(q_t - q_r).cast("long").alias("dsir_score"),
    )
