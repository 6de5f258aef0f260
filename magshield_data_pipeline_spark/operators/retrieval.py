"""Lexical retrieval scoring (SURVEY §2.10 [EXT] text tier): BM25 —
the sparse-retrieval baseline every RAG / training-data-curation
pipeline runs before (or fused with) dense ANN retrieval.

Okapi BM25 (Robertson & Zaragoza 2009):

    score(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))

All of tf / dl / avgdl / df are exact integers or single IEEE divisions
of exact integers, so the term-frequency half of the formula is
bit-identical across engines when both evaluate the same operand chain
(this repo's float discipline: +,-,*,/ are exactly rounded, so
identical operands => identical doubles; only operand ORDER must be
pinned, which :func:`bm25_score_col` and its SQL twin below both do
left-to-right).

The one non-exact ingredient in textbook BM25 is ``idf = ln((N - df +
0.5) / (df + 0.5))``: libm ``ln`` differs in the last ulp across
engines. Following the repo's "prefer tf/df over ln-idf" rule, the
engine scores with the RATIONAL ODDS form

    idf_odds(t) = (N - df + 0.5) / (df + 0.5)

i.e. the exact argument of the log. ``ln`` is monotone, so per-term
document rankings are IDENTICAL to textbook BM25; only the cross-term
mixing weights differ (odds stretch high-idf terms more than log
does). For the per-term top-k retrieval this operator serves, the
result set is exactly BM25's — and it is hash-exact with no rounding
contract at all. Callers who need log-scale mixing can apply
``F.log`` on top and accept a tolerance check instead.

100 TB shape: one corpus scan explodes words (the term filter prunes
before the shuffle), tf/dl/df are partial-aggregated rollups, N+avgdl
is a single-row frame broadcast by the cross join, df is a
terms-sized broadcast. No UDFs; the scoring expression is whole-stage
codegen. Top-k per term via the standard rank-window (WindowGroupLimit
pushes the limit into the sort at scale).

Reference analog: none (the reference has no retrieval operators);
extends the [EXT] text tier beside tf-idf (operators/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75

# lowercase word runs — the retrieval tokenizer (tf-idf family
# convention; BPE_ISH_PATTERN is the subword trainer's, not retrieval's)
WORD_PATTERN = "[a-z]+"


def doc_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, word) pairs: lowercase word runs, one row per occurrence."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word"),
    )


def bm25_score_col(
    tf: Column, dl: Column, avgdl: Column, idf_odds: Column
) -> Column:
    """The BM25 scoring chain, operand order pinned left-to-right so
    the SQL twin reproduces it bit-for-bit:
    ``idf * (tf * (k1+1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))``."""
    num = tf * F.lit(BM25_K1 + 1.0)
    den = tf + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / avgdl
    )
    return idf_odds * num / den


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    cache_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per query term, the top-*k* documents by BM25 (rational-odds
    idf — see module docstring). Returns
    (term, id, tf, dl, score, rank), rank 1..k with (score DESC, id)
    total-order tiebreak.

    One corpus scan computes words; ``dl`` rolls up per doc, ``tf``
    per (doc, term) AFTER the term filter (the filter prunes the
    shuffle input to |terms| keys), ``df`` per term, and N/avgdl in a
    single-row aggregate that cross-joins (broadcast, 1 row) onto the
    scored frame.

    Cache lifecycle (ADVICE r7, explicit channel per ADVICE r8): the
    exploded ``words`` frame is persisted so the scan+explode feeds
    dl/tf/df once per job, and the CALLER owns its release — repeated
    calls over the SAME input are deduped by the CacheManager
    (plan-identical), but calls over DIFFERENT inputs in a long-lived
    session each add an entry that lives until session end.  Pass
    ``cache_out=[]`` to receive the persisted handle explicitly (it is
    appended); this channel survives any downstream transformation of
    the result.  The legacy ``result.bm25_words_cache`` attribute is
    still set for convenience, but it lives on THIS DataFrame object
    only — any filter/select/join returns a new frame without it, so
    read it before transforming (or use ``cache_out``).  Release with
    ``handle.unpersist()`` after the consuming action.
    """
    if not terms:
        raise ValueError("bm25_topk: terms must be non-empty")
    # words feeds three subtrees (dl, tf, df) — persist so the scan +
    # regexp explode runs once (ReuseExchange only dedups identical
    # Exchanges); CacheManager dedups by logical plan, so repeated
    # invocations share one entry and unpersisting early would just
    # force a recompute mid-job
    words = doc_words(df, text_col, id_col).persist()
    if cache_out is not None:
        cache_out.append(words)
    dl = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    hits = words.filter(F.col("word").isin(*terms))
    tf = hits.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("word").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("word").alias("term"),
            F.col(id_col),
            "tf",
            "dl",
            bm25_score_col(
                F.col("tf").cast("double"),
                F.col("dl").cast("double"),
                F.col("avgdl"),
                idf,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col(id_col))
    result = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    # caller-owned release handle (see docstring: Cache lifecycle)
    result.bm25_words_cache = words
    return result


def bm25_topk_from_index(
    postings: DataFrame,
    meta: DataFrame,
    dfreq: DataFrame,
    totals: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "cid",
) -> DataFrame:
    """BM25 top-*k* per query term scored from a MATERIALIZED inverted
    index instead of the corpus text: *postings* (word, id, tf) is the
    posting list, *meta* (id, dl) the per-unit length, *dfreq*
    (word, df) the document frequencies, *totals* a 1-row frame
    (n_chunks, sum_dl) — the committed index statistics.  The corpus
    text is never touched: query cost is |terms| posting lists + a
    broadcast stats row, which is the contract that makes a 100 TB
    retrieval index usable (scoring from ``bm25_topk`` would re-scan
    and re-tokenize the corpus per query).

    Identical scoring chain to ``bm25_topk`` (``bm25_score_col``), so
    an index maintained incrementally and a batch rebuild produce
    bit-identical scores — the property rag_incremental_index's oracle
    pins.  Returns (term, id, tf, dl, score, rank)."""
    if not terms:
        raise ValueError("bm25_topk_from_index: terms must be non-empty")
    stats = totals.select(
        F.col("n_chunks").cast("double").alias("n_docs"),
        (F.col("sum_dl").cast("double")
         / F.col("n_chunks").cast("double")).alias("avgdl"),
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    scored = (
        postings.filter(F.col("word").isin(*terms))
        .join(meta.select(id_col, "dl"), id_col)
        .join(F.broadcast(dfreq.filter(F.col("word").isin(*terms))), "word")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("word").alias("term"),
            F.col(id_col),
            "tf",
            "dl",
            bm25_score_col(
                F.col("tf").cast("double"),
                F.col("dl").cast("double"),
                F.col("avgdl"),
                idf,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
