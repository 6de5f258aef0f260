"""Byte-pair-encoding tokenizer: distributed merge training + Arrow
encode (SURVEY §2.10 [EXT] text tier).

The real subword tokenizer behind ``text.py``'s ``BPE_ISH_PATTERN``
statistics stub: Sennrich/Haddow/Birch (ACL 2016, "Neural Machine
Translation of Rare Words with Subword Units") merge training,
re-expressed for Spark's execution model.

Design for 100 TB:

- **Train on the word-frequency table, not the corpus.** The corpus is
  scanned ONCE (``word_frequencies``: pre-tokenize, explode, one
  groupBy shuffle on the word key — uniform, no skew); every merge
  iteration then runs against the vocab-sized frequency table
  (≤ millions of rows regardless of corpus bytes). This is the same
  reduction every reference BPE trainer applies, and it is what makes
  N merge iterations affordable: iteration cost is O(vocab), not
  O(corpus).
- **One aggregation per merge.** Each iteration is a single JVM-side
  pair-count rollup (``transform``/``explode``/``groupBy`` — partial
  aggregation applies) plus a SINGLE-ROW driver collect of the winning
  pair: the same convergence-probe convention as the connected-
  components loop (dedup.py) and the Lloyd step (similarity.py).
- **Merge application is a Catalyst fold** (``F.aggregate`` over the
  symbol array — greedy left-to-right, matching the reference
  algorithm exactly, see ``apply_merge``), so training never leaves
  the JVM. Lineage is truncated every ``lineage_every`` merges via
  ``localCheckpoint`` (the iterative-plan-growth hazard, documented at
  dedup.py::truncate_lineage).
- **Encode is the one honest Python path**: applying hundreds of
  learned merges per document is data-dependent control flow Catalyst
  can't express without a plan linear in the merge count, so
  ``encode_bpe`` ships the merge ranks by closure into ONE
  ``mapInPandas`` scan (Arrow-batched, never per-row) with a per-batch
  word→tokens memo — words repeat heavily, so each distinct word pays
  the merge loop once per batch.

Training on a corpus sample (``sample_fraction``) is standard practice
at scale: merge ranks stabilize long before the full corpus is seen,
and the encode pass (the part that must see every byte) is a single
scan either way.

Reference analog: the reference has no tokenizer; its nearest text
operator is the clean_text/format family (/root/reference/modules/
helpers.py) — this tier is [EXT] (training-data pipeline operators the
brief adds beyond the reference surface).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators.text import BPE_ISH_PATTERN

__all__ = [
    "word_frequencies",
    "pair_counts",
    "top_pair",
    "apply_merge",
    "train_bpe",
    "encode_bpe",
    "encode_word",
]


def _chars(word: Column) -> Column:
    # split("") keeps a trailing "" (java split with limit -1); a word
    # produced by the pre-tokenizer can never contain "", so dropping
    # empties is exact
    return F.filter(F.split(word, ""), lambda c: c != F.lit(""))


def word_frequencies(
    df: DataFrame, text_col: str, pattern: str = BPE_ISH_PATTERN
) -> DataFrame:
    """One corpus scan → the (word, n) frequency table training runs on.

    Pre-tokenizes with the same regex family as ``text.py`` (letter
    runs / digits / punctuation — merges never cross word boundaries,
    per the reference algorithm), explodes, and rolls up. The word key
    is high-cardinality and uniform, so the one shuffle here has no
    skew term; everything after it is vocab-sized.
    """
    words = df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).alias(
            "word"
        )
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", _chars(F.col("word")))
    )


def pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the frequency table, weighted by
    word count — one JVM-side rollup (partial agg applies; the pair key
    space is bounded by vocab², in practice tiny).

    Pairs are OVERLAPPING positions (``zip(syms, syms[1:])``), exactly
    the reference trainer's count — 'aaa' contributes (a,a) twice.
    """
    pairs = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(1, size(syms) - 1), "
            "i -> struct(syms[i-1] AS s1, syms[i] AS s2))"
        ),
    ).otherwise(F.expr("array()"))
    return (
        wf.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("n").alias("cnt"))
    )


def top_pair(pc: DataFrame) -> tuple[str, str] | None:
    """The winning merge: highest count, ties broken lexicographically
    on (s1, s2) so training is deterministic across partitionings and
    engines. TakeOrdered over the vocab-sized pair table — a single-row
    driver collect (convergence-probe convention)."""
    rows = pc.orderBy(F.col("cnt").desc(), "s1", "s2").take(1)
    if not rows:
        return None
    return rows[0]["s1"], rows[0]["s2"]


def apply_merge(syms: Column, s1: str, s2: str) -> Column:
    """Greedy left-to-right merge of adjacent (s1, s2) into s1+s2 as a
    Catalyst fold — the reference algorithm's semantics exactly:
    scanning left, an occurrence is merged and the scan resumes AFTER
    it, so 'aaaa' under (a,a) gives [aa, aa] and 'aaa' gives [aa, a].

    The fold appends each symbol unless the accumulator's last element
    is s1 and the incoming symbol is s2 — and because a just-merged
    element is s1+s2 (≠ s1 unless s2 is empty, which the pre-tokenizer
    cannot produce), a merged occurrence never participates in the next
    match, which is precisely the resume-after semantics.
    """
    merged = s1 + s2
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(s1))
            & (x == F.lit(s2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    pattern: str = BPE_ISH_PATTERN,
    sample_fraction: float | None = None,
    lineage_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn *n_merges* BPE merges from the corpus. Returns the ordered
    merge list (rank = position), the tokenizer's entire trained state.

    Scale shape: one corpus scan builds the persisted word-frequency
    table; each merge is then one vocab-sized aggregation + a 1-row
    collect + a Catalyst fold projection. ``sample_fraction`` trains on
    a Bernoulli sample of the corpus (standard at 100 TB — ranks
    stabilize early; pass None to train on everything).
    ``lineage_every`` bounds plan growth across iterations via
    ``localCheckpoint`` (each fold otherwise nests one more aggregate
    expression per rank).
    """
    if n_merges < 0:
        raise ValueError(f"train_bpe: n_merges must be >= 0, got {n_merges}")
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)
    wf = word_frequencies(df, text_col, pattern).persist()
    wf.count()  # materialize once; iterations reuse the cached table
    merges: list[tuple[str, str]] = []
    try:
        for rank in range(n_merges):
            best = top_pair(pair_counts(wf))
            if best is None:
                break
            merges.append(best)
            wf = wf.withColumn("syms", apply_merge(F.col("syms"), *best))
            if (rank + 1) % lineage_every == 0:
                nxt = wf.localCheckpoint(eager=True)
                wf.unpersist()
                wf = nxt
    finally:
        wf.unpersist()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """TRAINING-CONSISTENT single-word encode: apply learned merges in
    rank order, one greedy left-to-right pass each — exactly the
    transformation training applied to the frequency table, so encoding
    a training-corpus word reproduces that word's final training-table
    symbols bit-for-bit (pinned by tests/test_bpe.py). This is the
    principled contract: the popular repeatedly-merge-the-lowest-rank-
    pair loop (GPT-2's ``bpe()``) agrees except in degenerate
    vocabularies where two different merge paths produce the SAME
    symbol string (e.g. ``ab+c`` and ``a+bc`` both yielding "abc") and
    a late merge resurrects an early pair — there the sequential pass
    is the one that still matches what training actually counted.
    Shared by the executor-side encode and the tests' parity checks."""
    syms = list(word)
    for (s1, s2), _ in sorted(ranks.items(), key=lambda kv: kv[1]):
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                out.append(s1 + s2)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_bpe(
    df: DataFrame,
    text_col: str,
    merges: Iterable[tuple[str, str]],
    out_col: str = "tokens",
    pattern: str = BPE_ISH_PATTERN,
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: ONE mapInPandas
    scan (Arrow-batched; merge ranks ship by closure — broadcast-small
    by construction, a merge list IS the model), appending *out_col*
    as ``array<string>``.

    Per-batch word→tokens memo: natural text repeats words heavily, so
    each distinct word pays the merge loop once per Arrow batch — the
    standard encode cache, scoped to the batch so executor memory stays
    bounded.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    rx = re.compile(pattern)
    in_schema = df.schema
    names = [f.name for f in in_schema.fields]
    if out_col in names:
        raise ValueError(f"encode_bpe: column {out_col!r} already exists")
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # build a FRESH StructType: StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object
    out_schema = StructType(
        list(in_schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )
    ti = names.index(text_col)

    def run(batches: Iterator) -> Iterator:
        memo: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            toks: list[str] = []
            for w in rx.findall(text or ""):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf[out_col] = [enc(t) for t in pdf.iloc[:, ti]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
