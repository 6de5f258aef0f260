"""BPE trainer/encoder parity: the distributed implementation
(operators/bpe.py) against an independent pure-Python reference
implementing Sennrich et al.'s algorithm directly on word-frequency
dicts — merges, greedy overlap semantics, tiebreaks, and the
training-consistency contract of ``encode_word``."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators.bpe import (
    apply_merge,
    encode_bpe,
    encode_word,
    pair_counts,
    top_pair,
    train_bpe,
    word_frequencies,
)
from magshield_data_pipeline_spark.operators.text import BPE_ISH_PATTERN


# --- independent reference (pure Python, dict-based) -------------------


def ref_word_freq(texts: list[str]) -> dict[str, int]:
    rx = re.compile(BPE_ISH_PATTERN)
    wf: dict[str, int] = {}
    for t in texts:
        for w in rx.findall(t):
            wf[w] = wf.get(w, 0) + 1
    return wf


def ref_merge_pass(syms: list[str], s1: str, s2: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
            out.append(s1 + s2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    table = {w: (list(w), n) for w, n in ref_word_freq(texts).items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in table.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        # max count, lexicographic (s1, s2) tiebreak — the operator's
        # documented determinism contract
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        table = {
            w: (ref_merge_pass(syms, *best), n)
            for w, (syms, n) in table.items()
        }
    return merges


# --- unit semantics -----------------------------------------------------


def test_apply_merge_greedy_left_to_right_overlaps(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["a"],), ([],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(
            apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    # resume-after-merge: aaa -> [aa, a], aaaa -> [aa, aa]
    assert got == [["aa", "a"], ["aa", "aa"], ["a"], []]


def test_top_pair_tiebreak_is_lexicographic(spark):
    # 'ba' and 'ab' pairs tie at count 2 -> (a,b) wins over (b,a)
    wf = spark.createDataFrame(
        [("ab", 2, ["a", "b"]), ("ba", 2, ["b", "a"])],
        "word string, n long, syms array<string>",
    )
    assert top_pair(pair_counts(wf)) == ("a", "b")


def test_word_frequencies_matches_reference(spark):
    texts = ["the cat, the hat!", "a cat 9 lives", ""]
    df = spark.createDataFrame([(t,) for t in texts], "body string")
    got = {
        r["word"]: r["n"]
        for r in word_frequencies(df, "body").collect()
    }
    assert got == ref_word_freq(texts)


def test_encode_word_reproduces_training_table_state():
    """The training-consistency contract: encoding a training word with
    the learned ranks yields exactly the symbols the training table
    held for that word after the last merge."""
    texts = ["low lower lowest", "low low newer newest", "wider wide"]
    merges = ref_train(texts, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    table = {w: list(w) for w in ref_word_freq(texts)}
    for p in merges:
        table = {w: ref_merge_pass(s, *p) for w, s in table.items()}
    for w, final_syms in table.items():
        assert encode_word(w, ranks) == final_syms, w


# --- end-to-end parity, Spark vs reference ------------------------------


def test_train_bpe_matches_reference_merges(spark):
    texts = [
        "low lower lowest low",
        "new newer newest new new",
        "the cat sat on the mat",
        "wide wider widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "body string")
    assert train_bpe(df, "body", 10) == ref_train(texts, 10)


def test_train_bpe_lineage_truncation_preserves_results(spark):
    texts = ["aaa bbb aaa ccc aab", "abc abc aab aaa"]
    df = spark.createDataFrame([(t,) for t in texts], "body string")
    assert train_bpe(df, "body", 9, lineage_every=2) == ref_train(texts, 9)


def test_train_bpe_stops_when_no_pairs_remain(spark):
    # single-char words only: zero adjacent pairs, zero merges
    df = spark.createDataFrame([("a b c ! 7",)], "body string")
    assert train_bpe(df, "body", 5) == []


def test_encode_bpe_matches_reference_and_keeps_schema(spark):
    texts = [
        "low lower lowest low",
        "new newer newest new new",
        "the cat sat on the mat",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, body string"
    )
    merges = ref_train(texts, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    rx = re.compile(BPE_ISH_PATTERN)

    def ref_encode(t: str) -> list[str]:
        out: list[str] = []
        for w in rx.findall(t):
            out.extend(encode_word(w, ranks))
        return out

    got = {
        r["doc_id"]: r["tokens"]
        for r in encode_bpe(df, "body", merges).collect()
    }
    assert got == {i: ref_encode(t) for i, t in enumerate(texts)}


def test_encode_bpe_refuses_column_collision(spark):
    df = spark.createDataFrame([(1, "x", ["y"])], "id long, body string, tokens array<string>")
    with pytest.raises(ValueError, match="already exists"):
        encode_bpe(df, "body", [], out_col="tokens")


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_train_bpe_property_parity(texts, n_merges):
    """Property check on adversarial tiny corpora (heavy 'a'/'b'
    repetition maximizes overlap and tie cases) — Spark training must
    equal the dict-based reference exactly, merges and order."""
    spark = _PROP_SPARK[0]
    df = spark.createDataFrame([(t,) for t in texts], "body string")
    assert train_bpe(df, "body", n_merges) == ref_train(texts, n_merges)


# hypothesis can't take pytest fixtures directly; stash the session
_PROP_SPARK: list = []


@pytest.fixture(autouse=True)
def _stash_spark(spark):
    _PROP_SPARK.clear()
    _PROP_SPARK.append(spark)


# --- scale posture -------------------------------------------------------


def _physical_plan(df) -> str:
    return df.sparkSession._jsparkSession.sessionState().executePlan(
        df._jdf.queryExecution().logical(),
        df._jdf.queryExecution().mode(),
    ).executedPlan().toString()


def test_training_iteration_is_jvm_side_with_partial_agg(spark):
    """The per-merge rollup must never leave the JVM (no Python eval in
    the training loop's hot path) and must map-side combine before its
    one exchange — the property that keeps a merge iteration O(vocab)
    network-wise at 100 TB."""
    df = spark.createDataFrame([("low lower lowest",)], "body string")
    wf = word_frequencies(df, "body")
    plan = _physical_plan(pair_counts(wf.withColumn("syms", apply_merge(F.col("syms"), "l", "o"))))
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, f"training left the JVM: {py_node}"
    assert "partial_sum" in plan or "partial_count" in plan
