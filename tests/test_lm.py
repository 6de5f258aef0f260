"""n-gram LM fluency scorer: parity with an independent pure-Python
reference (counts, quantized-log scoring, unseen-gram handling) plus
the broadcast-join/no-UDF plan posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators.lm import (
    char_ngrams,
    fluency_score,
    train_ngram_counts,
)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]
SCORE = [
    (0, "the cat sat"),        # fluent: every trigram well-attested
    (1, "zqx zzq qqz"),        # gibberish: almost no model hits
    (2, "THE CAT"),            # case folding must apply
    (3, "ab"),                 # shorter than n: zero grams
]


def ref_counts(texts, n=3):
    counts: dict[str, int] = {}
    for t in texts:
        t = t.lower()
        for i in range(len(t) - n + 1):
            g = t[i : i + n]
            counts[g] = counts.get(g, 0) + 1
    return counts


def ref_score(text, counts, n=3):
    t = text.lower()
    grams = [t[i : i + n] for i in range(len(t) - n + 1)] if len(t) >= n else []
    hits = [g for g in grams if g in counts]
    return (
        len(hits),
        len(grams),
        sum(counts[g].bit_length() - 1 for g in hits),
    )


def test_char_ngrams_boundaries(spark):
    df = spark.createDataFrame([("abcd",), ("abc",), ("ab",), ("",)], "t string")
    got = [r["g"] for r in df.select(char_ngrams("t", 3).alias("g")).collect()]
    assert got == [["abc", "bcd"], ["abc"], [], []]
    with pytest.raises(ValueError, match="n must be"):
        char_ngrams("t", 0)


def test_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TRAIN], "body string")
    got = {
        r["gram"]: r["cnt"]
        for r in train_ngram_counts(df, "body", n=3).collect()
    }
    assert got == ref_counts(TRAIN)


def test_fluency_score_matches_reference_and_handles_unseen(spark):
    corpus = spark.createDataFrame([(t,) for t in TRAIN], "body string")
    model = train_ngram_counts(corpus, "body", n=3)
    docs = spark.createDataFrame(SCORE, "doc_id long, body string")
    got = {
        r["doc_id"]: (r["lm_hits"], r["lm_grams"], r["lm_score"])
        for r in fluency_score(docs, model, "body", "doc_id", n=3).collect()
    }
    counts = ref_counts(TRAIN)
    expected = {i: ref_score(t, counts) for i, t in SCORE}
    assert got == expected
    # the scorer must separate fluent from gibberish decisively
    assert got[0][2] > 0 and got[1][0] <= 1
    # every document appears, including the too-short one (0, 0, 0)
    assert got[3] == (0, 0, 0)


def test_score_plan_is_broadcast_join_no_udf(spark):
    corpus = spark.createDataFrame([(t,) for t in TRAIN], "body string")
    model = train_ngram_counts(corpus, "body", n=3)
    docs = spark.createDataFrame(SCORE, "doc_id long, body string")
    scored = fluency_score(docs, model, "body", "doc_id", n=3)
    plan = scored.sparkSession._jsparkSession.sessionState().executePlan(
        scored._jdf.queryExecution().logical(),
        scored._jdf.queryExecution().mode(),
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "model table must broadcast"
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, f"scoring left the JVM: {py_node}"
    assert "partial_count" in plan or "partial_sum" in plan


# ---------------------------------------------------------------------------
# DSIR importance weights


def test_dsir_model_and_scores_match_reference(spark):
    """Both models from ONE conditional-agg scan; scores equal a pure-
    Python fold of Σ[floor(log2 t_cnt) − floor(log2 r_cnt)]."""
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the log", "en"),
        (2, "le chat est sur le tapis", "fr"),
        (3, "the cat sat", "fr"),   # en-looking text, fr label
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string, lang string")
    from magshield_data_pipeline_spark.operators.lm import dsir_model, dsir_scores

    model = dsir_model(docs, "body", F.col("lang") == "en", n=3)
    got = {
        (r.doc_id): (r.n_grams, r.target_hits, r.dsir_score)
        for r in dsir_scores(docs, model, "body", "doc_id", n=3).collect()
    }

    r_counts = ref_counts([t for _, t, _ in rows])
    t_counts = ref_counts([t for _, t, lang in rows if lang == "en"])

    def ref_dsir(text, n=3):
        t = text.lower()
        grams = [t[i : i + n] for i in range(len(t) - n + 1)]
        score = sum(
            (t_counts[g].bit_length() - 1 if g in t_counts else 0)
            - (r_counts[g].bit_length() - 1)
            for g in grams
            if g in r_counts
        )
        hits = sum(1 for g in grams if g in t_counts)
        return (len(grams), hits, score)

    for doc_id, text, _ in rows:
        assert got[doc_id] == ref_dsir(text), f"doc {doc_id}"
    # selection signal: the en-looking fr doc must hit the target model
    # at a far higher per-gram rate than the true-fr doc — that
    # mislabeled doc is exactly what DSIR selects. (The quantized-log
    # SCORE ordering needs counts ≥2 to separate; at this fixture's
    # singleton counts floor(log2 1) = 0 on both sides, so the hit
    # rate is the scale-free assertion.)
    hit_rate = lambda d: got[d][1] / got[d][0]  # noqa: E731
    assert hit_rate(3) > 2 * hit_rate(2)
    assert hit_rate(0) > 0.9  # in-target doc: nearly every gram known


def test_dsir_plan_single_scan_model_broadcast_join(spark):
    """The paired model must not cost a second corpus scan (conditional
    agg, one Aggregate over one explode) and the scorer must broadcast
    it, all JVM-side."""
    rows = [(i, "text body here", "en" if i % 2 else "fr") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, body string, lang string")
    from magshield_data_pipeline_spark.operators.lm import dsir_model, dsir_scores

    model = dsir_model(docs, "body", F.col("lang") == "en", n=3)
    scored = dsir_scores(docs, model, "body", "doc_id", n=3)
    plan = scored.sparkSession._jsparkSession.sessionState().executePlan(
        scored._jdf.queryExecution().logical(),
        scored._jdf.queryExecution().mode(),
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "model table must broadcast"
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, f"scoring left the JVM: {py_node}"
    assert plan.count("Generate explode") <= 2, (
        "model should cost ONE explode (conditional agg), scoring one more"
    )
