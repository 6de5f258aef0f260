"""BM25 retrieval operator (operators/retrieval.py) — the registry
query `bm25_topk_docs` carries the DuckDB hash parity; these pin the
operator contracts the oracle cannot observe."""

from __future__ import annotations

import math

import pytest

from magshield_data_pipeline_spark.operators import retrieval as R


def test_empty_terms_raise(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="terms must be non-empty"):
        R.bm25_topk(df, "text", "doc_id", [])


def test_scores_match_handwritten_bm25(spark):
    # tiny corpus with known tf/dl/df; rational-odds idf = the exact
    # argument of textbook log-idf
    rows = [
        (1, "spark spark join"),
        (2, "join filter scan"),
        (3, "scan scan scan scan"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["term"], r["doc_id"]): r
        for r in R.bm25_topk(df, "text", "doc_id", ["spark", "join"]).collect()
    }
    n_docs, avgdl = 3.0, (3 + 3 + 4) / 3.0

    def expect(tf, dl, dfreq):
        idf = (n_docs - dfreq + 0.5) / (dfreq + 0.5)
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert out[("spark", 1)]["score"] == pytest.approx(expect(2, 3, 1), abs=0)
    assert out[("join", 1)]["score"] == pytest.approx(expect(1, 3, 2), abs=0)
    assert out[("join", 2)]["score"] == pytest.approx(expect(1, 3, 2), abs=0)
    assert ("spark", 3) not in out  # no hit, no row


def test_rank_is_total_ordered_and_capped(spark):
    rows = [(i, "join word") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = R.bm25_topk(df, "text", "doc_id", ["join"], k=5).collect()
    # identical scores everywhere -> doc_id tiebreak picks the 5 lowest
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3, 4]
    assert sorted(r["rank"] for r in got) == [1, 2, 3, 4, 5]


def test_odds_idf_is_monotone_in_log_idf():
    # the documented rank-equivalence claim: odds and ln(odds) order
    # identically over achievable (df, N) pairs
    n = 50
    odds = [(n - df + 0.5) / (df + 0.5) for df in range(1, n + 1)]
    logs = [math.log(o) for o in odds]
    assert sorted(range(n), key=odds.__getitem__) == sorted(
        range(n), key=logs.__getitem__
    )


def test_cache_handle_releases_the_words_frame(spark):
    # ADVICE r7: the persisted words frame must be caller-releasable —
    # long-lived sessions calling bm25_topk over DIFFERENT inputs would
    # otherwise accumulate cache entries until session end
    df = spark.createDataFrame([(1, "alpha beta"), (2, "beta")],
                               ["doc_id", "text"])
    out = R.bm25_topk(df, "text", "doc_id", ["beta"], k=2)
    assert out.count() == 2  # consuming action materializes the cache
    words = out.bm25_words_cache
    assert words.storageLevel.useMemory  # persisted while in use
    words.unpersist(blocking=True)
    assert not words.storageLevel.useMemory  # released on demand


def test_cache_handle_explicit_channel_survives_transformations(spark):
    # ADVICE r8: the ad-hoc attribute lives on ONE DataFrame object —
    # any downstream transformation returns a new frame without it.
    # cache_out is the explicit channel that long-lived callers use.
    df = spark.createDataFrame([(1, "alpha beta"), (2, "beta")],
                               ["doc_id", "text"])
    handles: list = []
    out = R.bm25_topk(df, "text", "doc_id", ["beta"], k=2,
                      cache_out=handles)
    transformed = out.filter("rank = 1")  # attribute lost here...
    assert not hasattr(transformed, "bm25_words_cache")
    assert transformed.count() == 1
    (words,) = handles  # ...but the explicit handle survives
    assert words.storageLevel.useMemory
    words.unpersist(blocking=True)
    assert not words.storageLevel.useMemory
