"""Unit tests for the [EXT] tier: dedup, similarity, text analysis
(operators/dedup.py, operators/similarity.py, operators/text.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import dedup as D
from magshield_data_pipeline_spark.operators import similarity as V
from magshield_data_pipeline_spark.operators import text as T


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  quick   brown fox jumps over the lazy dog"),  # exact dup of 1 after normalize
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different text about spark engines here"),
        (5, "ab"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_shingles_basic(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    [row] = df.select(D.word_shingles("text").alias("sh")).collect()
    assert row.sh == ["a b c", "b c d"]


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    [row] = df.select(D.word_shingles("text").alias("sh")).collect()
    assert row.sh == ["a b"]


def test_exact_dedup_keeps_lowest_id(docs):
    out = D.exact_dedup(docs).select("doc_id").collect()
    ids = sorted(r.doc_id for r in out)
    # doc 2 normalizes to doc 1's text → only the lower id survives
    assert ids == [1, 3, 4, 5]


def test_minhash_pairs_exact_dups_always_candidates(docs):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_candidate_pairs(docs).collect()
    }
    # identical normalized text ⇒ identical signature ⇒ all bands collide
    assert (1, 2) in pairs
    # unrelated text should not collide in any band
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_jaccard_identical_docs_is_one(docs):
    rows = {(r.doc_a, r.doc_b): r.jaccard for r in D.jaccard_pairs(docs).collect()}
    assert rows[(1, 2)] == pytest.approx(1.0)
    # near-dup (one word differs) has high but sub-1 similarity
    assert (1, 3) in rows and 0.5 <= rows[(1, 3)] < 1.0


def test_jaccard_max_df_caps_hot_shingles(docs):
    # max_df=1 drops every shingle shared by ≥2 docs — no intersection
    # can survive, so no pairs at all
    assert D.jaccard_pairs(docs, max_df=1).count() == 0
    # a cap above the corpus size is a no-op
    base = {(r.doc_a, r.doc_b) for r in D.jaccard_pairs(docs).collect()}
    capped = {
        (r.doc_a, r.doc_b) for r in D.jaccard_pairs(docs, max_df=1000).collect()
    }
    assert base == capped


def test_simhash_equal_for_identical_text(docs):
    fps = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    assert fps[1] == fps[2]
    assert 0 <= fps[1] < (1 << D.SIMHASH_BITS)
    # different content may collide at 16 bits, but not for these fixtures
    assert fps[1] != fps[4]


@pytest.fixture()
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.95, 0.05]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_brute_force_topk_matches_numpy_ordering(emb):
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = V.brute_force_topk(emb, queries, k=2).collect()
    assert [(r.vec_id, r.rank) for r in out] == [(1, 1), (2, 2)]
    assert out[0].score == pytest.approx(round(_cos([1, 0, 0], [0.9, 0.1, 0.0]), 6))


def test_brute_force_topk_excludes_self(emb):
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = V.brute_force_topk(emb, queries, k=10).collect()
    assert all(r.vec_id != 0 for r in out)
    assert len(out) == 4


def test_ivf_assignment_and_probe(emb):
    # centroids: vec 0 (x-axis) and vec 2 (y-axis)
    centroids = emb.filter(F.col("vec_id").isin([0, 2]))
    assigned = {
        r.vec_id: r.centroid_id
        for r in V.assign_clusters(emb, centroids).collect()
    }
    assert assigned == {0: 0, 1: 0, 2: 2, 3: 2, 4: 2}
    # vec 4 is anti-parallel to centroid 0: cos=-1 vs centroid 2: cos=0 → joins cluster 2
    queries = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    out = V.ivf_topk(emb, centroids, queries, k=3).collect()
    # query 1 lives in cluster 0 → only vec 0 is probed (3 and 2 are in cluster 2)
    assert [r.vec_id for r in out] == [0]


def test_document_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog, quickly.")], ["doc_id", "text"]
    )
    [row] = T.document_profile(df).collect()
    assert row.n_tokens == 6
    assert row.n_stopwords == 3  # the, and, the
    assert row.n_punct == 2  # comma + period
    assert row.lang_guess == "en"
    assert len(row.fp) == 32


def test_lang_id_ties_and_default(spark):
    df = spark.createDataFrame(
        [(1, "xyzzy plugh"), (2, "el que los"), (3, "der und ist")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang_guess for r in T.document_profile(df).collect()}
    assert out[1] == "und"
    assert out[2] == "es"
    assert out[3] == "de"


def test_cosine_arrow_parity_with_sql(emb):
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sql_res = sorted(map(tuple, V.brute_force_topk(emb, queries, k=3, impl="sql").collect()))
    arrow_res = sorted(map(tuple, V.brute_force_topk(emb, queries, k=3, impl="arrow").collect()))
    assert sql_res == arrow_res and len(sql_res) > 0


def test_subtoken_count_bpe_ish(spark):
    df = spark.createDataFrame([(1, "Hello, world42!")], ["doc_id", "text"])
    [row] = df.select(T.subtoken_count("text").alias("n")).collect()
    # Hello , world 4 2 !  → 6 subtokens (digits split individually)
    assert row.n == 6


def test_connected_components_merges_chains(spark):
    from magshield_data_pipeline_spark.operators import dedup as D

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], ["doc_a", "doc_b"]
    )
    out = {r.doc_id: r.cluster_id for r in D.connected_components(edges).collect()}
    # {1,2,3,9} one component labeled by its min; {5,6} another
    assert out == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_star_cc_equals_label_propagation(spark):
    from magshield_data_pipeline_spark.operators import dedup as D

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3), (7, 7), (10, 11), (11, 5)],
        ["doc_a", "doc_b"],
    )
    # self-loop (7,7) contributes no component membership in either
    want = {
        r.doc_id: r.cluster_id
        for r in D.connected_components(edges, max_iter=30).collect()
    }
    got = {
        r.doc_id: r.cluster_id
        for r in D.connected_components_star(edges).collect()
    }
    assert got == {k: v for k, v in want.items() if k != 7}


def test_star_cc_long_chain_converges_fast(spark):
    # a 64-node path: diameter 63 — label propagation's worst case,
    # where the star algorithm's whole point is O(log²) contraction
    from magshield_data_pipeline_spark.operators import dedup as D

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["doc_a", "doc_b"]
    )
    out = {
        r.doc_id: r.cluster_id
        for r in D.connected_components_star(edges, max_iter=10).collect()
    }
    assert out == {i: 1 for i in range(1, n + 1)}


def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    # checkpoint_dir switches lineage truncation from executor-local
    # blocks to reliable checkpoint files (survives executor loss on a
    # real cluster); clusters must be identical either way
    from magshield_data_pipeline_spark.operators import dedup as D

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3), (10, 11), (11, 5)],
        ["doc_a", "doc_b"],
    )
    ckpt = str(tmp_path / "ckpt")
    want = {
        r.doc_id: r.cluster_id for r in D.connected_components(edges).collect()
    }
    got_lp = {
        r.doc_id: r.cluster_id
        for r in D.connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    got_star = {
        r.doc_id: r.cluster_id
        for r in D.connected_components_star(edges, checkpoint_dir=ckpt).collect()
    }
    assert got_lp == want
    assert got_star == want
    # the reliable path actually wrote checkpoint data
    import os

    assert any(os.scandir(ckpt))


def test_split_assign_proportions_and_stability(spark):
    from magshield_data_pipeline_spark.operators import sampling as SA

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    sel = df.select(
        "doc_id",
        SA.split_assign(F.col("doc_id")).alias("split"),
        SA.sample_flag(F.col("doc_id")).alias("in_sample"),
    )
    counts = {r.split: r.n for r in sel.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03
    # growth stability: the same doc gets the same split in a larger corpus
    bigger = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    merged = (
        sel.alias("a")
        .join(
            bigger.select(
                "doc_id", SA.split_assign(F.col("doc_id")).alias("split2")
            ).alias("b"),
            "doc_id",
        )
        .filter(F.col("split") != F.col("split2"))
    )
    assert merged.count() == 0


def test_cosine_zero_vector_yields_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], ["vec_id", "embedding"]
    )
    queries = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # the zero vector must appear WITH a null score (not raise
    # DIVIDE_BY_ZERO, not be silently dropped), in both scoring paths
    for impl in ("sql", "arrow"):
        rows = V.brute_force_topk(df, queries, k=5, impl=impl).collect()
        scores = {r.vec_id: r.score for r in rows}
        assert 2 in scores and scores[2] is None


# ---------------------------------------------------------------------------
# curation tier 2: repetition, PII, n-grams, contamination


def test_repetition_profile_flags_repeats(spark):
    rows = [
        (1, "buy now. buy now. buy now. unique line."),
        (2, "one sentence. another sentence. a third one."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in T.repetition_profile(df).collect()}
    assert out[1].n_sents == 4 and out[1].n_unique_sents == 2
    assert out[1].is_repetitive is True
    assert out[2].n_sents == out[2].n_unique_sents == 3
    assert out[2].rep_ratio == 0.0 and out[2].is_repetitive is False


def test_pii_redaction_masks_and_counts(spark):
    rows = [(1, "mail me at jo.doe+x@test.org or call +1 (555) 123-4567 now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    [r] = T.pii_profile(df).collect()
    assert r.n_emails == 1 and r.n_phones == 1
    [red] = df.select(T.redact_pii("text").alias("t")).collect()
    assert red.t == "mail me at [EMAIL] or call [PHONE] now"


def test_top_ngrams_counts_and_tiebreak(spark):
    rows = [(1, "a b a b"), (2, "a b c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = [(r.gram, r.n) for r in T.top_ngrams(df, k=3).collect()]
    # 'a b' ×3 ('a b a b' has two, 'a b c' one); ties break by gram asc
    assert out == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_contamination_check_exact_and_shingle(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "totally unrelated training material right here")],
        ["doc_id", "text"])
    test = spark.createDataFrame(
        [(10, "THE quick brown fox jumps over the lazy dog"),  # exact after norm
         (11, "the quick brown fox sat down quietly"),          # shares shingles
         (12, "nothing in common with any training doc")],
        ["doc_id", "text"])
    out = {r.test_id: r for r in T.contamination_check(train, test).collect()}
    assert out[10].exact_dup is True and out[10].n_train_matches == 1
    assert out[11].exact_dup is False and out[11].n_train_matches == 1
    assert out[12].exact_dup is False and out[12].n_train_matches == 0


def test_srp_identical_vectors_collide_in_every_band(spark):
    from magshield_data_pipeline_spark.operators import similarity as V

    planes = V.srp_hyperplanes(n_bands=4, rows_per_band=8, dim=4, seed=7)
    rows = [
        (1, [0.5, -0.25, 0.75, 0.1]),
        (2, [0.5, -0.25, 0.75, 0.1]),   # identical → same bucket, all bands
        (3, [-0.5, 0.25, -0.75, -0.1]),  # antipodal → opposite sign bits
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    buckets = {
        (r.vec_id, r.band): r.bucket
        for r in V.srp_band_buckets(df, planes).collect()
    }
    for band in range(4):
        assert buckets[(1, band)] == buckets[(2, band)]
        # antipodal vector flips every sign bit → bitwise complement
        assert buckets[(3, band)] == (~buckets[(1, band)]) & 0xFF
    pairs = {
        (r.vec_a, r.vec_b)
        for r in V.srp_candidate_pairs(df, planes).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_hll_shard_merge_equals_global_sketch(spark):
    # merging per-shard sketches must estimate the same cardinality as
    # one global sketch (within HLL error — the union can promote the
    # sketch representation, so estimates are close, not bit-identical);
    # this is what makes pre-aggregated per-partition sketches safe to
    # materialize and union at query time
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select((F.col("id") % 1300).alias("uid"))
    global_est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("e")
    ).collect()[0]["e"]
    merged_est = (
        df.groupBy((F.col("uid") % 8).alias("shard"))
        .agg(F.hll_sketch_agg("uid").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged_est - global_est) / 1300 <= 0.02
    assert abs(merged_est - 1300) / 1300 <= 0.05
    assert abs(global_est - 1300) / 1300 <= 0.05

def test_sharded_hll_estimate_within_tolerance(spark):
    # the registry query hash-checks only exact_users + n_shards (the
    # estimate is engine-specific); the 5% tolerance contract lives HERE
    from magshield_data_pipeline_spark.sources.parquet import read_table
    from tests.conftest import SF_SMALL

    events = read_table(spark, SF_SMALL, "events")
    sketches = events.groupBy((F.col("user_id") % 8).alias("shard")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    approx = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    exact = events.agg(F.count_distinct("user_id").alias("n")).collect()[0]["n"]
    assert exact > 0
    assert abs(approx - exact) / exact <= 0.05


def test_stateless_band_buckets_match_relational_form(spark):
    """The streaming-safe projection form (array_min/transform) must
    produce EXACTLY the relational form's (id, band, bucket) rows —
    the two implement ONE banding scheme.  Regression coverage for the
    transform-lambda arity trap: a two-parameter lambda is pyspark's
    (element, index) form, which silently rebinds a default-captured
    seed to the array-index Column and shifts every min-hash."""
    from magshield_data_pipeline_spark.operators import dedup as D
    from magshield_data_pipeline_spark.sources.parquet import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    rel = sorted(map(tuple, D.lsh_band_buckets(docs).collect()))
    sl = sorted(map(tuple, D.lsh_band_buckets_stateless(docs).collect()))
    assert rel == sl


def test_stateless_band_buckets_is_aggregation_free(spark):
    # the whole point of the stateless form: no groupBy/Exchange, so a
    # stream can derive buckets inside its scan stage
    from magshield_data_pipeline_spark.operators import dedup as D
    from magshield_data_pipeline_spark.sources.parquet import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    plan = (
        D.lsh_band_buckets_stateless(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Aggregate" not in plan, plan[:800]


def test_rag_cid_packing_distinct_past_100_chunks(spark):
    # VERDICT r9 item 3: the old cid = doc_id*100+pos packing silently
    # merged chunks from ADJACENT docs once a doc exceeded 100 chunks
    # (doc 1 pos 100 == doc 2 pos 0) — invisible to the oracle because
    # it mirrored the formula.  Two adjacent 150-chunk docs must now
    # yield 300 distinct cids with disjoint per-doc ranges.
    from magshield_data_pipeline_spark.plans.ext_queries import (
        _RAG_CHUNK_STRIDE,
        _RAG_CID_BASE,
        rag_survivor_chunks,
    )

    n_chunks = 150
    # +10 (not +1): the tail chunk must span a full 9-char token so it
    # contains the doc marker — a 1-char tail is the same digit in both
    # docs and would legitimately dedup away
    length = _RAG_CHUNK_STRIDE * (n_chunks - 1) + 10  # exactly 150 starts

    def _text(doc): # non-repeating so no chunk dedups away
        s = "".join(f"{doc}x{i:07d}" for i in range(length // 9 + 1))
        return s[:length]

    base = spark.createDataFrame(
        [(1, _text(1)), (2, _text(2))], "doc_id long, t string"
    )
    sv = rag_survivor_chunks(base).collect()
    assert len(sv) == 2 * n_chunks
    cids = [r.cid for r in sv]
    assert len(set(cids)) == 2 * n_chunks  # no silent merges
    doc1 = {c for c in cids if c < 2 * _RAG_CID_BASE}
    doc2 = set(cids) - doc1
    assert len(doc1) == n_chunks and len(doc2) == n_chunks
    assert max(doc1) == _RAG_CID_BASE + n_chunks - 1
    assert min(doc2) == 2 * _RAG_CID_BASE


def test_rag_incremental_epoch_kills_and_replay(spark):
    # r11 (VERDICT r10 item 3): the epoch's dedup probe must kill BOTH
    # planted dup classes (template docs and byte-copies of corpus
    # docs), admit only genuinely novel chunks, and replaying the
    # registered query must add NO index versions and return identical
    # scores.
    from magshield_data_pipeline_spark.plans.ext_queries import (
        _RAG_CID_BASE,
        rag_inc_epoch_frames,
    )
    from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
    from magshield_data_pipeline_spark.sources import snapshots as SN
    from tests.conftest import SF_SMALL

    fr = rag_inc_epoch_frames(spark, SF_SMALL)
    n_delta_sv = fr["dsv"].count()
    novel_cids = [r.cid for r in fr["novel"].select("cid").collect()]
    assert 0 < len(novel_cids) < n_delta_sv, "no index kill — no teeth"
    # every novel chunk comes from a reversed (genuinely new) doc:
    # %6 in {0,3} (template / byte-copy) must all die at the fp probe
    for cid in novel_cids:
        orig_doc = cid // _RAG_CID_BASE - 700000
        assert orig_doc % 6 not in (0, 3), f"dup chunk admitted: {cid}"
    fn = QUERY_REGISTRY["rag_incremental_index"].fn
    first = {(r.term, r.rank): (r.cid, r.tf, r.dl, r.score)
             for r in fn(spark, SF_SMALL).collect()}
    p = fr["paths"]
    vs = {t: SN.versions(p[t])
          for t in ("chunks", "meta", "postings", "df", "totals")}
    assert vs == {"chunks": [1, 2], "meta": [1, 2], "postings": [1, 2, 3],
                  "df": [1, 2], "totals": [1, 2]}
    second = {(r.term, r.rank): (r.cid, r.tf, r.dl, r.score)
              for r in fn(spark, SF_SMALL).collect()}
    assert first == second
    assert {t: SN.versions(p[t]) for t in vs} == vs
    # the evolved df really is old + delta (additive fold, not rebuilt)
    old_df = {r.word: r.df for r in SN.read(spark, p["df"], 1).collect()}
    new_df = {r.word: r.df for r in SN.read(spark, p["df"], 2).collect()}
    ndf = {r.word: r.df_delta for r in fr["ndf"].collect()}
    for w, d in ndf.items():
        assert new_df[w] == old_df.get(w, 0) + d
    for w, d in old_df.items():
        assert new_df[w] == d + ndf.get(w, 0)


def test_ann_codebook_refresh_drift_has_teeth(spark):
    # r11 (VERDICT r10 item 4): the refresh must demonstrably change
    # retrieval decisions (flips > 0 on the planted codebook drift),
    # recall is bounded by k, and the codebook versions are real
    # ledger commits readable by both version AND timestamp travel.
    import os

    from magshield_data_pipeline_spark.plans.ext_queries import _PQ_K
    from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import scratch_path
    from tests.conftest import SF_SMALL

    rows = QUERY_REGISTRY["ann_codebook_refresh"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert sum(r.flips for r in rows) > 0, "no retrieval decision flipped"
    for r in rows:
        assert 0 <= r.hits_v1 <= _PQ_K and 0 <= r.hits_v2 <= _PQ_K
        assert r.flips <= 2 * _PQ_K
    root = scratch_path(
        "ann_cb", SF_SMALL,
        "codebook_tbl v1=(vec_id % 50 = 0 AND vec_id < 1000) "
        "v2=(vec_id % 50 = 25 AND vec_id < 2000)",
    )
    tbl = os.path.join(root, "codebook_tbl")
    assert SN.versions(tbl) == [1, 2]
    # timestamp travel agrees with version travel on the same commit
    ts1 = SN.read_manifest(tbl, 1)["committed_at"]
    assert (SN.read(spark, tbl, as_of=ts1).count()
            == SN.read(spark, tbl, 1).count())
    v1_ids = {r.vec_id for r in SN.read(spark, tbl, 1).select("vec_id").collect()}
    v2_ids = {r.vec_id for r in SN.read(spark, tbl, 2).select("vec_id").collect()}
    assert v1_ids and v2_ids and v1_ids.isdisjoint(v2_ids)  # planted drift
