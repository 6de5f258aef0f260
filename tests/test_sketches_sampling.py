"""Round-5 additions: Count-Min Sketch, E-S weighted sampling,
semantic dedup, one-pass Gram matrix."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from magshield_data_pipeline_spark.operators import sampling as SA
from magshield_data_pipeline_spark.operators import sketches as SK
from magshield_data_pipeline_spark.operators import similarity as V
from magshield_data_pipeline_spark.sources.parquet import read_table

from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# Count-Min Sketch


def test_cms_never_underestimates_and_collides_sanely(spark):
    # event_id as key: ~1000 distinct keys in 128 buckets forces real
    # collisions, exercising both CMS guarantees: est >= exact always,
    # and min-over-depth keeps the overestimate modest.
    events = read_table(spark, SF_SMALL, "events")
    sketch = SK.cms_sketch(events, "event_id")
    exact = events.groupBy(F.col("event_id").cast("string").alias("event_id")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    est = SK.cms_estimate(sketch, exact.select("event_id"), "event_id")
    rows = est.join(exact, "event_id").collect()
    assert len(rows) > 100
    assert all(r["est_count"] >= r["exact"] for r in rows)
    # depth=4 min keeps typical error small even with ~3x bucket load
    n_total = events.count()
    assert all(r["est_count"] - r["exact"] <= n_total * 0.1 for r in rows)
    # at least one collision should exist at this key cardinality —
    # otherwise the test isn't exercising the estimate path at all
    assert any(r["est_count"] > r["exact"] for r in rows)


def test_cms_shard_merge_equals_global_sketch(spark):
    # linearity: cell-wise sum of per-shard sketches == the sketch of
    # the union — the property that lets 100 TB pipelines materialize
    # sketches per partition/day and merge at query time
    events = read_table(spark, SF_SMALL, "events")
    global_sk = SK.cms_sketch(events, "user_id")
    per_shard = SK.cms_sketch(
        events, "user_id", shard_col=F.col("event_id") % 5
    )
    merged = SK.cms_merge(per_shard)
    assert merged.exceptAll(global_sk).isEmpty()
    assert global_sk.exceptAll(merged).isEmpty()


def test_cms_bucket_sql_matches_spark(spark):
    # the DuckDB twin must compute the identical bucket for any key
    import duckdb

    keys = ["signup", "click", "error", "view", "purchase", "u123", ""]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        d: {
            r["k"]: r["b"]
            for r in df.select(
                "k", SK.cms_bucket(F.col("k"), d).alias("b")
            ).collect()
        }
        for d in range(SK.CMS_DEPTH)
    }
    con = duckdb.connect()
    for d in range(SK.CMS_DEPTH):
        for k in keys:
            lit = "'" + k + "'"
            want = con.execute(
                f"SELECT {SK.cms_bucket_sql(lit, d)}"
            ).fetchone()[0]
            assert got[d][k] == want, (d, k)


# ---------------------------------------------------------------------------
# Efraimidis–Spirakis weighted sampling


def test_es_key_nonpositive_weight_is_null(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -4.0), (4, None)], "id long, w double"
    )
    rows = df.select(
        "id", SA.es_weight_key(F.col("id"), F.col("w")).alias("k")
    ).collect()
    by_id = {r["id"]: r["k"] for r in rows}
    assert by_id[1] is not None
    assert by_id[2] is None and by_id[3] is None and by_id[4] is None


def test_es_key_monotone_in_weight(spark):
    # same id → same u; a larger weight must give a larger (closer to
    # zero) key: ln(u) < 0, so ln(u)/w increases with w
    df = spark.createDataFrame([(7, 10.0), (7, 1000.0)], "id long, w double")
    k_small, k_big = [
        r["k"]
        for r in df.select(
            SA.es_weight_key(F.col("id"), F.col("w")).alias("k")
        ).collect()
    ]
    assert k_big > k_small


def test_es_sampling_favors_heavy_rows(spark):
    # statistical property over many salts: a row with 50x the weight
    # of 99 peers should win the top-1 draw far more often than 1/100
    rows = [(i, 50.0 if i == 0 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    wins = 0
    trials = 40
    for t in range(trials):
        top = (
            df.select(
                "id", SA.es_weight_key(F.col("id"), F.col("w"), salt=f"s{t}").alias("k")
            )
            .orderBy(F.col("k").desc(), "id")
            .first()
        )
        wins += top["id"] == 0
    # expected win rate = 50/149 ≈ 0.34; uniform would be 0.01.
    # P(wins < 4 | p=.34) is astronomically small; flake-proof bound.
    assert wins >= 4, wins


def test_es_key_matches_duckdb_formula(spark):
    import duckdb

    docs = read_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 50)
    got = {
        r["doc_id"]: r["k"]
        for r in docs.select(
            "doc_id",
            SA.es_weight_key(F.col("doc_id"), F.col("n_chars")).alias("k"),
        ).collect()
    }
    con = duckdb.connect()
    expr = SA.es_weight_key_sql("doc_id", "n_chars")
    want = dict(
        con.execute(
            f"SELECT doc_id, {expr} AS k FROM '{SF_SMALL}/documents.parquet' "
            "WHERE doc_id < 50"
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# semantic dedup


def test_semantic_dedup_matches_numpy_brute_force(spark):
    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 120)
    centroids = emb.filter(F.col("vec_id") % 40 == 0)
    got = {
        r["vec_id"]: r["kept"]
        for r in V.semantic_dedup(emb, centroids, threshold=0.3).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent_rows = [(i, v) for i, v in zip(ids, mat) if i % 40 == 0]
    # nearest centroid by rounded cosine, ties to lowest centroid id
    assign = {}
    for i, v in zip(ids, mat):
        best = max(
            cent_rows, key=lambda cr: (round(float(v @ cr[1]), 6), -cr[0])
        )
        assign[i] = best[0]
    want = {}
    for b, vb in zip(ids, mat):
        dropped = any(
            a < b
            and assign[a] == assign[b]
            and round(float(va @ vb), 6) >= 0.3
            for a, va in zip(ids, mat)
        )
        want[b] = not dropped
    assert got == want
    # the threshold must actually drop something at 0.3 on this slice,
    # or the test proves nothing
    assert not all(got.values())


# ---------------------------------------------------------------------------
# Gram matrix


def test_gram_matrix_matches_numpy(spark):
    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 200)
    out = V.gram_matrix(emb).collect()
    rows = emb.select("embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d = mat.shape[1]
    assert len(out) == d * (d + 1) // 2
    # reproduce the quantized-addend discipline: round each product to
    # 6 decimals before summing
    for r in out[:200]:
        i, j = r["i"], r["j"]
        want = round(float(np.sum(np.round(mat[:, i] * mat[:, j], 6))), 6)
        assert math.isclose(r["g"], want, abs_tol=5e-7), (i, j, r["g"], want)
        assert r["n_rows"] == mat.shape[0]
    assert all(r["i"] <= r["j"] for r in out)


# ---------------------------------------------------------------------------
# product quantization


def test_pq_codebook_entries_encode_to_themselves(spark):
    # a vector that IS a codebook entry has distance exactly 0 to its
    # own chunk in every subspace — it must take its own code id
    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 300)
    codebook = emb.filter(F.col("vec_id") % 50 == 0)
    codes = V.pq_encode(emb, codebook, m=8, subdim=8).collect()
    cb_ids = {r["vec_id"] for r in codebook.select("vec_id").collect()}
    for r in codes:
        if r["vec_id"] in cb_ids:
            assert r["code_id"] == r["vec_id"], r


def test_pq_adc_score_equals_numpy_reconstruction(spark):
    # ADC property: approx_score(q, x) == dot(q, reconstruct(x)) where
    # reconstruct stitches x's per-subspace codebook chunks — with each
    # subspace part rounded to 6 decimals, exactly as the operator does
    m, sub = 8, 8
    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 150)
    codebook = emb.filter(F.col("vec_id") % 50 == 0)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): r["approx_score"]
        for r in V.pq_topk(emb, codebook, queries, k=1000, m=m, subdim=sub).collect()
    }
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    cb = {i: v for i, v in vecs.items() if i % 50 == 0}
    codes = {
        (r["vec_id"], r["s"]): r["code_id"]
        for r in V.pq_encode(emb, codebook, m=m, subdim=sub).collect()
    }
    for (qid, vid), score in list(got.items())[:100]:
        q = vecs[qid]
        want = round(
            sum(
                round(
                    float(
                        q[s * sub : (s + 1) * sub]
                        @ cb[codes[(vid, s)]][s * sub : (s + 1) * sub]
                    ),
                    6,
                )
                for s in range(m)
            ),
            6,
        )
        assert math.isclose(score, want, abs_tol=1e-9), (qid, vid, score, want)


# ---------------------------------------------------------------------------
# KMV sketch


def test_kmv_overlap_estimates_constructed_segments(spark):
    # A = ids 0..999, B = 500..1499: true union 1500, jaccard 1/3,
    # intersection 500. KMV rel. error ~1/sqrt(k-1) ≈ 13% at k=64;
    # deterministic hashes make this a fixed outcome, bounds are slack.
    rows = [(i, "A") for i in range(1000)] + [(i, "B") for i in range(500, 1500)]
    df = spark.createDataFrame(rows, "user_id long, segment string")
    kmv = SK.kmv_per_group(df, key_col="user_id", group_col="segment")
    out = SK.kmv_pair_overlap(kmv).collect()
    assert len(out) == 1
    r = out[0]
    assert r["seg_a"] == "A" and r["seg_b"] == "B"
    assert r["n_k"] == SK.KMV_K
    assert 900 <= r["union_est"] <= 2300, r["union_est"]
    assert 0.15 <= r["jaccard_est"] <= 0.55, r["jaccard_est"]
    assert 200 <= r["intersection_est"] <= 900, r["intersection_est"]


def test_kmv_small_segments_are_exact(spark):
    # below k distinct keys the sketch IS the set: union_est and
    # intersection_est must be EXACT, not estimates
    rows = [(i, "A") for i in range(20)] + [(i, "B") for i in range(10, 30)]
    df = spark.createDataFrame(rows, "user_id long, segment string")
    out = SK.kmv_pair_overlap(
        SK.kmv_per_group(df, key_col="user_id", group_col="segment")
    ).collect()[0]
    assert out["n_k"] == 30
    assert out["matched"] == 10
    assert out["union_est"] == 30.0
    assert out["intersection_est"] == 10.0


def test_kmv_merge_is_sketch_of_union(spark):
    # mergeability: the k smallest of (sketch(A) ∪ sketch(B)) equals
    # the sketch of A ∪ B computed from raw data
    rows = [(i, "A") for i in range(500)] + [(i, "B") for i in range(250, 750)]
    df = spark.createDataFrame(rows, "user_id long, segment string")
    kmv = SK.kmv_per_group(df, key_col="user_id", group_col="segment")
    merged = (
        kmv.select("h").distinct().orderBy("h").limit(SK.KMV_K).collect()
    )
    direct = (
        SK.kmv_per_group(
            df.withColumn("segment", F.lit("all")),
            key_col="user_id", group_col="segment",
        )
        .orderBy("h")
        .collect()
    )
    assert [r["h"] for r in merged] == [r["h"] for r in direct]


# ---------------------------------------------------------------------------
# data-quality gate


def test_dq_counts_null_predicates_as_violations(spark):
    from magshield_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None)], "id long, amount double"
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in Q.dq_violation_counts(
            df, {"amount_pos": F.col("amount") > 0}
        ).collect()
    }
    # -3.0 violates; the NULL cannot evaluate and counts as a violation
    assert out == {"amount_pos": 2}


def test_dq_fk_counts_orphans_and_null_keys(spark):
    from magshield_data_pipeline_spark.operators import quality as Q

    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, ref long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = Q.dq_fk_violations(child, "ref", parent, "pk", "ref_fk").collect()[0]
    # 99 is an orphan; the null ref cannot resolve and violates too
    assert r["n_violations"] == 2 and r["n_rows"] == 3


def test_dq_gate_single_scan_for_predicate_rules(spark):
    # all predicate rules must fold into ONE rollup over orders — the
    # plan reads the orders parquet exactly twice in the whole query
    # (once for the rollup, once for the FK child side), never once
    # per rule
    from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY

    df = QUERY_REGISTRY["data_quality_gate"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") <= 2, plan[:3000]


# ---------------------------------------------------------------------------
# entity resolution


def test_linkage_best_match_prefers_higher_sim_then_lower_id(spark):
    from magshield_data_pipeline_spark.operators import linkage as L

    dirty = spark.createDataFrame([(1, "acme corp")], "id long, name string")
    clean = spark.createDataFrame(
        [(10, "acme corp"), (11, "acme corp"), (12, "acme co")],
        "id long, name string",
    )
    pairs = L.link_candidates(
        dirty, clean, block_key=F.substring(F.col("name"), 1, 4),
        threshold=0.5,
    )
    r = L.best_match(pairs).collect()[0]
    # 10 and 11 tie at sim 1.0 — the LOWEST clean id must survive
    assert r["matched_id"] == 10 and r["sim"] == 1.0


def test_linkage_blocking_bounds_pairs(spark):
    from magshield_data_pipeline_spark.operators import linkage as L

    # records in different blocks are never compared, whatever their
    # similarity — the sub-quadratic contract
    dirty = spark.createDataFrame([(1, "zzz alpha")], "id long, name string")
    clean = spark.createDataFrame([(2, "aaa alpha")], "id long, name string")
    pairs = L.link_candidates(
        dirty, clean, block_key=F.substring(F.col("name"), 1, 3),
        threshold=0.0,
    )
    assert pairs.count() == 0


def test_linkage_similarity_edge_cases(spark):
    from magshield_data_pipeline_spark.operators import linkage as L

    df = spark.createDataFrame(
        [("", ""), ("abc", "abc"), ("abc", "abd"), ("abc", None)],
        "a string, b string",
    )
    vals = df.select(L.name_similarity(F.col("a"), F.col("b")).alias("s")).collect()
    assert vals[0]["s"] == 1.0          # two empties: identical
    assert vals[1]["s"] == 1.0
    assert abs(vals[2]["s"] - (1 - 1 / 3)) < 1e-6  # rounded to 6 decimals
    assert vals[3]["s"] is None         # null propagates, no error


def test_gram_matrix_arrow_close_to_exact(spark):
    # the BLAS path must agree with the oracle-exact fold path to
    # float-summation tolerance; n_rows must be exact
    emb = read_table(spark, SF_SMALL, "embeddings")
    exact = {(r["i"], r["j"]): r for r in V.gram_matrix(emb).collect()}
    fast = {(r["i"], r["j"]): r for r in V.gram_matrix_arrow(emb).collect()}
    assert set(exact) == set(fast)
    for k, e in exact.items():
        f = fast[k]
        assert f["n_rows"] == e["n_rows"]
        assert math.isclose(f["g"], e["g"], rel_tol=1e-6, abs_tol=1e-4), (k, f["g"], e["g"])


def test_dq_quarantine_tags_all_failed_rules(spark):
    from magshield_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, 10.0, "OK"), (2, -3.0, "OK"), (3, -1.0, "BAD"), (4, None, "OK")],
        "id long, amount double, status string",
    )
    rules = {
        "amount_pos": F.col("amount") > 0,
        "status_ok": F.col("status") == "OK",
    }
    out = {r["id"]: r["failed_rules"] for r in Q.dq_quarantine(df, rules).collect()}
    # row 1 is clean and must NOT appear; 3 fails both rules, sorted tags
    assert out == {2: "amount_pos", 3: "amount_pos,status_ok", 4: "amount_pos"}


def test_streaming_cms_maintenance_equals_batch_sketch(spark, tmp_path):
    # sketch maintenance under a stream: each micro-batch's CMS merges
    # into an accumulated table; after AvailableNow drains the source,
    # the accumulated sketch must EQUAL the batch-built sketch (exact
    # mergeability is what makes sketch maintenance incremental at all)
    from magshield_data_pipeline_spark.operators import sketches as SK
    from magshield_data_pipeline_spark.streaming import windows as W

    events = read_table(spark, SF_SMALL, "events")
    acc = {}

    def merge_batch(batch_df, batch_id):
        for r in SK.cms_sketch(batch_df, "event_type").collect():
            key = (r["d"], r["bucket"])
            acc[key] = acc.get(key, 0) + r["cnt"]

    stream = W.read_events_stream(spark, SF_SMALL)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.cms_sketch(events, "event_type").collect()
    }
    assert acc == want


def test_pca_projection_from_gram_matrix(spark):
    # the Gram matrix IS the PCA sufficient statistic: eigendecompose
    # the d x d result on the driver, project the corpus onto the top
    # component distributedly, and the projected variance must equal
    # the top eigenvalue of the COVARIANCE (centered) — here we verify
    # the uncentered-second-moment variant end-to-end against numpy
    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 300)
    cells = V.gram_matrix(emb).collect()
    n = cells[0]["n_rows"]
    d = max(r["j"] for r in cells) + 1
    G = np.zeros((d, d))
    for r in cells:
        G[r["i"], r["j"]] = r["g"]
        G[r["j"], r["i"]] = r["g"]
    evals, evecs = np.linalg.eigh(G / n)
    top = evecs[:, -1]
    # distributed projection onto the top component (one scan, no UDF)
    pc_lit = F.array(*[F.lit(float(v)) for v in top])
    proj = emb.select(
        V.dot(V.as_double_vec("embedding"), pc_lit).alias("p")
    ).agg(F.sum(F.col("p") * F.col("p")).alias("ss")).collect()[0]["ss"]
    # E[p^2] over rows == top eigenvalue of G/n (uncentered PCA)
    assert math.isclose(proj / n, evals[-1], rel_tol=1e-4), (proj / n, evals[-1])


def test_cms_and_kmv_handle_null_keys(spark):
    # null is ONE countable value: CMS must not underestimate it and
    # KMV must hash it to a real (cross-engine-sortable) value
    df = spark.createDataFrame(
        [(None,), (None,), ("a",), ("b",)], "k string"
    )
    sketch = SK.cms_sketch(df, "k")
    probes = spark.createDataFrame([(None,), ("a",)], "k string")
    est = {r["k"]: r["est_count"] for r in SK.cms_estimate(sketch, probes, "k").collect()}
    assert est[None] >= 2
    assert est["a"] >= 1

    kmv = SK.kmv_per_group(
        df.withColumn("seg", F.lit("s")), key_col="k", group_col="seg"
    ).collect()
    assert len(kmv) == 3  # null, 'a', 'b' are three distinct keys
    assert all(r["h"] is not None for r in kmv)


def test_pq_encode_rejects_dim_mismatch(spark):
    # m*subdim != actual dim must fail loud, not emit silently-wrong
    # codes from ragged null-padded chunks
    import pytest as _pt
    from py4j.protocol import Py4JJavaError

    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 20)
    cb = emb.filter(F.col("vec_id") % 10 == 0)
    with _pt.raises(Exception) as exc:
        V.pq_encode(emb, cb, m=8, subdim=9).collect()  # 72 != 64
    assert "m*subdim" in str(exc.value)


def test_dq_rejects_empty_rule_set(spark):
    import pytest as _pt

    from magshield_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame([(1,)], "id long")
    with _pt.raises(ValueError):
        Q.dq_violation_counts(df, {})


# ---------------------------------------------------------------------------
# hot-cluster cap (semantic dedup) and hot-block guard (linkage) — r6


def test_semantic_dedup_cap_is_identity_when_no_cluster_exceeds_it(spark):
    # enabling the guard with a cap above every cluster must be a
    # plan-only change: ceil(n/cap) = 1 => sub id 0 everywhere => the
    # exact result of the uncapped path (the registry query's contract)
    emb = read_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 120)
    centroids = emb.filter(F.col("vec_id") % 40 == 0)
    base = sorted(
        V.semantic_dedup(emb, centroids, threshold=0.3).collect()
    )
    capped = sorted(
        V.semantic_dedup(
            emb, centroids, threshold=0.3, max_cluster_size=10_000
        ).collect()
    )
    assert base == capped


def test_semantic_dedup_hot_cluster_cap_bounds_pairs(spark):
    # pathological input: every vector identical => ONE cluster holding
    # all n rows. Uncapped, that is an n^2/2 pair join keeping exactly
    # one survivor; capped at c, the cluster splits into ceil(n/c)
    # hash sub-blocks compared independently — pair cost ~n*c — and
    # each non-empty sub-block keeps its own min id. Survivor count
    # therefore proves the split actually bounded the comparisons:
    # 1 < survivors <= ceil(n/c), and never more drops than uncapped.
    n, cap = 100, 10
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = emb.filter(F.col("vec_id") == 0)

    uncapped = V.semantic_dedup(emb, centroids, threshold=0.99).collect()
    assert sum(r["kept"] for r in uncapped) == 1  # only min id survives

    capped = V.semantic_dedup(
        emb, centroids, threshold=0.99, max_cluster_size=cap
    ).collect()
    survivors = [r["vec_id"] for r in capped if r["kept"]]
    assert 1 < len(survivors) <= -(-n // cap)  # split happened, bounded
    assert 0 in survivors  # global min id always survives its block
    # conservative direction: capping can only KEEP more, never drop
    kept_uncapped = {r["vec_id"] for r in uncapped if r["kept"]}
    assert kept_uncapped <= set(survivors)


def test_semantic_dedup_rejects_nonpositive_cap(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        V.semantic_dedup(emb, emb, threshold=0.5, max_cluster_size=0)


def test_link_candidates_max_block_size_raises_on_hot_block(spark):
    from magshield_data_pipeline_spark.operators import linkage as L

    # a CONSTANT block key puts every record in one block — the
    # quadratic degeneration the guard exists to refuse
    dirty = spark.createDataFrame(
        [(i, f"name {i}") for i in range(20)], "id long, name string"
    )
    clean = spark.createDataFrame(
        [(100 + i, f"name {i}") for i in range(20)], "id long, name string"
    )
    pairs = L.link_candidates(
        dirty, clean, block_key=F.lit("X"), threshold=0.0, max_block_size=5
    )
    with pytest.raises(Exception) as exc:
        pairs.collect()
    assert "max_block_size" in str(exc.value)


def test_link_candidates_max_block_size_passes_under_cap(spark):
    from magshield_data_pipeline_spark.operators import linkage as L

    dirty = spark.createDataFrame([(1, "acme corp")], "id long, name string")
    clean = spark.createDataFrame(
        [(10, "acme corp"), (11, "acme inc")], "id long, name string"
    )
    key = F.substring(F.col("name"), 1, 4)
    guarded = sorted(
        L.link_candidates(
            dirty, clean, block_key=key, threshold=0.5, max_block_size=100
        ).collect()
    )
    plain = sorted(
        L.link_candidates(dirty, clean, block_key=key, threshold=0.5).collect()
    )
    assert guarded == plain and len(plain) > 0

    with pytest.raises(ValueError):
        L.link_candidates(
            dirty, clean, block_key=key, threshold=0.5, max_block_size=-1
        )


def test_gram_q20_partition_invariant_and_close_to_exact(spark):
    # the whole point of the binary-grid quantization: per-cell totals
    # are integer sums, so batch/partition boundaries cannot move a bit
    emb = read_table(spark, SF_SMALL, "embeddings")
    a = {(r["i"], r["j"]): r["g"] for r in V.gram_matrix_arrow_q20(emb).collect()}
    b = {
        (r["i"], r["j"]): r["g"]
        for r in V.gram_matrix_arrow_q20(emb.repartition(17)).collect()
    }
    assert a == b  # bit-identical under any partitioning
    exact = {(r["i"], r["j"]): r["g"] for r in V.gram_matrix(emb).collect()}
    assert set(a) == set(exact)
    n = emb.count()
    # each addend moved by < 2^-21 vs the round(.,6) grid addend's
    # < 5e-7: totals differ by at most n * (2^-21 + 5e-7)
    tol = n * (2**-21 + 5e-7) + 1e-9
    assert all(abs(a[k] - exact[k]) <= tol for k in a)


def test_srp_multiprobe_candidates_superset_of_single_probe(spark):
    # the original bucket is always probed, so multi-probe retrieval
    # can only ADD candidates — and on the fixture it must actually
    # widen the net (otherwise the probes are dead code)
    from magshield_data_pipeline_spark.plans.ext_queries import _SRP_PLANES

    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    corpus = V.srp_band_buckets(emb, _SRP_PLANES)
    qb = V.srp_band_buckets(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        _SRP_PLANES,
    ).select(F.col("vec_id").alias("query_id"), "band", "bucket")
    single = {
        (r["query_id"], r["vec_id"])
        for r in qb.join(corpus, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id").distinct().collect()
    }
    probe_list = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(8)],
    )
    multi = {
        (r["query_id"], r["vec_id"])
        for r in qb.select(
            "query_id", "band", F.explode(probe_list).alias("bucket")
        )
        .join(corpus, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id").distinct().collect()
    }
    assert single <= multi
    assert len(multi) > len(single)


def test_q20_topk_partition_invariant_and_agrees_with_float_topk(spark):
    # integer scores cannot move under repartitioning; and the q20
    # ranking must agree with the proven float-cosine ranking wherever
    # the float scores are separated by more than the 2^-20 resolution
    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        map(tuple, V.brute_force_topk_q20_arrow(emb, queries, k=5).collect())
    )
    b = sorted(
        map(
            tuple,
            V.brute_force_topk_q20_arrow(
                emb.repartition(13), queries, k=5
            ).collect(),
        )
    )
    assert a == b and len(a) == 15
    flt = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in V.brute_force_topk(emb, queries, k=5).collect()
    }
    q20 = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in V.brute_force_topk_q20_arrow(emb, queries, k=5).collect()
    }
    agree = sum(1 for k in flt if q20.get(k) == flt[k])
    # scores on this fixture are well-separated: expect full agreement
    assert agree == len(flt)


def test_srp_q20_buckets_agree_with_float_sign_buckets(spark):
    # the q20 integer sign and the float round(dot,6)>=0 sign differ
    # only for dots within ~2^-21 of zero; on the fixture the indexes
    # must agree (near-)everywhere — this pins both the numpy path's
    # correctness and the documented boundary caveat
    from magshield_data_pipeline_spark.plans.ext_queries import _SRP_PLANES

    emb = read_table(spark, SF_SMALL, "embeddings")
    flt = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in V.srp_band_buckets(emb, _SRP_PLANES).collect()
    }
    q20 = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in V.srp_band_buckets_q20_arrow(emb, _SRP_PLANES).collect()
    }
    assert set(flt) == set(q20)
    agree = sum(1 for k in flt if flt[k] == q20[k])
    assert agree / len(flt) > 0.999
    # and the q20 index itself is partition-invariant (integer signs)
    q20b = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in V.srp_band_buckets_q20_arrow(
            emb.repartition(11), _SRP_PLANES
        ).collect()
    }
    assert q20 == q20b


def test_q20_topk_excludes_zero_vectors_both_sides(spark):
    # regression (review finding): a zero QUERY vector used to reach
    # the numpy scorer as NaN and fabricate INT64_MIN rankings; both
    # sides must drop unscorable zero vectors, like the oracle's
    # nonzero-norm predicate
    rows = [(i, [float(i + j % 3) for j in range(8)]) for i in range(1, 10)]
    rows.append((0, [0.0] * 8))     # zero corpus vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)],
        "query_id long, query_vec array<float>",
    )
    out = V.brute_force_topk_q20_arrow(emb, queries, k=3).collect()
    qids = {r["query_id"] for r in out}
    vids = {r["vec_id"] for r in out}
    assert qids == {1}          # zero query dropped, not ranked
    assert 0 not in vids        # zero corpus vector never a hit
    assert all(r["score_q"] > -(2**62) for r in out)  # no INT64_MIN junk
    assert len(out) == 3


def test_q20_topk_query_count_guard_fails_loud(spark):
    # ADVICE/VERDICT r6: the "queries are the small side" contract must
    # be ENFORCED — a fact-sized query frame raises before the driver
    # collect instead of silently OOM-ing (the repo's fail-fast
    # convention: PQ dim guard, DQ empty-rule guard, linkage block cap)
    import pytest

    rows = [(i, [float(i + j % 3) for j in range(8)]) for i in range(1, 30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="max_queries"):
        V.brute_force_topk_q20_arrow(emb, queries, k=3, max_queries=10)
    # at exactly the cap the call goes through
    capped = V.brute_force_topk_q20_arrow(
        emb, queries.filter(F.col("query_id") <= 10), k=3, max_queries=10
    )
    assert capped.count() == 30


def test_q20_topk_preserves_string_id_dtypes(spark):
    # ADVICE r6: the output schema hardcoded both id columns as 'long';
    # generic id dtypes must survive (derived from the input schemas)
    rows = [
        (f"doc-{i}", [float(i + j % 3) for j in range(8)]) for i in range(1, 8)
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    queries = spark.createDataFrame(
        [("q-1", [1.0] * 8)], "query_id string, query_vec array<float>"
    )
    out = V.brute_force_topk_q20_arrow(emb, queries, k=3)
    assert dict(out.dtypes)["vec_id"] == "string"
    assert dict(out.dtypes)["query_id"] == "string"
    got = out.collect()
    assert len(got) == 3 and all(r["query_id"] == "q-1" for r in got)
    assert all(r["vec_id"].startswith("doc-") for r in got)


# --- Misra-Gries heavy hitters (r9) ---------------------------------------


def test_misra_gries_keeps_heavy_keys_through_churn(spark):
    from magshield_data_pipeline_spark.operators import sketches as SK

    # 1 hot key (30%) + 70 singleton keys churning the 4 counters:
    # MG(4) must keep 'hot' (freq > n/5 by a wide margin) in ONE
    # partition whatever the arrival order
    rows = [("hot",)] * 30 + [(f"u{i}",) for i in range(70)]
    import random

    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows, ["key"]).coalesce(1)
    cands = {
        r.key
        for r in SK.misra_gries_candidates(df, "key", k=4).collect()
    }
    assert "hot" in cands
    assert len(cands) <= 4


def test_misra_gries_partition_totals_sentinel(spark):
    from magshield_data_pipeline_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), (None,)], ["key"]
    ).repartition(2)
    out = SK.misra_gries_candidates(
        df, "key", k=8, emit_partition_totals=True
    ).collect()
    totals = [r.mg_count for r in out if r.key is None]
    # nulls are SKIPPED from counting; one sentinel per non-empty
    # partition, totals summing to the 3 non-null rows
    assert sum(totals) == 3
    assert {r.key for r in out if r.key is not None} == {"a", "b"}


def test_misra_gries_rejects_bad_k(spark):
    from magshield_data_pipeline_spark.operators import sketches as SK

    df = spark.createDataFrame([("a",)], ["key"])
    with pytest.raises(ValueError, match="k must be >= 1"):
        SK.misra_gries_candidates(df, "key", k=0)
