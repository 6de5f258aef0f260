"""Physical-plan regression tests: the scale posture, asserted.

Correctness tests prove the numbers; these prove the SHAPE — the
properties that decide whether a query survives a 100× scale-up:
no accidental cartesian products, exchange budgets on flagship
queries, pushed filters on selective scans.
"""

from __future__ import annotations

import pytest

from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from tests.conftest import SF_SMALL

# queries whose plans legitimately contain a broadcast nested-loop:
# the embedding tier broadcasts a tiny query/centroid set against the
# corpus scan (a bounded, intentional cross). The as-of/range temporal
# joins do NOT belong here — they compose union+window with no join at
# all, and keeping them listed would let a real regression hide.
_ALLOW_BNLJ = {
    "embedding_topk_cosine",
    "embedding_ivf_topk",
    "embedding_cosine_dup_pairs",
    "embedding_quantized_recall",
    # exact-verify side is brute_force_topk's bounded broadcast cross
    # (5 queries × corpus), same shape as embedding_quantized_recall
    "embedding_pq_recall",
    # two PQ encode passes (broadcast codebook × corpus, pq_topk's
    # shape) + the same bounded exact-verify cross
    "ann_codebook_refresh",
    "kmeans_centroid_update",
    # both Lloyd iterations cross the corpus with the broadcast
    # centroid set (the assign_clusters shape, twice)
    "kmeans_lloyd_two_steps",
    # three single-row count(*) frames crossed into one metadata row
    "count_probe",
    # weekly rollup × the ONE-row anchor (newest-week) aggregate
    "half_life_decay_rollup",
    # 25-row rollup × its ONE-row global total (Q11 threshold shape)
    "nation_value_share",
    # three single-row graph aggregates crossed into one summary row
    "nation_triangle_graph",
    # single-row exact count × single-row merged-sketch estimate
    "sharded_hll_union",
    # batch × the ONE-row broadcast Bloom-filter map (≤128 KB by
    # construction) — the prefilter that keeps fresh rows out of the
    # corpus-index shuffle
    "bloom_prefiltered_dedup",
    # per-key counts × the ONE-row total-count frame
    "key_skew_profile",
    # centroid assignment crosses the corpus with the broadcast
    # centroid set (same shape as embedding_ivf_topk)
    "semantic_dedup_survivors",
    # the 5x5 segment-pair frame: tiny broadcast cross with an
    # inequality condition — quadratic in SEGMENTS, never in keys
    "kmv_segment_overlap",
    # customers × the ONE-row positive-balance average (Q22's
    # decorrelated scalar subquery)
    "idle_customers_balance",
    # scored (term, doc) rows × the ONE-row corpus stats frame
    # (N, avgdl) — BM25's global normalizers
    "bm25_topk_docs",
    # delta fluency scores × the ONE-row MATERIALIZED corpus totals
    # (ts, tg) — the incremental LM gate's threshold
    "incremental_curation_epoch",
    # same 1-row totals cross, epoch-2 steady-state shape
    "incremental_curation_epoch2",
    # two 1-row totals crosses (one per model version being compared)
    "curation_model_refresh",
    # the same two 1-row totals crosses (dual-model verdicts), plus the
    # 1-row old-totals × 1-row delta-totals fold
    "curation_retraction_epoch",
    # index-backed BM25: scored posting rows × the ONE-row committed
    # totals (n_chunks, sum_dl) — the versioned normalizer commit
    "rag_incremental_index",
    # per-doc fluency scores × the ONE-row corpus-totals frame — the
    # self-normalizing LM gate's global mean
    "curation_pipeline_v2",
    # (nation, band) rollup × the ONE-row global-count frame — the
    # exact-integer TVD's normalizer
    "t_closeness_violations",
    # candidate exact counts × the ONE-row global-total frame (summed
    # from the MG pass's per-partition sentinels)
    "heavy_hitters_mg",
    # BM25's ONE-row corpus stats cross, over chunks (same shape as
    # bm25_topk_docs)
    "rag_chunk_index_pipeline",
    # grid build: keys × the day axis exploded from ONE span row —
    # bounded by calendar days, broadcast by construction
    "gap_fill_locf_daily",
    # the dense list is brute_force_topk's bounded broadcast cross
    # (3 query vectors × corpus) + BM25's one-row stats cross
    "hybrid_rrf_retrieval",
    # supplier revenues × the ONE-row max-revenue frame (Q15's
    # scalar-max view equality)
    "top_supplier_revenue",
}

# streaming / iterative queries execute eagerly inside fn(); their final
# frame is a memory-sink table or checkpointed result, not a lazy plan
_EAGER = {
    "streaming_tumbling_counts",
    "stateful_sessionizer",
    "near_dup_clusters",
    "near_dup_clusters_star",
    "streaming_dedup_pairs",
    "streaming_funnel_progress",
    "streaming_interval_join",
    "stream_static_enrich",
    "paged_stream_scan",
    "streaming_quality_gate",
}

_LAZY_QUERIES = sorted(set(QUERY_REGISTRY) - _EAGER)


def _physical_plan(df) -> str:
    return df.sparkSession._jsparkSession.sessionState().executePlan(
        df._jdf.queryExecution().logical(),
        df._jdf.queryExecution().mode(),
    ).executedPlan().toString()


@pytest.mark.parametrize("name", _LAZY_QUERIES)
def test_no_unplanned_cartesian(spark, name):
    df = QUERY_REGISTRY[name].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name} degraded to a cartesian product"
    if name not in _ALLOW_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} uses a nested-loop join — an equi-join key went missing"
        )


def test_quote_enrichment_is_exchange_free(spark):
    # dims broadcast; no groupBy — the enrichment must not shuffle at all
    df = QUERY_REGISTRY["quote_enrichment"].fn(spark, SF_SMALL)
    assert "Exchange" not in _physical_plan(df).replace("BroadcastExchange", "")


def test_three_role_join_single_shuffle(spark):
    # three aliased dim roles must all broadcast: the only exchange is
    # the final groupBy's hash partitioning
    df = QUERY_REGISTRY["three_role_nation_join"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    assert shuffles <= 1, f"expected <=1 shuffle, plan:\n{plan[:2000]}"


def test_lineitem_filter_is_pushed(spark):
    # the semi-join reduction's date predicate must reach the scan
    df = QUERY_REGISTRY["semi_join_pushdown"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "PushedFilters: [" in plan
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "IsNotNull" in ln
    ]
    assert pushed, "no non-trivial pushed filters on any scan"


def test_frame_sample_prunes_payload(spark):
    # the sampling plan derives rows from metadata only: the binary
    # payload (text) must be pruned from the parquet scan entirely
    df = QUERY_REGISTRY["frame_sample_plan"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "text" not in plan, "payload column reached the scan"


def test_top_ngrams_partial_agg_and_bounded_sort(spark):
    df = QUERY_REGISTRY["top_ngrams"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "partial_count" in plan  # map-side combine before the exchange
    assert "TakeOrderedAndProject" in plan  # k-row heap, no full sort


def test_bucketed_join_query_is_exchange_free(spark):
    df = QUERY_REGISTRY["bucketed_colocated_join"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), (
        "bucket co-location lost: join or rollup re-shuffled"
    )


def test_document_chunks_is_exchange_free(spark):
    # chunking is a pure projection + explode: any Exchange here means
    # a regression added a shuffle to a linear fan-out
    df = QUERY_REGISTRY["document_chunks"].fn(spark, SF_SMALL)
    assert "Exchange" not in _physical_plan(df)


def test_tfidf_topk_is_pushed_into_window(spark):
    # Spark's WindowGroupLimit must prune to top-k per doc BEFORE the
    # final exchange — without it every (doc, term) row rides the
    # ranking shuffle
    df = QUERY_REGISTRY["tfidf_top_terms"].fn(spark, SF_SMALL)
    assert "WindowGroupLimit" in _physical_plan(df)


def test_exact_dedup_is_partial_agg_not_window(spark):
    # the survivor rule is min(struct) — map-side partial aggregation;
    # a ranking-window regression would shuffle + sort full rows
    df = QUERY_REGISTRY["exact_dedup_documents"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "Window" not in plan, "exact dedup regressed to a ranking window"
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_export_broadcast_gate_adapts(spark):
    # exports.py dim-size contract: broadcast_dims=True forces the
    # reference-faithful broadcast probe; False leaves strategy to
    # AQE/size estimates. With the auto-broadcast threshold disabled,
    # only the hint can produce a broadcast join — so the two settings
    # must yield different join strategies.
    from magshield_data_pipeline_spark import exports as E
    from magshield_data_pipeline_spark import schemas as SCH

    equipment = spark.createDataFrame(
        [{"RECORD_ID": 1, "RECORD_NAME": "eq", "OWNER_USER_ID": 1,
          "DATE_CREATED_UTC": "2024-01-01 00:00:00",
          "DATE_UPDATED_UTC": "2024-01-02 00:00:00", "CUSTOMFIELDS": []}],
        schema=SCH.EQUIPMENT_SCHEMA,
    )
    users = spark.createDataFrame(
        [{"USER_ID": 1, "FIRST_NAME": "A", "LAST_NAME": "B"}], schema=SCH.USER_SCHEMA
    )
    orgs = spark.createDataFrame(
        [{"ORGANISATION_ID": 5, "ORGANISATION_NAME": "O"}],
        schema=SCH.ORGANISATION_SCHEMA,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = _physical_plan(E.equipment_export(equipment, users, orgs))
        unhinted = _physical_plan(
            E.equipment_export(equipment, users, orgs, broadcast_dims=False)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in hinted, "hint on: dims must broadcast"
    assert "BroadcastHashJoin" not in unhinted, (
        "hint off: join strategy must be left to size estimates/AQE"
    )


def test_srp_buckets_single_projection_scan(spark):
    # the float Catalyst index (retired from the registry in r7, kept
    # as the oracle-classic control): all 4 band buckets must come from
    # ONE source scan (a per-band union would re-read the embeddings
    # once per band); the self-join adds the second scan of the
    # persisted projection
    from magshield_data_pipeline_spark.operators import similarity as V
    from magshield_data_pipeline_spark.plans.ext_queries import _SRP_PLANES
    from magshield_data_pipeline_spark.sources.parquet import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    plan = _physical_plan(V.srp_candidate_pairs(emb, _SRP_PLANES))
    assert plan.count("FileScan") <= 2, "SRP bucket build re-scans per band"


def test_mixture_rate_table_single_rollup_scan(spark):
    # the temperature-rate table must come from ONE corpus rollup; a
    # separate min() aggregate previously made Catalyst scan the
    # source column twice
    df = QUERY_REGISTRY["source_mixture_sample"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert plan.count("FileScan parquet [source") == 1


def test_zorder_stats_single_exchange_no_sort(spark):
    # Morton interleave is pure projection; the ONLY exchange is the
    # 16-group final aggregate's hash partitioning, and nothing sorts
    df = QUERY_REGISTRY["zorder_layout_stats"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    assert shuffles <= 1, f"expected <=1 shuffle, plan:\n{plan[:2000]}"
    assert "Sort" not in plan, "bit-fold aggregation should not sort"


def test_bloom_dedup_filter_is_broadcast(spark):
    # the bloom map must reach the batch via a broadcast, never a
    # shuffled join — the entire point of the prefilter
    df = QUERY_REGISTRY["bloom_prefiltered_dedup"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_passage_dedup_no_ranking_window(spark):
    # winner selection is a min(struct) aggregate; a Window/ranking
    # regression would globally sort the block table
    df = QUERY_REGISTRY["passage_dedup_reassembly"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "Window" not in plan, "ranking window crept into passage dedup"


def test_duplicate_spans_semi_join_and_local_sorts_only(spark):
    # the hot-hash reduction must stay a LEFT SEMI join (never a
    # row-multiplying inner join), and the islands window must sort
    # per-document only — a GLOBAL sort would mean the gaps-and-islands
    # pass lost its partitionBy and serialized the corpus
    df = QUERY_REGISTRY["duplicate_span_islands"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "LeftSemi" in plan, "hot-hash reduction is no longer a semi join"
    assert "Window" in plan
    import re

    global_sorts = [
        ln for ln in plan.splitlines()
        if re.search(r"\bSort\b", ln) and "true" in ln.split("],")[-1][:30]
    ]
    assert not global_sorts, f"global sort in islands plan: {global_sorts}"


def test_cms_sketch_broadcasts_to_probes(spark):
    # the ≤512-row sketch must reach the probe side via broadcast —
    # shuffling the probe keys against it would defeat the sketch
    df = QUERY_REGISTRY["cms_heavy_hitters"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_gram_matrix_single_exchange_partial_agg(spark):
    # the Catalyst fold twin (retired from the registry in r7, kept as
    # the exact-arithmetic control): one pass — explode is projection-
    # side; the ONLY exchange is the d²-cell hash aggregate, which
    # partial-aggregates map-side so the shuffle carries O(d² × tasks)
    # rows; nothing sorts
    from magshield_data_pipeline_spark.operators import similarity as V
    from magshield_data_pipeline_spark.sources.parquet import read_table

    df = V.gram_matrix(read_table(spark, SF_SMALL, "embeddings"))
    plan = _physical_plan(df)
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    assert shuffles <= 1, f"expected <=1 shuffle, plan:\n{plan[:2000]}"
    assert "Sort" not in plan
    assert plan.count("HashAggregate") >= 2, "partial aggregation missing"


def test_weighted_sample_prunes_per_group(spark):
    # E-S top-k per source must go through WindowGroupLimit (rank
    # pruned to k map-side before the exchange), same as the quota draw
    df = QUERY_REGISTRY["weighted_sample_per_source"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "WindowGroupLimit" in plan


def test_pq_lut_is_broadcast_and_no_pairwise_vector_math(spark):
    # the LUT must broadcast to the code table (shuffling codes against
    # a 800-row LUT defeats ADC), the encode's codebook join must also
    # broadcast, and the final m-part sum must partial-aggregate
    df = QUERY_REGISTRY["embedding_pq_topk"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2, "codebook/LUT not broadcast"
    assert "HashAggregate" in plan


def test_kmv_sketch_prunes_per_segment(spark):
    # the sketch build must WindowGroupLimit-prune to k hashes per
    # segment map-side — without it the full distinct hash set rides
    # the ranking shuffle
    df = QUERY_REGISTRY["kmv_segment_overlap"].fn(spark, SF_SMALL)
    assert "WindowGroupLimit" in _physical_plan(df)


def test_pagerank_iterations_reuse_one_cached_edge_rollup(spark):
    # the audited shape: the 5-join fact derivation materializes ONCE
    # (persisted edges), each of the 3 iterations consuming the cache —
    # losing the persist would re-run the fact shuffle per iteration
    df = QUERY_REGISTRY["pagerank_nations"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert plan.count("InMemoryTableScan") == 3
    assert "SortMergeJoin" not in plan.split("InMemoryRelation")[0], (
        "an iteration join stopped broadcasting"
    )


def test_interval_bucket_join_is_equi_on_bucket(spark):
    # the keyless interval join must plan as an EQUI join on the bucket
    # id — a BroadcastNestedLoopJoin here means the grid mapping broke
    plan = _physical_plan(
        QUERY_REGISTRY["orderdate_shipment_window"].fn(spark, SF_SMALL)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_bkt" in plan  # joined through the grid column


def test_salted_join_keys_include_salt(spark):
    # result-identity is proven by the oracle; the PLAN must actually
    # join on (key, salt) — if the salt drops out of the join key the
    # skew protection is silently gone while results stay right
    plan = _physical_plan(
        QUERY_REGISTRY["salted_join_revenue"].fn(spark, SF_SMALL)
    )
    join_lines = [
        ln for ln in plan.splitlines() if "Join" in ln and "suppkey" in ln
    ]
    assert any("_salt" in ln for ln in join_lines), join_lines


def test_static_partition_pruning_eliminates_directories(spark):
    # the lookback predicate must land in the scan's PartitionFilters
    # (directories eliminated at planning time) with NO residual data
    # filter — a post-scan month filter would mean the layout bought
    # nothing and 77 of 80 directories were read for naught
    df = QUERY_REGISTRY["partition_pruned_scan"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    scans = [
        ln for ln in plan.splitlines() if "magshield_orders_by_month" in ln
    ]
    assert scans, "partitioned fact scan missing from the plan"
    pf = scans[0].split("PartitionFilters: [")[1]
    assert "o_month" in pf.split("]")[0], scans[0]
    assert "DataFilters: []" in scans[0], (
        "month predicate fell through to a data filter — not pruned"
    )


def test_static_partition_pruning_runtime_file_count(spark):
    """RUNTIME proof, not plan text: execute the pruned scan and read
    the FileSourceScan's numFiles SQL metric — exactly the requested
    months' files opened, out of ~80 month directories. (inputFiles()
    can NOT prove this: it lists the relation's files before partition
    pruning — verified 80/80 — so the executed-plan metric is the only
    honest runtime witness.)"""
    from pyspark.sql import functions as F

    from magshield_data_pipeline_spark.sources import partitioned as PT

    fact = PT.ensure_orders_by_month(spark, SF_SMALL)
    total_files = len(fact.inputFiles())
    months = PT.last_months_filter(spark, SF_SMALL, n_months=3)
    pruned = fact.filter(F.col("o_month").isin(months))
    pruned.collect()
    leaves = pruned._jdf.queryExecution().executedPlan().collectLeaves()
    num_files = None
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.metrics().contains("numFiles"):
            num_files = node.metrics().apply("numFiles").value()
    assert num_files is not None, "no scan numFiles metric found"
    # one file per month directory by the repartition-by-key layout
    assert num_files == len(months) < total_files, (num_files, total_files)


def test_dynamic_partition_pruning_filter_injected(spark):
    # the aggregate-derived dim can NOT be pushed statically; the fact
    # scan must instead carry a runtime dynamicpruningexpression —
    # without it the join reads every month's directory and discards
    # 77/80 of the I/O after the fact
    df = QUERY_REGISTRY["dpp_top_month_revenue"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    fact_scans = [
        ln for ln in plan.splitlines() if "magshield_orders_by_month" in ln
    ]
    assert fact_scans, "partitioned fact scan missing from the plan"
    assert any("dynamicpruningexpression" in ln for ln in fact_scans), (
        "no DPP filter on the fact scan:\n" + fact_scans[0]
    )


def test_orc_scan_pushes_selective_filter(spark):
    # format parity: the ORC reader must receive the price predicate as
    # a pushed filter, same as parquet — a post-scan Filter-only plan
    # would mean the second lake format silently lost scan pruning
    df = QUERY_REGISTRY["orc_roundtrip_scan"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    orc_scans = [ln for ln in plan.splitlines() if "FileScan orc" in ln]
    assert orc_scans, "ORC scan missing from the plan"
    pushed = orc_scans[0].split("PushedFilters: [")[1].split("]")[0]
    assert "o_totalprice" in pushed, orc_scans[0]


def test_q20_blas_queries_have_single_python_stage(spark):
    # the vectorized paths must stay ONE mapInPandas scan — a second
    # python stage means vectors leaked through an extra Python hop
    for name in ("embedding_gram_matrix_blas", "embedding_topk_q20_blas"):
        plan = _physical_plan(QUERY_REGISTRY[name].fn(spark, SF_SMALL))
        assert plan.count("MapInPandas") == 1, name


def test_q17_brand_dim_broadcasts_and_partial_aggs(spark):
    # the decorrelated per-part avg must partial-agg map-side and the
    # tiny brand dim must broadcast into the fact scan
    df = QUERY_REGISTRY["small_quantity_part_revenue"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "partial_avg" in plan, "per-part average lost map-side combine"
    assert "BroadcastHashJoin" in plan, "brand dim failed to broadcast"


def test_q20_supplier_join_is_left_semi(spark):
    # the nested-subquery chain must stay a SEMI join — an inner join
    # would duplicate suppliers per qualifying (supp, part) pair
    df = QUERY_REGISTRY["promo_part_suppliers"].fn(spark, SF_SMALL)
    assert "LeftSemi" in _physical_plan(df)


def test_q13_left_join_preserves_filter_in_condition(spark):
    # the priority filter must ride the JOIN CONDITION, not a post-scan
    # WHERE on orders — a WHERE would silently drop zero-order
    # customers from the distribution
    df = QUERY_REGISTRY["customer_order_distribution"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "LeftOuter" in plan, "outer join degraded to inner"


def test_bm25_single_corpus_scan_via_cache(spark):
    # dl/tf/df all derive from one exploded-words frame; the persist
    # must make them share a single InMemoryTableScan instead of three
    # scan+regexp subtrees
    df = QUERY_REGISTRY["bm25_topk_docs"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    # each consumer subtree must read the cache, not re-run the
    # scan+regexp (the FileScan lines below InMemoryTableScan nodes are
    # the cache BUILDER's plan, printed per reference — executed once)
    assert plan.count("InMemoryTableScan") >= 3, (
        "dl/tf/df subtrees not all served from the cached words frame"
    )


def test_window_rank_suite_single_shuffle_serves_all_ranks(spark):
    # all four ranking functions share one window spec -> one exchange
    # + one sort, not four
    df = QUERY_REGISTRY["window_rank_suite"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    assert shuffles <= 1, f"expected <=1 shuffle:\n{plan[:1500]}"
    assert plan.count("Sort") <= 2, "window functions split into extra sorts"


# ---------------------------------------------------------------------------
# r8: runtime bloom-filter join (the third runtime scan-reduction
# technique beside static partition pruning and DPP)


def test_runtime_bloom_filter_join_injection(spark):
    """At 100 TB the win condition: a selectively-filtered small side
    injects a bloom filter into the BIG side's scan, discarding
    non-matching fact rows before the join exchange.  The optimizer
    gates injection on size estimates (creation side small enough to
    build cheaply, application side big enough to be worth it) — the
    fixture is below the default application threshold, so the test
    pins BOTH branches of the decision rule."""
    from pyspark.sql import functions as F

    from magshield_data_pipeline_spark.sources.parquet import read_table

    li = read_table(spark, SF_SMALL, "lineitem")
    orders = read_table(spark, SF_SMALL, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))

    def optimized(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    conf = spark.conf
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # creation side: accept any build size; application side: any
        # scan qualifies — the 100 TB regime, simulated
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        plan = optimized(j)
        assert "might_contain" in plan, "bloom filter not applied to fact side"
        assert "bloom_filter_agg" in plan, "bloom filter not built from dim side"
        # the filter must sit on the FACT key (l_orderkey), pre-join
        assert "might_contain" in plan.split("Join")[-1] or any(
            "l_orderkey" in line
            for line in plan.splitlines()
            if "might_contain" in line
        )
        # size-gated OFF branch: at fixture scale with default
        # thresholds the scan is too small to be worth a bloom build
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "10GB",
        )
        assert "might_contain" not in optimized(
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        ), "bloom filter injected below the size gate"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_binaryfile_metadata_query_never_reads_content(spark):
    # column pruning must reach the binaryFile scan: a (path, length)
    # projection reads file METADATA only — at a million blobs that is
    # a listing, not a byte-for-byte read
    QUERY_REGISTRY["binary_file_ingest"].fn(spark, SF_SMALL)  # builds blobs
    from magshield_data_pipeline_spark.sources.scratch import scratch_path

    base = scratch_path("doc_blobs", SF_SMALL, "doc_id<20 utf8-text .bin v1")
    meta = (
        spark.read.format("binaryFile").load(base).select("path", "length")
    )
    plan = _physical_plan(meta)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and all("content" not in l for l in read_schema), (
        f"content column not pruned from the binaryFile scan:\n{read_schema}"
    )


def _shuffles(plan: str) -> int:
    return plan.replace("BroadcastExchange", "").count("Exchange")


def test_udtf_lateral_expansion_adds_no_shuffle(spark):
    # the UDTF fan-out must plan inside the scan stage: an Arrow-
    # batched Python eval over the lateral correlation, ZERO exchanges
    df = QUERY_REGISTRY["windowed_chunks_udtf"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert _shuffles(plan) == 0, f"UDTF expansion shuffled:\n{plan[:1200]}"
    assert "PythonUDTF" in plan or "udtf" in plan.lower()


def test_xml_rollup_partial_aggregates_before_one_exchange(spark):
    df = QUERY_REGISTRY["xml_ingest_rollup"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert _shuffles(plan) == 1
    assert "FileScan xml" in plan or "xml" in plan.lower()


def test_grouping_sets_one_expand_one_exchange(spark):
    # 3 heterogeneous rollups must share ONE scan: Expand(3×) before
    # the partial agg, exactly one shuffle — never a union of 3 scans
    df = QUERY_REGISTRY["grouping_sets_rollup"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "Expand" in plan
    assert _shuffles(plan) == 1, plan[:1200]
    assert plan.count("FileScan") == 1, "grouping sets split into re-scans"


def test_l_diversity_single_shuffle_partial_agg(spark):
    df = QUERY_REGISTRY["l_diversity_violations"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    # distinct-count expands to (group, band) then collapses — still
    # bounded exchanges and partial aggregation before each
    assert _shuffles(plan) <= 2, plan[:1200]
    assert "partial" in plan.lower()


def test_gap_fill_locf_exchange_budget(spark):
    # documented budget: three partial-agg rollups off the fact scan
    # (sparse values, span, distinct keys — each collapses BEFORE its
    # exchange) + the per-key LOCF window over the bounded grid; the
    # grid build itself is broadcast-only (no shuffle)
    df = QUERY_REGISTRY["gap_fill_locf_daily"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert _shuffles(plan) <= 4, plan[:1500]
    # every fact-side aggregate partial-aggregates before shuffling
    assert "partial_sum" in plan and "partial_min" in plan


def test_curation_pipeline_v2_exchange_budget(spark):
    # The r9 north-star composition (VERDICT r8 item 1): documented
    # budget is data-proportional shuffles ONLY at the stages whose
    # semantics require co-location — the LM model/score aggregates,
    # the exact-dedup fingerprint agg, the LSH signature agg + bucket
    # join, the mixture rollup, and the packing window.  The static
    # plan prints shared persisted subtrees once per consumer, so
    # budget is counted over UNIQUE exchange plan_ids, and every
    # non-broadcast shuffle key must be one of the stage keys.
    import re

    # the pipeline persists 4 shared frames; if an earlier test (e.g.
    # the oracle-parity sweep) already MATERIALIZED them, the plan
    # shows InMemoryTableScan stubs and hides the very subtrees this
    # test audits — clear the cache so the full build plan is printed
    spark.catalog.clearCache()
    df = QUERY_REGISTRY["curation_pipeline_v2"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    # one Arrow mapInPandas (the NFC canonicalization), zero
    # row-at-a-time Python UDFs anywhere in the chain
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    exchanges = {
        m.group("pid"): m.group("kind")
        for m in re.finditer(
            r"Exchange (?P<kind>\w+)(?:\((?P<key>[^,)]*)[^)]*\))?"
            r".*?plan_id=(?P<pid>\d+)",
            plan,
        )
        if "Broadcast" not in m.group("kind")
    }
    keys = {
        m.group("key").split("#")[0]
        for m in re.finditer(
            r"Exchange hashpartitioning\((?P<key>[^,#]+)#", plan
        )
    }
    # every hash shuffle is on a semantic stage key — no accidental
    # repartition on a non-key column anywhere in the chain
    assert keys <= {"gram", "doc_id", "fp", "source", "band", "bucket"}, keys
    # unique-exchange budget: model agg, score agg, totals single-
    # partition, gate join (2 sides), fp agg, sig agg (×2 self-join
    # sides pre-reuse), losers distinct, mixture rollup + its single-
    # partition window, packing window, + the read_table_spread
    # round-robin — bounded, with slack for AQE's join planning
    assert len(exchanges) <= 16, sorted(exchanges.items())
    # partial aggregation runs before every exchange-feeding aggregate
    assert "partial_count" in plan and "partial_min" in plan


def test_streaming_near_dup_probes_materialized_index(spark):
    # VERDICT r8 item 3: the corpus LSH index must be MATERIALIZED
    # once (parquet, write-once atomic publish) and probed from the
    # stream — per-batch cost excludes the corpus index build.  The
    # micro-batch plan therefore contains a plain parquet scan of the
    # index and NO corpus-side shingle explode or signature
    # aggregation; the only explode is the stream side's stateless
    # 4-band fan-out and the only aggregate is dropDuplicates' state.
    import os

    from magshield_data_pipeline_spark.plans.window_queries import (
        sndc_pairs_stream,
    )

    pairs = sndc_pairs_stream(spark, SF_SMALL)
    # analyzed(), not optimizedPlan(): batch optimization of a plan
    # with a streaming source trips the UnsupportedOperationChecker
    plan = pairs._jdf.queryExecution().analyzed().toString()
    # the corpus side is a plain parquet relation whose schema IS the
    # index (band, bucket, corpus_doc) — no text column, so no shingle
    # work can possibly happen on that side (toString omits the path;
    # the on-disk publish is asserted below)
    import re as _re

    assert _re.search(
        r"Relation \[band#\d+,bucket#\d+,corpus_doc#\d+L?\] parquet", plan
    ), plan[-2000:]
    # one explode total (stream-side band fan-out); the corpus-side
    # shingle explode would make it >= 2
    assert plan.count("Generate explode") == 1, plan[:3000]
    # one aggregate total (dropDuplicates); the corpus-side min-hash
    # signature rollup would make it >= 2
    assert plan.lower().count("aggregate") <= 1, plan[:3000]
    # and the index really was published atomically
    idx_dirs = [
        d for d in os.listdir("/tmp")
        if d.startswith("magshield_sndc_lsh_idx")
    ]
    assert idx_dirs


def test_incremental_curation_epoch_is_delta_proportional(spark):
    # VERDICT r9 item 1: per-epoch cost must be proportional to the
    # DELTA — the corpus text is never re-read, re-shingled or
    # re-scored inside the epoch plan.  Proven two ways: (1) no stage
    # frame lists any corpus (v1) data file among its inputs — only
    # the CDC-added delta files and the narrow materialized indexes;
    # (2) the corpus appears in the novel-stage plan ONLY as plain
    # parquet index relations (fp / band,bucket,corpus_doc / gram,cnt),
    # whose schemas carry no text column, so no corpus-shaped subtree
    # (shingle explode, gram explode, signature agg) can exist.
    import os
    import re

    from magshield_data_pipeline_spark.plans.curation_queries import (
        inc_cur_epoch_frames,
    )
    from magshield_data_pipeline_spark.sources import snapshots as SN

    spark.catalog.clearCache()
    fr = inc_cur_epoch_frames(spark, SF_SMALL)
    p = fr["paths"]

    def _files(df):
        # a persisted frame's plan is an InMemoryRelation whose
        # inputFiles() is EMPTY — unpersist first so the file-set
        # assertions below can never pass vacuously
        df.unpersist()
        files = {f.replace("file:", "").lstrip("/") for f in df.inputFiles()}
        assert files, "no input files resolved — vacuous check"
        return files

    v1_files = {
        os.path.join(p["raw"], e["path"]).lstrip("/")
        for e in SN.read_manifest(p["raw"], 1)["files"]
    }
    v2_added = {
        os.path.join(p["raw"], e["path"]).lstrip("/")
        for e in SN.read_manifest(p["raw"], 2)["files"]
    } - v1_files
    assert v1_files and v2_added
    for name in ("delta", "gated", "fluent", "uniq", "novel"):
        overlap = _files(fr[name]) & v1_files
        assert not overlap, f"{name} scans corpus files: {overlap}"
    # the CDC read really is the added files, all of them, nothing else
    delta_files = _files(fr["delta"])
    assert delta_files == v2_added
    analyzed = fr["novel"]._jdf.queryExecution().analyzed().toString()
    assert re.search(
        r"Relation \[band#\d+,bucket#\d+,corpus_doc#\d+L?\] parquet",
        analyzed,
    ), analyzed[-2000:]
    assert re.search(r"Relation \[fp#\d+\] parquet", analyzed)
    assert re.search(r"Relation \[gram#\d+,cnt#\d+L?\] parquet", analyzed)
    plan = _physical_plan(fr["novel"])
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_snapshot_clustered_prune_scans_fewer_files(spark):
    # the registered query's hash pins pruning soundness; this pins the
    # pruning EFFECT: the clustered table has 4 files, and the [0, 999]
    # range must plan over strictly fewer after the cluster_by rewrite
    from magshield_data_pipeline_spark.plans.modern_queries import (
        snap_cluster_base,
    )
    from magshield_data_pipeline_spark.sources import snapshots as SN

    base = snap_cluster_base(spark, SF_SMALL)
    full = SN.read(spark, base)
    pruned = SN.read(spark, base, prune=("k", 0.0, 999.0))
    assert len(full.inputFiles()) == 4
    assert len(pruned.inputFiles()) < 4


def test_incremental_curation_epoch2_probes_evolved_index_only(spark):
    # Epoch 2's plan must scan ONLY the epoch-2 delta files plus the
    # snapshot-table index files — never the corpus text, never
    # epoch 1's delta: steady-state cost is the delta + index probes.
    import os

    from magshield_data_pipeline_spark.plans.curation_queries import (
        inc_cur2_epoch_frames,
    )
    from magshield_data_pipeline_spark.sources import snapshots as SN

    spark.catalog.clearCache()
    fr = inc_cur2_epoch_frames(spark, SF_SMALL)
    p = fr["paths"]

    def _files(df):
        df.unpersist()  # see the epoch-1 test: empty on InMemoryRelation
        files = {f.replace("file:", "").lstrip("/") for f in df.inputFiles()}
        assert files, "no input files resolved — vacuous check"
        return files

    def _manifest_files(tbl, v):
        return {
            os.path.join(p[tbl], e["path"]).lstrip("/")
            for e in SN.read_manifest(p[tbl], v)["files"]
        }

    v1 = _manifest_files("raw", 1)
    v2_added = _manifest_files("raw", 2) - v1
    v3_added = _manifest_files("raw", 3) - _manifest_files("raw", 2)
    assert v1 and v2_added and v3_added
    for name in ("delta", "gated", "fluent", "uniq", "novel"):
        files = _files(fr[name])
        assert not (files & v1), f"{name} scans corpus files"
        assert not (files & v2_added), f"{name} scans epoch-1 delta files"
    assert _files(fr["delta"]) == v3_added
    # the fingerprint probe reads the EVOLVED index version: both the
    # corpus commit's file and epoch 1's appended file are inputs
    uniq_files = _files(fr["uniq"])
    fp_v2 = _manifest_files("fp_tbl", 2)
    assert fp_v2 <= uniq_files
    assert len(fp_v2) == 2  # corpus file + epoch-1 append file


def test_retraction_epoch_plan_scopes(spark):
    # r11: the retraction epoch's two sides have distinct cost scopes,
    # both plan-pinned: the ADMIT chain scans only epoch-2 delta files
    # plus the pinned index/model table files (never corpus text, never
    # epoch-1's delta); the RETRACT audit scans the curated slice ONCE
    # (raw v1+v2 — that IS its contract) but never epoch-2's delta.
    import os

    from magshield_data_pipeline_spark.plans.curation_queries import (
        retraction_frames,
    )
    from magshield_data_pipeline_spark.sources import snapshots as SN

    spark.catalog.clearCache()
    fr = retraction_frames(spark, SF_SMALL)
    # the frames persist INTERMEDIATES (gated/uniq) too — clear the
    # whole cache so no InMemoryRelation hides a subtree's files from
    # inputFiles() and makes the scope assertions vacuous
    spark.catalog.clearCache()
    p2 = fr["paths"]["p2"]

    def _files(df):
        files = {f.replace("file:", "").lstrip("/") for f in df.inputFiles()}
        assert files, "no input files resolved — vacuous check"
        return files

    def _manifest_files(tbl, v):
        return {
            os.path.join(p2[tbl], e["path"]).lstrip("/")
            for e in SN.read_manifest(p2[tbl], v)["files"]
        }

    v1 = _manifest_files("raw", 1)
    v2_added = _manifest_files("raw", 2) - v1
    v3_added = _manifest_files("raw", 3) - _manifest_files("raw", 2)
    assert v1 and v2_added and v3_added

    admit_files = _files(fr["admit"])
    assert not (admit_files & v1), "admit chain scans corpus text"
    assert not (admit_files & v2_added), "admit chain scans epoch-1 delta"
    assert v3_added <= admit_files  # the CDC delta, all of it
    # the dedup probes read the EVOLVED index at its pinned v2
    assert _manifest_files("fp_tbl", 2) <= admit_files
    assert _manifest_files("lsh_tbl", 2) <= admit_files

    retract_files = _files(fr["retract"])
    assert not (retract_files & v3_added), "retract audit scans the delta"
    assert (v1 | v2_added) <= retract_files  # one curated-slice scan

    # JVM-only scoring: the dual-model verdicts are gram explodes +
    # broadcast joins; the only Python in either plan is the Arrow NFC
    for name in ("retract", "admit"):
        plan = _physical_plan(fr[name])
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_rag_incremental_epoch_scans_no_preexisting_chunk_text(spark):
    # r11 (VERDICT r10 item 3): the index epoch's cost must be the
    # DELTA plus narrow index probes — no stage frame may read the v1
    # corpus files or the chunks table's stored text; and the pinned
    # word-range prune on the clustered postings must genuinely drop
    # posting files at plan time.
    import os

    from magshield_data_pipeline_spark.plans.ext_queries import (
        _BM25_TERMS,
        rag_inc_epoch_frames,
    )
    from magshield_data_pipeline_spark.sources import snapshots as SN

    spark.catalog.clearCache()
    fr = rag_inc_epoch_frames(spark, SF_SMALL)
    spark.catalog.clearCache()  # persisted intermediates hide files
    p = fr["paths"]

    def _files(df):
        files = {f.replace("file:", "").lstrip("/") for f in df.inputFiles()}
        assert files, "no input files resolved — vacuous check"
        return files

    def _manifest_files(tbl, v):
        return {
            os.path.join(p[tbl], e["path"]).lstrip("/")
            for e in SN.read_manifest(p[tbl], v)["files"]
        }

    raw_v1 = _manifest_files("raw", 1)
    raw_v2_added = _manifest_files("raw", 2) - raw_v1
    chunks_v1 = _manifest_files("chunks", 1)
    assert raw_v1 and raw_v2_added and chunks_v1
    for name in ("delta", "dsv", "novel", "nmeta", "npost", "ndf"):
        files = _files(fr[name])
        assert not (files & raw_v1), f"{name} re-reads the corpus"
        assert not (files & chunks_v1), f"{name} reads stored chunk text"
    assert _files(fr["delta"]) == raw_v2_added
    # the dedup probe reads the meta table at its PINNED v1
    assert _manifest_files("meta", 1) <= _files(fr["novel"])
    # manifest-level string pruning on the clustered posting lists:
    # the [min(term), max(term)] range plans over strictly fewer files
    terms = sorted(_BM25_TERMS)
    all_post = SN.read(spark, p["postings"], 2)
    pruned = SN.read(spark, p["postings"], 2,
                     prune=("word", terms[0], terms[-1]))
    assert len(all_post.inputFiles()) == 4
    assert len(pruned.inputFiles()) < 4
