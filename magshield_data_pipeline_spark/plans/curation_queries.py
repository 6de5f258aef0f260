"""[EXT] curation tier 3: corpus statistics, chunking, incremental
ingestion, mixture sampling, funnel analytics, quantile sketches.

Round-3 additions to the training-data tier (SURVEY §2.10): each query
is the registry twin of an operator in ``operators/text.py``,
``operators/dedup.py``, ``operators/sampling.py`` or
``operators/temporal.py``. Cross-engine hash stability rules applied
throughout: scores are single IEEE exactly-rounded divisions (never
libm transcendentals), thresholds are floor()-ed products of
exactly-rounded sqrt/divide, counts are BIGINT on both sides, and
sketch outputs (GK quantiles) are checked as tolerance booleans the
way the HLL query is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import dedup as D
from magshield_data_pipeline_spark.operators import sampling as SA
from magshield_data_pipeline_spark.operators import similarity as V
from magshield_data_pipeline_spark.operators import temporal as TP
from magshield_data_pipeline_spark.operators import text as T
from magshield_data_pipeline_spark.plans.ext_queries import _hash_byte_sql
from magshield_data_pipeline_spark.plans.registry import register
from magshield_data_pipeline_spark.sources.parquet import read_table, read_table_spread

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# tf-idf top terms per document

_TFIDF_K = 3

_TFIDF_SQL = f"""
WITH w AS (
    SELECT doc_id, unnest(str_split({_NORM}, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM w WHERE term <> '' GROUP BY doc_id, term
),
dfq AS (
    SELECT term, count(*) AS df_docs FROM tf GROUP BY term
),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs,
           tf.tf / dfq.df_docs AS score
    FROM tf JOIN dfq USING (term)
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
    ) AS BIGINT) AS rnk
    FROM scored
)
SELECT doc_id, term, tf, df_docs, score, rnk
FROM ranked WHERE rnk <= {_TFIDF_K}
"""


@register(
    "tfidf_top_terms",
    sql=_TFIDF_SQL,
    description="per-document top-3 distinguishing terms by tf/df score "
    "(tf-idf family; [EXT] text analysis). Score is a single IEEE division "
    "so it is bit-identical across engines (ln-idf would not be)",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: explode → partial-agg tf → df derived FROM tf (no second
    # corpus scan) → one term-keyed shuffle join (AQE skew-splits hot
    # terms) → per-doc bounded ranking window.
    docs = read_table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, id_col="doc_id", text_col="text", k=_TFIDF_K)


# ---------------------------------------------------------------------------
# context-window chunking

_CHUNK_SIZE = 500
_CHUNK_STRIDE = 400

_CHUNKS_SQL = f"""
WITH s AS (
    SELECT doc_id, text,
           unnest(generate_series(0, greatest(length(text) - 1, 0),
                                  {_CHUNK_STRIDE})) AS chunk_start
    FROM documents
)
SELECT
    doc_id,
    CAST(chunk_start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
    CAST(chunk_start AS BIGINT)                    AS chunk_start,
    CAST(length(substring(text, chunk_start + 1, {_CHUNK_SIZE})) AS BIGINT)
        AS chunk_len,
    md5(substring(text, chunk_start + 1, {_CHUNK_SIZE}))
        AS chunk_md5
FROM s
"""


@register(
    "document_chunks",
    sql=_CHUNKS_SQL,
    description="fixed-size context-window chunking with overlap "
    f"(size {_CHUNK_SIZE}, stride {_CHUNK_STRIDE}): the pre-tokenization "
    "pass of a training pipeline; chunk MD5 proves content parity ([EXT])",
)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure projection + explode — linear fan-out, zero shuffle;
    # generate_series/sequence are both stop-inclusive so the two
    # engines emit identical chunk grids.
    docs = read_table(spark, sf_dir, "documents")
    return T.chunk_spans(
        docs, id_col="doc_id", text_col="text",
        size=_CHUNK_SIZE, stride=_CHUNK_STRIDE,
    )


# ---------------------------------------------------------------------------
# incremental corpus dedup (batch-vs-corpus ingestion)

_INCR_DEDUP_SQL = f"""
WITH f AS (
    SELECT doc_id, lang, source, md5({_NORM}) AS fp,
           (doc_id % 5 = 4) AS is_batch
    FROM documents
),
corpus AS (SELECT DISTINCT fp FROM f WHERE NOT is_batch),
fresh AS (
    SELECT f.doc_id, f.lang, f.source, f.fp
    FROM f
    WHERE is_batch
      AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = f.fp)
)
SELECT fp,
       min(doc_id)            AS doc_id,
       arg_min(lang, doc_id)   AS lang,
       arg_min(source, doc_id) AS source
FROM fresh GROUP BY fp
"""


@register(
    "incremental_corpus_dedup",
    sql=_INCR_DEDUP_SQL,
    description="incremental ingestion dedup: anti-join an incoming batch's "
    "fingerprints against the existing corpus, then intra-batch exact dedup "
    "(lowest id wins) — the continuous-ingestion shape of EXT-1",
)
def incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: ONE anti-join shuffle on the uniform MD5 key plus one
    # min(struct) partial aggregate; at 100 TB the corpus side is a
    # pre-materialized fingerprint index, so per-batch cost is
    # O(batch + index-probe), not O(corpus).
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    return D.incremental_exact_dedup(
        corpus, batch, text_col="text", id_col="doc_id", keep=("lang", "source")
    )


# ---------------------------------------------------------------------------
# temperature (α = 0.5) mixture sampling by source

_MIXTURE_SQL = f"""
WITH c AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source),
m AS (SELECT min(n_source) AS n_min FROM c),
r AS (
    SELECT source, n_source,
           CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_source AS DOUBLE))
                      * 256) AS BIGINT) AS keep_threshold
    FROM c, m
)
SELECT d.doc_id, d.source, r.n_source, r.keep_threshold,
       ({_hash_byte_sql("mix")}) < r.keep_threshold AS kept
FROM documents d JOIN r ON d.source = r.source
"""


@register(
    "source_mixture_sample",
    sql=_MIXTURE_SQL,
    description="temperature-sampled (α=0.5) training mixture: per-source "
    "keep rate sqrt(n_min/n_source), decided by a salted hash byte — "
    "deterministic, growth-stable, balanced toward small sources ([EXT])",
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the rate table is one tiny partial-agg rollup (|sources|
    # rows) broadcast back onto the corpus; the keep decision itself is
    # a pure projection — no shuffle touches the full corpus. sqrt/
    # divide/floor are IEEE exactly-rounded, so thresholds are
    # bit-identical across engines (pow would not be).
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_source"))
    # n_min via an unpartitioned window over the |sources|-row rollup —
    # one corpus scan total (a separate .agg(min) made Catalyst scan the
    # source column twice)
    rates = counts.withColumn(
        "n_min", F.min("n_source").over(Window.partitionBy())
    ).select(
        "source",
        "n_source",
        SA.temperature_threshold(F.col("n_source"), F.col("n_min")).alias(
            "keep_threshold"
        ),
    )
    return docs.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        "n_source",
        "keep_threshold",
        SA.mixture_keep(F.col("doc_id"), F.col("keep_threshold"), salt="mix").alias(
            "kept"
        ),
    )


# ---------------------------------------------------------------------------
# ordered funnel analysis over events

_FUNNEL_STAGES = ["signup", "click", "purchase"]

_FUNNEL_SQL = """
WITH s0 AS (
    SELECT user_id, min(ts) AS t0 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
s1 AS (
    SELECT s0.user_id, min(e.ts) AS t1
    FROM s0 JOIN events e
      ON e.user_id = s0.user_id AND e.event_type = 'click' AND e.ts >= s0.t0
    GROUP BY s0.user_id
),
s2 AS (
    SELECT s1.user_id, min(e.ts) AS t2
    FROM s1 JOIN events e
      ON e.user_id = s1.user_id AND e.event_type = 'purchase' AND e.ts >= s1.t1
    GROUP BY s1.user_id
)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage,
       (SELECT count(*) FROM s0) AS n_users
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s1)
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s2)
"""


@register(
    "event_funnel",
    sql=_FUNNEL_SQL,
    description="ordered funnel signup→click→purchase: users counted at "
    "stage i only with an in-order prefix (stage-i event at/after their "
    "stage-(i-1) time) — strict product-analytics funnel ([EXT] temporal)",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: k=3 user-keyed shuffles (fixed), per-user state is one
    # timestamp per stage — no event-list collection, hot users free.
    events = read_table(spark, sf_dir, "events")
    return TP.funnel_counts(events, _FUNNEL_STAGES)


# ---------------------------------------------------------------------------
# GK quantile sketch with rank-tolerance check (sketch family, like HLL)

_QS = [0.5, 0.9, 0.99]
_QS_ACC = 1000

_QUANTILE_SQL = f"""
WITH n AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type)
SELECT event_type, q, n_events, TRUE AS within_tolerance
FROM n, (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QS)}]) AS q)
"""


@register(
    "value_quantile_sketch",
    sql=_QUANTILE_SQL,
    description="approx_percentile (GK sketch) of value per event type at "
    "q=0.5/0.9/0.99. Sketch outputs are engine-specific, so the checkable "
    "contract is a rank-tolerance boolean (the HLL construction): the "
    "approx value's exact rank interval must overlap [q±2/accuracy]·n",
)
def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # At 100 TB this replaces exact percentiles: fixed-size GK sketches
    # merged map-side, one pass. The second pass (rank of the approx
    # value) exists only to make the approximation oracle-checkable —
    # it joins a 15-row broadcast against events and partial-aggregates
    # two conditional counts.
    events = read_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(float(q)) for q in _QS]), F.lit(_QS_ACC)
        ).alias("apx"),
        F.count("*").alias("n_events"),
    )
    pe = agg.select(
        "event_type",
        "n_events",
        F.posexplode("apx").alias("qi", "apx_v"),
    ).select(
        "event_type",
        "n_events",
        F.element_at(
            F.array(*[F.lit(float(q)) for q in _QS]), F.col("qi") + 1
        ).alias("q"),
        "apx_v",
    )
    ranks = (
        events.join(F.broadcast(pe), "event_type")
        .groupBy("event_type", "q", "n_events", "apx_v")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("apx_v"), 1).otherwise(0)).alias(
                "cnt_le"
            ),
            F.sum(F.when(F.col("value") < F.col("apx_v"), 1).otherwise(0)).alias(
                "cnt_lt"
            ),
        )
    )
    eps = 2.0 / _QS_ACC
    lo = F.floor((F.col("q") - eps) * F.col("n_events"))
    hi = F.ceil((F.col("q") + eps) * F.col("n_events"))
    within = (F.col("cnt_le") >= lo) & (F.col("cnt_lt") + 1 <= hi)
    return ranks.select(
        "event_type", "q", "n_events", within.alias("within_tolerance")
    )


# ---------------------------------------------------------------------------
# int8-quantized ANN with exact-top-k recall annotation

_QK = 5

_QUANT_SQL = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
nr AS (
    SELECT vec_id,
           [round(x / sqrt(list_dot_product(vv, vv)), 6) for x in vv] AS r
    FROM v
),
qz AS (
    SELECT vec_id, [CAST(floor(x * 127.0 / m + 0.5) AS BIGINT) for x in r] AS qv
    FROM (SELECT vec_id, r, list_max([abs(x) for x in r]) AS m FROM nr)
    WHERE m IS NOT NULL AND m <> 0
),
q AS (SELECT vec_id AS query_id, qv AS qqv FROM qz WHERE vec_id < 5),
s AS (
    SELECT query_id, z.vec_id,
           CAST(list_sum([z.qv[i] * qqv[i]
                          for i in range(1, len(z.qv) + 1)]) AS BIGINT) AS score_q
    FROM qz z CROSS JOIN q WHERE z.vec_id <> query_id
),
qt AS (
    SELECT query_id, vec_id, score_q,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score_q DESC, vec_id
           ) AS BIGINT) AS rank
    FROM s
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
eq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
es AS (
    SELECT query_id, vec_id,
           CASE WHEN list_dot_product(v, v) = 0 OR list_dot_product(qv, qv) = 0
                THEN NULL
                ELSE round(list_cosine_similarity(v, qv), 6) END AS score
    FROM e CROSS JOIN eq WHERE vec_id != query_id
),
et AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id
               ) AS rank
        FROM es
    ) WHERE rank <= {_QK}
)
SELECT qt.query_id, qt.rank, qt.vec_id, qt.score_q,
       (et.vec_id IS NOT NULL) AS in_exact_topk
FROM qt LEFT JOIN et
  ON qt.query_id = et.query_id AND qt.vec_id = et.vec_id
WHERE qt.rank <= {_QK}
"""


@register(
    "embedding_quantized_recall",
    sql=_QUANT_SQL,
    description=f"int8-quantized ANN top-{_QK} per query with exact-top-k "
    "recall annotation: quantized scores are integer dot products (exact "
    "arithmetic, fully hash-checkable — no tolerance needed), each hit "
    "flagged by whether the float-cosine exact top-k also contains it",
)
def embedding_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: int8 corpus is 4x smaller than float32 — the working-set
    # lever for a 100 TB ANN sweep; scoring is an integer fold (exact,
    # no accumulation-order noise). Quantization inputs are rounded
    # unit-normalized values so the codes are bit-identical across
    # engines; the exact-cosine side rides the already-proven rounded
    # ranking. One corpus scan per side, queries broadcast.
    from pyspark.sql.window import Window

    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", V.as_double_vec("embedding").alias("dv"))
    rounded = base.select(
        "vec_id",
        F.transform(
            V.normalize_vec(F.col("dv")), lambda x: F.round(x, 6)
        ).alias("r"),
    )
    qz = rounded.select("vec_id", V.quantize_int8(F.col("r")).alias("qv"))
    queries = qz.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    scored = (
        qz.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            V.int_dot(F.col("qv"), F.col("qqv")).alias("score_q"),
        )
        .filter(F.col("score_q").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("vec_id")
    )
    qtop = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _QK)
    )
    exact_queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = V.brute_force_topk(emb, exact_queries, k=_QK).select(
        "query_id", F.col("vec_id").alias("e_vec_id"), F.lit(True).alias("hit")
    )
    return (
        qtop.join(
            exact,
            (qtop.query_id == exact.query_id) & (qtop.vec_id == exact.e_vec_id),
            "left",
        )
        .select(
            qtop.query_id,
            "rank",
            "vec_id",
            "score_q",
            F.coalesce(F.col("hit"), F.lit(False)).alias("in_exact_topk"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE corpus summary + ratio-to-report token share

_CUBE_SQL = """
SELECT
    coalesce(source, '(all)') AS src,
    coalesce(lang, '(all)')   AS language,
    CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
    count(*) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE (source, lang)
"""


@register(
    "corpus_cube_summary",
    sql=_CUBE_SQL,
    description="CUBE over (source, lang): doc counts and char totals for "
    "every subtotal combination with grouping ids — the corpus-composition "
    "dashboard rollup ([EXT] warehouse tier)",
)
def corpus_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: CUBE compiles to one Expand (4 grouping sets) + ONE
    # partially-aggregated shuffle — subtotals cost one pass, not four.
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("(all)")).alias("src"),
            F.coalesce(F.col("lang"), F.lit("(all)")).alias("language"),
            F.col("gid").cast("long").alias("gid"),
            "n_docs",
            "sum_chars",
        )
    )


_SHARE_SQL = """
WITH s AS (
    SELECT source, CAST(sum(n_chars) AS BIGINT) AS src_chars
    FROM documents GROUP BY source
)
SELECT source, src_chars,
       CAST(sum(src_chars) OVER () AS BIGINT) AS total_chars,
       src_chars / (sum(src_chars) OVER () * 1.0) AS share
FROM s
"""


@register(
    "source_char_share",
    sql=_SHARE_SQL,
    description="ratio-to-report: each source's share of total corpus chars "
    "via an unpartitioned window over the per-source rollup — the mixture-"
    "weight report ([EXT] warehouse tier). Share is one IEEE division of "
    "two exact integers, hash-stable",
)
def source_char_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the window runs over the |sources|-row AGGREGATE, not the
    # corpus — one partial-agg shuffle plus a single-partition pass over
    # a tiny frame (same shape as the mixture rate table).
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.sum("n_chars").alias("src_chars"))
    total = F.sum("src_chars").over(Window.partitionBy())
    return per_src.select(
        "source",
        "src_chars",
        total.alias("total_chars"),
        (F.col("src_chars") / (total * F.lit(1.0))).alias("share"),
    )


# ---------------------------------------------------------------------------
# incremental near-dup candidates (batch vs corpus LSH index)

from magshield_data_pipeline_spark.plans.ext_queries import (  # noqa: E402
    _SHINGLES,
    _SIG_COLS,
    _WORDS,
)

_INCR_BUCKETS = "\n    UNION ALL ".join(
    f"SELECT doc_id, is_batch, {b} AS band, "
    f"md5(h{b * D.ROWS_PER_BAND} || h{b * D.ROWS_PER_BAND + 1}) AS bucket FROM sig"
    for b in range(D.MINHASH_BANDS)
)

_INCR_NEAR_DUP_SQL = f"""
WITH w AS (
    SELECT doc_id, {_WORDS} AS w, (doc_id % 5 = 4) AS is_batch FROM documents
),
sh  AS (SELECT doc_id, is_batch, {_SHINGLES} AS sh FROM w),
sig AS (SELECT doc_id, is_batch, {_SIG_COLS} FROM sh),
buckets AS ({_INCR_BUCKETS})
SELECT DISTINCT b.doc_id AS doc_a, c.doc_id AS doc_b, TRUE AS vs_corpus
FROM buckets b
JOIN buckets c ON b.band = c.band AND b.bucket = c.bucket
WHERE b.is_batch AND NOT c.is_batch
UNION ALL
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, FALSE AS vs_corpus
FROM buckets a
JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id
WHERE a.is_batch AND b.is_batch
"""


@register(
    "incremental_near_dup_candidates",
    sql=_INCR_NEAR_DUP_SQL,
    description="incremental near-dup detection: an incoming batch's LSH "
    "buckets probed against the corpus bucket index plus intra-batch "
    "candidates — the continuous-ingestion shape of EXT-2",
)
def incremental_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: per-batch cost is O(batch buckets + collisions) against a
    # materialized corpus index; both joins shuffle on the uniform
    # (band, bucket) hash key — never all-pairs, never O(corpus).
    docs = read_table_spread(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    return D.incremental_candidate_pairs(
        corpus, batch, text_col="text", id_col="doc_id"
    )


# ---------------------------------------------------------------------------
# row-level MERGE (upsert) — K2 generalized to row-by-key

_MERGE_SQL = """
WITH existing AS (
    SELECT o_orderkey AS order_id, o_orderstatus AS status,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % 2 = 0
),
updates AS (
    SELECT o_orderkey AS order_id, 'U' AS status,
           CAST(round(o_totalprice * 100) AS BIGINT) + 1 AS price_cents
    FROM orders WHERE o_orderkey % 3 = 0
)
SELECT e.order_id, e.status, e.price_cents
FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.order_id = e.order_id)
UNION ALL
SELECT order_id, status, price_cents FROM updates
"""


@register(
    "merge_upsert_orders",
    sql=_MERGE_SQL,
    description="row-level MERGE/upsert: updates win on key collision, "
    "unmatched existing rows pass through, new keys insert — K2's "
    "replace-else-create generalized to row-by-key (the lakehouse MERGE "
    "INTO plan: one anti-join + union)",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one anti-join shuffle on the key (the updates side
    # broadcasts in the common CDC case) + zero-shuffle union.
    from magshield_data_pipeline_spark import sinks

    orders = read_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        # round() before the cast: Spark's long cast truncates while
        # DuckDB's rounds; money carries exactly 2 decimals so *100 is
        # never at a half boundary and round() is exact on both sides
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
    )
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.lit("U").alias("status"),
        (F.round(F.col("o_totalprice") * 100, 0).cast("long") + 1).alias("price_cents"),
    )
    return sinks.merge_upsert(existing, updates, ["order_id"])


# ---------------------------------------------------------------------------
# streaming funnel tracker (stateful change feed, batch-parity checked)

_TSFMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
_TSFMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_STREAM_FUNNEL_SQL = f"""
WITH s0 AS (
    SELECT user_id, min(ts) AS t0 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
s1 AS (
    SELECT s0.user_id, min(e.ts) AS t1
    FROM s0 JOIN events e
      ON e.user_id = s0.user_id AND e.event_type = 'click' AND e.ts >= s0.t0
    GROUP BY s0.user_id
),
s2 AS (
    SELECT s1.user_id, min(e.ts) AS t2
    FROM s1 JOIN events e
      ON e.user_id = s1.user_id AND e.event_type = 'purchase' AND e.ts >= s1.t1
    GROUP BY s1.user_id
)
SELECT s0.user_id,
       strftime(s0.t0, '{_TSFMT_DUCK}') AS signup_ts,
       strftime(s1.t1, '{_TSFMT_DUCK}') AS click_ts,
       strftime(s2.t2, '{_TSFMT_DUCK}') AS purchase_ts,
       CAST(CASE WHEN s2.t2 IS NOT NULL THEN 3
                 WHEN s1.t1 IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) AS n_stages
FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
        LEFT JOIN s2 ON s0.user_id = s2.user_id
"""


@register(
    "streaming_funnel_progress",
    sql=_STREAM_FUNNEL_SQL,
    description="stateful streaming funnel tracker: per-user conversion "
    "state (applyInPandasWithState, one 3-long tuple per user) emitted as "
    "a change feed; under Trigger.AvailableNow the emitted set equals the "
    "batch funnel's per-user stage times — the parity the oracle checks "
    "([EXT] streaming tier)",
)
def streaming_funnel_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: state is fixed-width per funnel-entered user; the batch
    # rule is applied vectorized (numpy stage-min against carried
    # state), so intra-batch event order never matters; watermark
    # bounds replay, and emitted progress only tightens forward.
    from magshield_data_pipeline_spark.streaming import stateful as ST
    from magshield_data_pipeline_spark.streaming import windows as W

    stream = W.read_events_stream(spark, sf_dir)
    feed = ST.funnel_stateful(stream, watermark="10 minutes")
    # no_data_batch=False (r13): the funnel's EventTimeTimeout path
    # EVICTS buffer-only users without yielding a row (see
    # funnel_stateful — timeout means "no signup can ever unlock these
    # buffers"), so the trailing watermark-advance batch can never add
    # to the emitted set at ANY watermark; it only re-ran the stateful
    # plan over 3k state rows.  Progress rows emit in the data batch.
    out = W.run_available_now(feed, output_mode="append",
                              state_partitions=8, no_data_batch=False)
    return out.select(
        "user_id",
        F.date_format("t0", _TSFMT_SPARK).alias("signup_ts"),
        F.date_format("t1", _TSFMT_SPARK).alias("click_ts"),
        F.date_format("t2", _TSFMT_SPARK).alias("purchase_ts"),
        "n_stages",
    )


# ---------------------------------------------------------------------------
# column-statistics profiler (pipeline observability)

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]

_COLPROFILE_SQL = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
    f"count(*) - count({c}) AS n_nulls, "
    f"count(DISTINCT {c}) AS n_distinct FROM orders"
    for c in _PROFILE_COLS
)


@register(
    "orders_column_profile",
    sql=_COLPROFILE_SQL,
    description="column-statistics profiler: rows/nulls/distinct per column "
    "in ONE pass — the data-quality gate a pipeline runs on every ingested "
    "batch ([EXT] observability)",
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan + one global aggregate computes every column's stats
    # (the oracle UNION ALL restates it per column; Spark does not).
    # At 100 TB swap count_distinct for approx_count_distinct — same
    # plan, fixed-size sketch state; exact here so the oracle can check
    # values, not tolerances.
    orders = read_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# hash-based table diff (replication / migration reconciliation)

_DIFF_ROWHASH = (
    "md5(CAST(o_orderkey AS VARCHAR) || '|' || coalesce(o_orderstatus, '') "
    "|| '|' || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))"
)

_TABLE_DIFF_SQL = f"""
WITH base AS (
    SELECT o_orderkey AS order_id, {_DIFF_ROWHASH} AS row_hash FROM orders
),
replica_src AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
           o_totalprice
    FROM orders WHERE o_orderkey % 101 <> 0
),
replica AS (
    SELECT o_orderkey AS order_id, {_DIFF_ROWHASH} AS row_hash FROM replica_src
)
SELECT
    coalesce(b.order_id, r.order_id) AS order_id,
    (b.order_id IS NOT NULL) AS in_base,
    (r.order_id IS NOT NULL) AS in_replica,
    coalesce(b.row_hash = r.row_hash, FALSE) AS hash_equal
FROM base b FULL OUTER JOIN replica r ON b.order_id = r.order_id
WHERE b.order_id IS NULL OR r.order_id IS NULL OR b.row_hash <> r.row_hash
"""


def _row_hash(df: DataFrame):
    return F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.coalesce(F.col("o_orderstatus"), F.lit("")),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
        )
    )


@register(
    "orders_replica_diff",
    sql=_TABLE_DIFF_SQL,
    description="hash-based table reconciliation: full-outer join of "
    "per-row MD5s surfaces modified / dropped rows between a table and "
    "its (deliberately perturbed) replica — the anti-entropy check a "
    "replicated 100 TB store runs ([EXT] observability)",
)
def orders_replica_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: rows collapse to (key, 32-byte hash) BEFORE the join, so
    # the exchange carries fingerprints, not payloads; the join keys on
    # the primary key (uniform). Money is hashed as integer cents —
    # double-to-string formatting is never part of the fingerprint.
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("order_id"), _row_hash(orders).alias("row_hash")
    )
    replica_src = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    replica = replica_src.select(
        F.col("o_orderkey").alias("order_id"),
        _row_hash(replica_src).alias("row_hash"),
    )
    b, r = base.alias("b"), replica.alias("r")
    joined = b.join(r, F.col("b.order_id") == F.col("r.order_id"), "full_outer")
    return joined.select(
        F.coalesce(F.col("b.order_id"), F.col("r.order_id")).alias("order_id"),
        F.col("b.order_id").isNotNull().alias("in_base"),
        F.col("r.order_id").isNotNull().alias("in_replica"),
        F.coalesce(
            F.col("b.row_hash") == F.col("r.row_hash"), F.lit(False)
        ).alias("hash_equal"),
    ).filter(
        F.col("b.order_id").isNull()
        | F.col("r.order_id").isNull()
        | (F.col("b.row_hash") != F.col("r.row_hash"))
    )


# ---------------------------------------------------------------------------
# id-gap detection (completeness check) + SCD2 validity intervals

_GAPS_SQL = """
WITH ingested AS (
    -- simulate dropped batches: every 7th key failed to land
    SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0
),
k AS (
    SELECT o_orderkey AS id,
           lead(o_orderkey) OVER (ORDER BY o_orderkey) AS next_id
    FROM ingested
)
SELECT id AS gap_after, next_id AS resumes_at,
       CAST(next_id - id - 1 AS BIGINT) AS n_missing
FROM k WHERE next_id - id > 1
"""


@register(
    "orderkey_gap_islands",
    sql=_GAPS_SQL,
    description="sequence-gap detection over the order-key space (lead() "
    "islands): the completeness check an ingestion pipeline runs to catch "
    "dropped pages/batches ([EXT] observability)",
)
def orderkey_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bucketed two-level gap scan (operators/scale.py::sequence_gaps):
    # intra-bucket windows are partition-bounded and parallel; only the
    # tiny per-bucket (min,max) rollup sees an ordered seam window. The
    # naive lead-over-global-ORDER BY single-partitions the whole
    # table at 100 TB (WindowExec "No Partition Defined" warning).
    from magshield_data_pipeline_spark.operators import scale as SC

    orders = read_table(spark, sf_dir, "orders")
    # simulate dropped batches: every 7th key failed to land
    ingested = orders.filter(F.col("o_orderkey") % 7 != 0)
    return SC.sequence_gaps(ingested, "o_orderkey", bucket_size=1024)


_TSFMT_D2 = "%Y-%m-%d %H:%M:%S.%f"
_SCD2_SQL = f"""
WITH h AS (
    SELECT user_id, event_type, ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
    FROM events
)
SELECT user_id,
       CAST(version AS BIGINT) AS version,
       event_type AS state,
       strftime(ts, '{_TSFMT_D2}') AS valid_from,
       strftime(next_ts, '{_TSFMT_D2}') AS valid_to,
       (next_ts IS NULL) AS is_current
FROM h
"""


@register(
    "scd2_user_state_history",
    sql=_SCD2_SQL,
    description="SCD2 history build: each user's event stream becomes "
    "versioned validity intervals [ts, next_ts) via lead(), open-ended "
    "current row flagged — the slowly-changing-dimension load a warehouse "
    "runs ([EXT] warehouse tier)",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on the dimension key; per-key window state is a
    # single carried row. The (ts, event_id) tiebreak totalizes the
    # order so versions are deterministic under the driver's hash.
    from pyspark.sql.window import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    h = events.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
        F.row_number().over(w).cast("long").alias("version"),
    )
    return h.select(
        "user_id",
        "version",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        F.col("next_ts").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# cohort retention + event-type co-occurrence (product analytics)

_COHORT_SQL = """
WITH firsts AS (
    SELECT user_id,
           CAST(floor(min(epoch(ts)) / 604800) AS BIGINT) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id,
           CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS active_week
    FROM events e
)
SELECT f.cohort_week,
       CAST(a.active_week - f.cohort_week AS BIGINT) AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort_week, a.active_week - f.cohort_week
"""


@register(
    "cohort_retention",
    sql=_COHORT_SQL,
    description="cohort retention matrix: users bucketed by first-activity "
    "week, counted per week-offset they return — the product-analytics "
    "retention triangle ([EXT] warehouse tier). Week ids are integer "
    "floor(epoch-seconds / 604800), exact on both engines (DuckDB's // is NOT a floor on doubles)",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: two user-keyed partial aggregates + one join on user_id,
    # then a tiny (cohorts × offsets) rollup. Week bucketing is integer
    # floor-division of epoch seconds — no timezone or calendar
    # ambiguity between engines.
    events = read_table(spark, sf_dir, "events")
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("long")  # noqa: E731
    firsts = events.groupBy("user_id").agg(
        F.min(week(F.col("ts"))).alias("cohort_week")
    )
    activity = events.select(
        "user_id", week(F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_COOCCUR_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


@register(
    "event_type_cooccurrence",
    sql=_COOCCUR_SQL,
    description="event-type co-occurrence (2-itemset counts): users who "
    "performed both types, per unordered pair — basket-analysis over the "
    "deduplicated (user, type) pairs ([EXT] warehouse tier)",
)
def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: dedup to (user, type) FIRST (partial-agg distinct), so the
    # self-join fan-out is bounded by types-per-user (≤ |types|), never
    # event volume; the pair rollup is |types|² rows.
    events = read_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# exact repeated-passage detection + quota-stratified eval sampling

_PASSAGE_SIZE = 100
_PASSAGE_STRIDE = 50

_REPEATED_SQL = f"""
WITH g AS (
    SELECT doc_id,
           unnest(generate_series(0, greatest(length(text) - {_PASSAGE_SIZE}, 0),
                                  {_PASSAGE_STRIDE})) AS p
    FROM documents
    WHERE length(text) >= {_PASSAGE_SIZE}
)
SELECT md5(substring(d.text, g.p + 1, {_PASSAGE_SIZE})) AS passage_md5,
       count(DISTINCT g.doc_id) AS n_docs,
       count(*) AS n_occurrences,
       min(g.doc_id) AS first_doc
FROM g JOIN documents d ON g.doc_id = d.doc_id
GROUP BY 1
HAVING count(DISTINCT g.doc_id) > 1
"""


@register(
    "repeated_passages",
    sql=_REPEATED_SQL,
    description=f"exact repeated-substring detection: {_PASSAGE_SIZE}-char "
    f"passages (stride {_PASSAGE_STRIDE}) appearing in >1 document — the "
    "cross-document boilerplate/contamination signal behind substring-level "
    "corpus dedup; linear cost, no pair join ([EXT] curation)",
)
def repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: grid explode (zero shuffle) + one partial-agg groupBy on
    # the uniform passage hash; no pair join exists — hot passages make
    # one reduce group large, which AQE splits, instead of a quadratic
    # join fan-out.
    docs = read_table(spark, sf_dir, "documents")
    return T.repeated_passages(
        docs, id_col="doc_id", text_col="text",
        size=_PASSAGE_SIZE, stride=_PASSAGE_STRIDE,
    )


_SPAN_SQL = f"""
WITH g AS (
    SELECT doc_id,
           unnest(generate_series(0, greatest(length(text) - {_PASSAGE_SIZE}, 0),
                                  {_PASSAGE_STRIDE})) AS p
    FROM documents
    WHERE length(text) >= {_PASSAGE_SIZE}
),
occ AS (
    SELECT g.doc_id, g.p,
           md5(substring(d.text, g.p + 1, {_PASSAGE_SIZE})) AS h
    FROM g JOIN documents d ON g.doc_id = d.doc_id
),
hot AS (
    SELECT h FROM occ GROUP BY h HAVING count(DISTINCT doc_id) > 1
),
o AS (
    SELECT doc_id, p FROM occ WHERE h IN (SELECT h FROM hot)
),
marked AS (
    SELECT doc_id, p,
           CASE WHEN max(p + {_PASSAGE_SIZE}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR p > max(p + {_PASSAGE_SIZE}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                )
                THEN 1 ELSE 0 END AS new_island
    FROM o
),
isl AS (
    SELECT doc_id, p,
           sum(new_island) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS island
    FROM marked
)
SELECT doc_id,
       CAST(min(p) AS BIGINT) AS span_start,
       CAST(max(p + {_PASSAGE_SIZE}) AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY doc_id, island
"""


@register(
    "duplicate_span_islands",
    sql=_SPAN_SQL,
    description="maximal duplicated character ranges per document: "
    "repeated grid passages merged gaps-and-islands into the contiguous "
    "spans a removal transform would cut (duplicated byte RANGES, not "
    "fixed windows — Lee et al. 2022); per-doc windows only, no global "
    "sort ([EXT] curation)",
)
def duplicate_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: hot-hash semi join broadcasts (the shared-passage set is
    # corpus-boilerplate sized); the islands window partitions by doc,
    # so cost is bounded by windows-per-doc — the same per-entity
    # discipline as sessionization. No pair join, no global sort.
    docs = read_table_spread(spark, sf_dir, "documents")
    return T.duplicate_spans(
        docs, id_col="doc_id", text_col="text",
        size=_PASSAGE_SIZE, stride=_PASSAGE_STRIDE,
    )


_REMOVAL_SQL = f"""
WITH g AS (
    SELECT doc_id,
           unnest(generate_series(0, greatest(length(text) - {_PASSAGE_SIZE}, 0),
                                  {_PASSAGE_STRIDE})) AS p
    FROM documents
    WHERE length(text) >= {_PASSAGE_SIZE}
),
occ AS (
    SELECT g.doc_id, g.p,
           md5(substring(d.text, g.p + 1, {_PASSAGE_SIZE})) AS h
    FROM g JOIN documents d ON g.doc_id = d.doc_id
),
o AS (
    SELECT doc_id, p FROM occ
    WHERE h IN (SELECT h FROM occ GROUP BY h
                HAVING count(DISTINCT doc_id) > 1)
),
marked AS (
    SELECT doc_id, p,
           CASE WHEN max(p + {_PASSAGE_SIZE}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR p > max(p + {_PASSAGE_SIZE}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                )
                THEN 1 ELSE 0 END AS new_island
    FROM o
),
isl AS (
    SELECT doc_id,
           min(p) AS span_start,
           max(p + {_PASSAGE_SIZE}) AS span_end
    FROM (
        SELECT doc_id, p,
               sum(new_island) OVER (
                   PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM marked
    )
    GROUP BY doc_id, island
),
seg AS (
    SELECT doc_id, span_start, span_end,
           coalesce(lag(span_end) OVER (
               PARTITION BY doc_id ORDER BY span_start
           ), 0) AS prev_end
    FROM isl
),
pieces AS (
    SELECT s.doc_id, s.span_start AS ord,
           substring(d.text, CAST(s.prev_end + 1 AS INT),
                     CAST(s.span_start - s.prev_end AS INT)) AS piece
    FROM seg s JOIN documents d ON s.doc_id = d.doc_id
    UNION ALL
    SELECT t.doc_id, 2147483647 AS ord,
           substring(d.text, CAST(t.me + 1 AS INT),
                     CAST(length(d.text) - t.me AS INT)) AS piece
    FROM (SELECT doc_id, max(span_end) AS me FROM isl GROUP BY 1) t
    JOIN documents d ON t.doc_id = d.doc_id
),
kept AS (
    SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS kept_text
    FROM pieces GROUP BY 1
),
stats AS (
    SELECT doc_id, count(*) AS n_spans,
           sum(span_end - span_start) AS n_cut
    FROM isl GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(s.n_cut, 0) AS BIGINT) AS n_cut_chars,
       CAST(length(coalesce(k.kept_text, d.text)) AS BIGINT) AS kept_len,
       md5(coalesce(k.kept_text, d.text)) AS kept_md5
FROM documents d
LEFT JOIN stats s ON d.doc_id = s.doc_id
LEFT JOIN kept k ON d.doc_id = k.doc_id
"""


@register(
    "duplicate_span_removal",
    sql=_REMOVAL_SQL,
    description="span REMOVAL transform: cut every maximal duplicated "
    "range (duplicate_span_islands) out of each document via ONE "
    "Catalyst aggregate fold over the per-doc sorted span list — no "
    "UDF; every doc emits (uncut docs pass through) with the kept "
    "text's md5 standing in for arbitrary-size text ([EXT] curation)",
)
def duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: islands (already blocked + per-doc-windowed) roll up to
    # one bounded array per doc; the cut is a linear left-to-right
    # fold inside whole-stage codegen, and the doc↔spans join keys on
    # doc_id (AQE broadcasts the span side when it is boilerplate-
    # sized). The md5 output keeps the driver compare scalar.
    docs = read_table_spread(spark, sf_dir, "documents")
    spans = T.duplicate_spans(
        docs, id_col="doc_id", text_col="text",
        size=_PASSAGE_SIZE, stride=_PASSAGE_STRIDE,
    )
    return T.cut_spans(docs, spans, id_col="doc_id", text_col="text").drop(
        "kept_text"
    )


_QUOTA_PER_LANG = 3

_QUOTA_SQL = f"""
SELECT doc_id, lang, CAST(pick_rank AS BIGINT) AS pick_rank FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('quota|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pick_rank
    FROM documents
) WHERE pick_rank <= {_QUOTA_PER_LANG}
"""


@register(
    "quota_stratified_sample",
    sql=_QUOTA_SQL,
    description=f"quota-stratified eval sampling: first {_QUOTA_PER_LANG} "
    "docs per language by salted-hash order — balanced eval-set "
    "construction, deterministic and growth-stable within a stratum's "
    "retained prefix ([EXT] sampling)",
)
def quota_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one shuffle on the stratum key; WindowGroupLimit prunes to
    # the quota per stratum BEFORE the exchange, so the shuffle carries
    # ~quota×strata rows, not the corpus. Ordering by a salted MD5
    # makes the pick uniform (not id-biased) yet fully deterministic.
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("quota|"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    return (
        docs.select(
            "doc_id", "lang", F.row_number().over(w).cast("long").alias("pick_rank")
        )
        .filter(F.col("pick_rank") <= _QUOTA_PER_LANG)
    )


# ---------------------------------------------------------------------------
# content-defined chunking (offset-independent substring dedup unit)

_CDC_W = 16

_CDC_SQL = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
pos AS (
    SELECT doc_id, text, n,
           unnest(generate_series({_CDC_W}, n - 1, 1)) AS p
    FROM d WHERE n > {_CDC_W}
),
bnd AS (
    SELECT doc_id, p FROM pos
    WHERE substring(md5(substring(text, p - {_CDC_W} + 1, {_CDC_W})), 1, 2) = '00'
),
allb AS (
    SELECT doc_id, 0 AS p FROM d
    UNION ALL
    SELECT doc_id, p FROM bnd
),
spans AS (
    SELECT doc_id, p AS chunk_start,
           lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS next_p,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1
                AS BIGINT) AS chunk_idx
    FROM allb
)
SELECT s.doc_id,
       s.chunk_idx,
       CAST(s.chunk_start AS BIGINT) AS chunk_start,
       CAST(coalesce(s.next_p, d.n) - s.chunk_start AS BIGINT) AS chunk_len,
       md5(substring(d.text, s.chunk_start + 1,
                     coalesce(s.next_p, d.n) - s.chunk_start)) AS chunk_md5
FROM spans s JOIN d ON s.doc_id = d.doc_id
"""


@register(
    "cdc_chunk_table",
    sql=_CDC_SQL,
    description=f"content-defined chunking (w={_CDC_W} rolling window, "
    "boundary on md5 byte 0x00, ~256-char chunks): boundaries depend only "
    "on local content, so identical passages chunk identically at ANY "
    "offset — the offset-independent unit for substring-level corpus "
    "dedup ([EXT] curation; Arrow mapInPandas)",
)
def cdc_chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one Arrow-batched scan, zero shuffle, output linear in
    # corpus size (~len/256 rows per doc). The oracle restates the
    # boundary rule as a per-position SQL grid — O(n·w) — while the
    # engine's rolling pass is O(n): same semantics, different cost,
    # which is exactly why the operator exists.
    docs = read_table(spark, sf_dir, "documents")
    return T.cdc_chunks(docs, id_col="doc_id", text_col="text", w=_CDC_W)


# ---------------------------------------------------------------------------
# CDC cross-document repeated chunks + week-over-week event deltas

_CDC_MIN_LEN = 32

_CDC_REPEAT_SQL = f"""
WITH chunks AS ({_CDC_SQL.replace(chr(10), chr(10) + "    ")})
SELECT chunk_md5,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences,
       min(doc_id) AS first_doc,
       CAST(min(chunk_len) AS BIGINT) AS chunk_len
FROM chunks
WHERE chunk_len >= {_CDC_MIN_LEN}
GROUP BY chunk_md5
HAVING count(DISTINCT doc_id) > 1
"""


@register(
    "cdc_repeated_chunks",
    sql=_CDC_REPEAT_SQL,
    description="cross-document repeated CDC chunks (len >= "
    f"{_CDC_MIN_LEN}): offset-independent substring-dedup detection — "
    "the pass that anti-joins against training docs to strip shared "
    "boilerplate at ANY position ([EXT] curation)",
)
def cdc_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the chunker's linear Arrow pass + ONE partial-agg rollup
    # on the uniform chunk hash — no pair join, offset-independent.
    docs = read_table_spread(spark, sf_dir, "documents")
    chunks = T.cdc_chunks(docs, id_col="doc_id", text_col="text", w=_CDC_W)
    return (
        chunks.filter(F.col("chunk_len") >= _CDC_MIN_LEN)
        .groupBy("chunk_md5")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.min("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") > 1)
    )


_WOW_SQL = """
WITH weekly AS (
    SELECT event_type,
           CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_id,
           count(*) AS n_events
    FROM events GROUP BY event_type, CAST(floor(epoch(ts) / 604800) AS BIGINT)
)
SELECT event_type, week_id, n_events,
       CAST(n_events - lag(n_events) OVER (
           PARTITION BY event_type ORDER BY week_id
       ) AS BIGINT) AS delta_events
FROM weekly
"""


@register(
    "weekly_event_deltas",
    sql=_WOW_SQL,
    description="week-over-week deltas per event type (lag over the weekly "
    "rollup): the reporting query every dashboard runs; the window sees "
    "|types|x|weeks| aggregate rows, never raw events ([EXT] warehouse)",
)
def weekly_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one partial-agg shuffle to the weekly rollup; the lag
    # window runs over the tiny aggregate.
    from pyspark.sql.window import Window

    events = read_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 604800).cast("long").alias("week_id"),
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("week_id")
    return weekly.select(
        "event_type",
        "week_id",
        "n_events",
        (F.col("n_events") - F.lag("n_events").over(w)).cast("long").alias(
            "delta_events"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup (registered r5)

_BLOOM_DEDUP_SQL = f"""
WITH f AS (
    SELECT doc_id, lang, source, md5({_NORM}) AS fp,
           (doc_id % 7 = 3) AS is_batch
    FROM documents
),
corpus AS (SELECT DISTINCT fp FROM f WHERE NOT is_batch),
fresh AS (
    SELECT f.doc_id, f.lang, f.source, f.fp
    FROM f
    WHERE is_batch
      AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = f.fp)
)
SELECT fp,
       min(doc_id)            AS doc_id,
       arg_min(lang, doc_id)   AS lang,
       arg_min(source, doc_id) AS source
FROM fresh GROUP BY fp
"""


@register(
    "bloom_prefiltered_dedup",
    sql=_BLOOM_DEDUP_SQL,
    description="incremental dedup behind a broadcast Bloom prefilter "
    "(2^20-bit sparse-map filter built with JVM bit aggregates - Spark "
    "exposes no bloom_filter_agg): batch rows the filter proves fresh "
    "skip the corpus-index shuffle; only the dup+false-positive slice "
    "reaches the exact anti-join. Output is EXACT (never a false "
    "negative, positives re-verified), so the oracle is the plain "
    "anti-join dedup - the bloom changes the cost, not the answer",
)
def bloom_prefiltered_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    batch = docs.filter(F.col("doc_id") % 7 == 3)
    return D.bloom_incremental_dedup(
        corpus, batch, text_col="text", id_col="doc_id", keep=("lang", "source")
    )


# ---------------------------------------------------------------------------
# passage-level dedup with reassembly (registered r5)

_PASSAGE_B = 10

_PASSAGE_DEDUP_SQL = f"""
WITH w AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
idx AS (
    SELECT doc_id, w,
           unnest(range(0, greatest(CAST(ceil(len(w) / {_PASSAGE_B}.0) AS BIGINT), 1))) AS pos
    FROM w
),
b AS (
    SELECT doc_id, pos,
           array_to_string(w[(pos*{_PASSAGE_B}+1):(pos*{_PASSAGE_B}+{_PASSAGE_B})], ' ') AS blk
    FROM idx
),
fpb AS (SELECT doc_id, pos, blk, md5(blk) AS bfp FROM b),
ranked AS (
    SELECT doc_id, pos, blk,
           row_number() OVER (PARTITION BY bfp ORDER BY doc_id, pos) AS rn
    FROM fpb
),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks FROM b GROUP BY doc_id),
rebuilt AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(blk, ' ' ORDER BY pos)) AS dedup_fp
    FROM ranked WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id, t.n_blocks,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_blocks - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
       coalesce(r.dedup_fp, md5('')) AS dedup_fp
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


@register(
    "passage_dedup_reassembly",
    sql=_PASSAGE_DEDUP_SQL,
    description=f"corpus-wide passage dedup with reassembly ({_PASSAGE_B}-"
    "word blocks, first occurrence by (doc_id, pos) wins, survivors "
    "stitched back per doc) - the RefinedWeb-style duplicated-passage "
    "REMOVAL transform beside the detection-only repeated_passages; "
    "dedup_fp hashes the rebuilt text so parity covers the reassembly "
    "itself, not just the counts",
)
def passage_dedup_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: linear block explode, one min(struct) winner aggregate on
    # the uniform block hash, survivors join back on that hash, per-doc
    # array_sort reassembly - no ranking window, no sort exchange.
    docs = read_table_spread(spark, sf_dir, "documents")
    return T.passage_dedup(
        docs, id_col="doc_id", text_col="text", block_words=_PASSAGE_B
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis; registered r5)

_ES_PER_SOURCE = 5

_ES_KEY_SQL = SA.es_weight_key_sql("doc_id", "n_chars")

_ES_SAMPLE_SQL = f"""
SELECT source, doc_id, n_chars, es_key, CAST(pick_rank AS BIGINT) AS pick_rank
FROM (
    SELECT source, doc_id, n_chars,
           {_ES_KEY_SQL} AS es_key,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {_ES_KEY_SQL} DESC, doc_id
           ) AS pick_rank
    FROM documents
    WHERE n_chars > 0
) WHERE pick_rank <= {_ES_PER_SOURCE}
"""


@register(
    "weighted_sample_per_source",
    sql=_ES_SAMPLE_SQL,
    description=f"weighted sampling WITHOUT replacement: top-{_ES_PER_SOURCE} "
    "docs per source by the Efraimidis–Spirakis key ln(u)/weight (u from "
    "a salted md5, weight = n_chars) — inclusion odds proportional to "
    "document length, one pass, growth-stable; the weighted complement "
    "of quota_stratified_sample's uniform draw ([EXT] sampling tier, "
    "Efraimidis & Spirakis IPL 2006)",
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: identical plan shape to the quota query — one shuffle on
    # the group key, WindowGroupLimit prunes to k per group map-side.
    # The E-S key is a projection (salted md5 + one ln()); ranking on a
    # 9-decimal-rounded key with a doc_id tiebreak keeps the draw
    # engine-reproducible (see operators/sampling.py::es_weight_key).
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        SA.es_weight_key(F.col("doc_id"), F.col("n_chars")).alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= _ES_PER_SOURCE)
    )


# ---------------------------------------------------------------------------
# data-quality constraint gate (registered r5)

_DQ_STAGED_SQL = """
staged AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 211 = 0 THEN -o_totalprice
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 223 = 0 THEN 'Z'
                ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % 227 = 0 THEN -1
                ELSE o_custkey END AS o_custkey,
           o_orderdate
    FROM orders
)
"""

_DQ_SQL = f"""
WITH {_DQ_STAGED_SQL},
n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM staged),
rules AS (
    SELECT 'positive_total' AS rule,
           CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM staged
    UNION ALL
    SELECT 'valid_status',
           CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM staged
    UNION ALL
    SELECT 'orderdate_in_range',
           CAST(sum(CASE WHEN NOT coalesce(
                              year(o_orderdate) BETWEEN 1995 AND 2001, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM staged
    UNION ALL
    SELECT 'custkey_fk',
           (SELECT CAST(count(*) AS BIGINT)
            FROM staged s LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON s.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL)
)
SELECT rule, n_violations, n.n_rows,
       CAST(floor(n_violations * 1000000 / n.n_rows) AS BIGINT) AS violation_ppm
FROM rules CROSS JOIN n
"""


def _dq_staged_frame(orders):
    """The gate/quarantine SHARED in-plan perturbation (moduli
    211/223/227) — one definition so the two companions can never
    drift apart; mirrors _DQ_STAGED_SQL."""
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 211 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 223 == 0, F.lit("Z"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 227 == 0, F.lit(-1).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_orderdate",
    )


def _dq_predicate_rules():
    """The three predicate rules, shared by gate and quarantine."""
    return {
        "positive_total": F.col("o_totalprice") > 0,
        "valid_status": F.col("o_orderstatus").isin("O", "F", "P"),
        "orderdate_in_range": F.year("o_orderdate").between(1995, 2001),
    }


@register(
    "data_quality_gate",
    sql=_DQ_SQL,
    description="declarative data-quality gate (Deequ/Great-Expectations "
    "shape): 3 predicate rules evaluated in ONE partial-agg scan + a "
    "referential anti-join rule, reported as per-rule violation counts "
    "with exact integer ppm; input deliberately perturbed in-plan "
    "(negated totals, invalid status, FK orphans keyed on moduli) so "
    "the audit has teeth — one rule stays at 0 to prove the pass case "
    "([EXT] observability)",
)
def data_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: predicate rules cost ONE scan whatever their number (the
    # rollup emits a single row that unpivots plan-side); the FK rule
    # is an anti-join on the key with strategy left to AQE. Violations
    # are reported as counts/ppm — quarantining actual rows is a
    # separate write performed only for rules over threshold.
    from magshield_data_pipeline_spark.operators import quality as Q

    orders = read_table(spark, sf_dir, "orders")
    staged = _dq_staged_frame(orders)
    customer = read_table(spark, sf_dir, "customer")
    predicate_report = Q.dq_violation_counts(staged, _dq_predicate_rules())
    fk_report = Q.dq_fk_violations(
        staged, "o_custkey", customer, "c_custkey", "custkey_fk"
    )
    return Q.with_ppm(predicate_report.unionByName(fk_report))


# ---------------------------------------------------------------------------
# row-level quarantine companion to the DQ gate (registered r6)

_DQ_QUAR_SQL = f"""
WITH {_DQ_STAGED_SQL},
j AS (
    SELECT s.*, c.c_custkey AS ck
    FROM staged s
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON s.o_custkey = c.c_custkey
),
f AS (
    SELECT o_orderkey,
           array_to_string(list_sort(list_filter([
               CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                    THEN 'positive_total' END,
               CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
                    THEN 'valid_status' END,
               CASE WHEN NOT coalesce(year(o_orderdate) BETWEEN 1995 AND 2001,
                                      FALSE)
                    THEN 'orderdate_in_range' END,
               CASE WHEN ck IS NULL THEN 'custkey_fk' END
           ], x -> x IS NOT NULL)), ',') AS failed_rules
    FROM j
)
SELECT o_orderkey, failed_rules FROM f WHERE failed_rules != ''
"""


@register(
    "dq_quarantine_rows",
    sql=_DQ_QUAR_SQL,
    description="row-level quarantine companion to data_quality_gate: "
    "the violating rows themselves, each tagged with a sorted comma-"
    "joined failed_rules string — the frame a pipeline writes to the "
    "quarantine sink while clean rows continue downstream; same in-plan "
    "perturbation and rule set as the gate (FK rule folded to a "
    "predicate via one left join), ONE scan + projection/filter "
    "([EXT] observability)",
)
def dq_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: identical cost shape to the gate minus the rollup — the
    # quarantine is a filter, so it writes only violating rows (~1.5%
    # here); the FK membership join is the one exchange and AQE picks
    # its strategy. Output kept scalar (key + tag string) per the
    # driver canonicalizer contract.
    from magshield_data_pipeline_spark.operators import quality as Q

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    staged = _dq_staged_frame(orders)
    with_fk = staged.join(
        customer.select(F.col("c_custkey").alias("ck")).distinct(),
        staged.o_custkey == F.col("ck"),
        "left",
    )
    rules = {**_dq_predicate_rules(), "custkey_fk": F.col("ck").isNotNull()}
    return Q.dq_quarantine(with_fk, rules).select("o_orderkey", "failed_rules")


# ---------------------------------------------------------------------------
# entity resolution / record linkage (registered r5)

_ER_THRESHOLD = 0.9

_ER_SIM = (
    "round(CASE WHEN greatest(length(dname), length(cname)) = 0 THEN 1.0 "
    "ELSE 1.0 - CAST(levenshtein(dname, cname) AS DOUBLE) "
    "/ greatest(length(dname), length(cname)) END, 6)"
)

_ER_SQL = f"""
WITH dirty AS (
    SELECT c_custkey AS dirty_id,
           substr(c_name, 1, 1) || 'x' || substr(c_name, 3) AS dname,
           right(substr(c_name, 1, 1) || 'x' || substr(c_name, 3), 3) AS bk
    FROM customer WHERE c_custkey % 7 = 0
),
clean AS (
    SELECT c_custkey AS clean_id, c_name AS cname, right(c_name, 3) AS bk
    FROM customer
),
pairs AS (
    SELECT dirty_id, clean_id, {_ER_SIM} AS sim
    FROM dirty JOIN clean USING (bk)
),
best AS (
    SELECT dirty_id, clean_id AS matched_id, sim,
           row_number() OVER (
               PARTITION BY dirty_id ORDER BY sim DESC, clean_id
           ) AS rn
    FROM pairs WHERE sim >= {_ER_THRESHOLD}
)
SELECT dirty_id, matched_id, sim, (dirty_id = matched_id) AS correct
FROM best WHERE rn = 1
"""


@register(
    "entity_resolution_matches",
    sql=_ER_SQL,
    description="entity resolution: blocked fuzzy linkage of an in-plan-"
    "perturbed customer set (typo injected mid-name) back to the clean "
    "table — name-suffix blocking keeps pairs sub-quadratic, normalized "
    "Levenshtein scores candidates, max_by survivorship picks the best "
    "match per record; `correct` exposes the accuracy outcome ([EXT] "
    "CRM-consolidation tier; Christen 2012)",
)
def entity_resolution_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: pair cost = sum over blocks of |dirty_b|x|clean_b| (the
    # 3-digit-suffix key gives ~1000 blocks); similarity is JVM
    # levenshtein on blocked pairs only; survivorship is a max_by
    # partial agg, no ranking window. A hot block is an AQE/salting
    # case; production stacks multiple blocking passes and unions.
    from magshield_data_pipeline_spark.operators import linkage as L

    customer = read_table(spark, sf_dir, "customer")
    dname = F.concat(
        F.substring(F.col("c_name"), 1, 1), F.lit("x"),
        F.expr("substring(c_name, 3)"),
    )
    dirty = customer.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("id"), dname.alias("name")
    )
    clean = customer.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    # max_block_size exercises the fail-loud hot-block guard (size
    # rollup + filter on each side) at a cap far above the ~15-row
    # blocks the suffix key yields, so the result is unchanged; a
    # degenerate key would now raise instead of going quadratic
    pairs = L.link_candidates(
        dirty, clean,
        block_key=F.substring(F.col("name"), -3, 3),
        id_col="id", name_col="name", threshold=_ER_THRESHOLD,
        max_block_size=100_000,
    )
    out = L.best_match(pairs)
    return out.select(
        "dirty_id", "matched_id", "sim",
        (F.col("dirty_id") == F.col("matched_id")).alias("correct"),
    )


# ---------------------------------------------------------------------------
# exact half-life decay rollup (registered r6)

_HL_SQL = """
WITH weekly AS (
    SELECT event_type,
           CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_id,
           round(sum(value), 2) AS wsum,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
mx AS (SELECT max(week_id) AS wmax FROM weekly)
SELECT event_type,
       round(sum(round(
           wsum / (1::BIGINT << CAST(least(mx.wmax - week_id, 60) AS INT)),
           6)), 6) AS decayed_value,
       CAST(sum(n) AS BIGINT) AS n_events
FROM weekly CROSS JOIN mx
GROUP BY 1
"""


@register(
    "half_life_decay_rollup",
    sql=_HL_SQL,
    description="time-decayed feature rollup with a one-week half-life, "
    "kept ENGINE-EXACT by construction: weight 2^-age_weeks is a pure "
    "binary-exponent shift (wsum / (1 << k) — no libm pow, whose last "
    "ulp differs across engines), ages capped at 60 half-lives (weight "
    "< 1e-18, and the cap keeps the shift in-range identically on both "
    "sides); decay applied to the |types|x|weeks| weekly rollup, never "
    "to raw events ([EXT] feature-engineering tier)",
)
def half_life_decay_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one partial-agg shuffle to the weekly rollup; the anchor
    # (newest week) is a single-row aggregate broadcast-crossed in —
    # the same 1x1-row pattern as count_probe. Everything after the
    # rollup touches |types|x|weeks| rows.
    events = read_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 604800).cast("long").alias("week_id"),
    ).agg(
        F.round(F.sum("value"), 2).alias("wsum"),
        F.count(F.lit(1)).alias("n"),
    )
    mx = weekly.agg(F.max("week_id").alias("wmax"))
    k = F.least(F.col("wmax") - F.col("week_id"), F.lit(60))
    addend = F.round(
        F.col("wsum") / F.expr("shiftleft(1L, cast(_k as int))"), 6
    )
    return (
        weekly.crossJoin(F.broadcast(mx))
        .withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.sum(addend), 6).alias("decayed_value"),
            F.sum("n").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# group-leakage-safe holdout split (registered r6)

_GRP_TRAIN_HI = int(0.8 * 256)


_GRP_SPLIT_SQL = f"""
WITH e AS (
    SELECT user_id,
           CASE WHEN ({_hash_byte_sql("group", key="user_id")})
                     < {_GRP_TRAIN_HI}
                THEN 'train' ELSE 'test' END AS split
    FROM events
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1
"""


@register(
    "group_holdout_split",
    sql=_GRP_SPLIT_SQL,
    description="group-leakage-safe train/test split: assignment hashes "
    "the GROUP key (user), not the row, so every row of a user lands in "
    "one split — the guard against same-user train/test contamination "
    "that row-level splitting (train_test_split) cannot give; pure "
    "projection, no assignment join, survives corpus growth "
    "([EXT] training-data tier)",
)
def group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage safety is STRUCTURAL: the split is a function of user_id
    # alone (salted md5 byte), so no user can straddle splits whatever
    # the partitioning — n_users per split sums to the global distinct
    # count, checkable from this output directly.
    from magshield_data_pipeline_spark.operators import sampling as SA

    events = read_table(spark, sf_dir, "events")
    return (
        events.select(
            "user_id",
            SA.split_assign(
                F.col("user_id"), train_pct=0.8, val_pct=0.0, salt="group"
            ).alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# [EXT] unicode canonicalization for dedup keys (r8): NFC + accent fold

# Deliberate perturbation (the 0-rows-trivially-match rule): the fixture
# corpus is pure ASCII, where normalization is the identity and the
# check would have no teeth.  Each sampled doc is therefore expanded
# into TWO encodings of the same logical text — one with a decomposed
# "e" + U+0301 combining acute, one with precomposed U+00E9 — which MUST
# collapse to one fingerprint after NFC, while their raw fingerprints
# differ.  Accent folding then maps both onto the plain-ASCII key.
_UNI_EVERY = 5

_UNICODE_SQL = f"""
WITH sub AS (
    SELECT doc_id, text FROM documents WHERE doc_id % {_UNI_EVERY} = 0
),
variants AS (
    SELECT doc_id, text || ' caf' || 'e' || chr(769) AS v FROM sub
    UNION ALL
    SELECT doc_id, text || ' caf' || chr(233) AS v FROM sub
),
canon AS (
    SELECT doc_id, v, nfc_normalize(v) AS nfc,
           strip_accents(nfc_normalize(v)) AS stripped
    FROM variants
)
SELECT doc_id,
       CAST(count(DISTINCT md5(v)) AS BIGINT) AS n_raw_fps,
       CAST(count(DISTINCT md5(nfc)) AS BIGINT) AS n_nfc_fps,
       CAST(count(DISTINCT md5(stripped)) AS BIGINT) AS n_stripped_fps,
       min(md5(stripped)) AS stripped_fp,
       CAST(min(length(nfc)) AS BIGINT) AS nfc_len,
       CAST(max(length(v)) AS BIGINT) AS raw_len_max
FROM canon GROUP BY doc_id
"""


@register(
    "unicode_normalized_dedup",
    sql=_UNICODE_SQL,
    description="unicode canonicalization under the oracle: decomposed "
    "(e+U+0301) and precomposed (U+00E9) encodings of the same text "
    "collapse to ONE fingerprint after NFC (n_raw_fps=2 -> n_nfc_fps=1) "
    "and to the ASCII key after accent folding — the dup-leak every "
    "byte-keyed dedup has on raw web text; stdlib unicodedata in one "
    "Arrow mapInPandas projection vs DuckDB nfc_normalize/strip_accents "
    "([EXT] dedup tier)",
)
def unicode_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: variant fan-out is a projection (explode of a 2-element
    # array), canonicalization pipelines with the scan (mapInPandas,
    # no shuffle), one partial-agg rollup keyed doc_id. No pair joins.
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _UNI_EVERY == 0
    )
    variants = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.col("text"), F.lit(" cafe\u0301")),  # decomposed
                F.concat(F.col("text"), F.lit(" caf\u00e9")),  # precomposed
            )
        ).alias("v"),
    )
    canon = T.unicode_canonicalize(
        variants, text_col="v", nfc_col="nfc", stripped_col="stripped"
    )
    return canon.groupBy("doc_id").agg(
        F.count_distinct(F.md5("v")).alias("n_raw_fps"),
        F.count_distinct(F.md5("nfc")).alias("n_nfc_fps"),
        F.count_distinct(F.md5("stripped")).alias("n_stripped_fps"),
        F.min(F.md5("stripped")).alias("stripped_fp"),
        F.min(F.length("nfc")).alias("nfc_len"),
        F.max(F.length("v")).alias("raw_len_max"),
    )


# ---------------------------------------------------------------------------
# [EXT] Gopher-family quality rule set (r8): Rae et al. 2021 A1.1

# Deliberate perturbation, same teeth principle as the unicode query:
# the fixture corpus is single-line ASCII word soup on which the
# line/symbol rules could never fire.  Each doc is decorated into a
# 5-line document where residue classes of doc_id plant one violation
# each — %5 bullet lines, %7 an ellipsis line, %11 a symbol line,
# %13 a run of 1-char words — so every rule fires on a known subset and
# the oracle check proves the rule DECISIONS, not just the arithmetic.
_G_PAD = " a" * 60

_GOPHER_SQL = rf"""
WITH deco AS (
    SELECT doc_id,
        (CASE WHEN doc_id % 13 = 0 THEN text || '{_G_PAD}' ELSE text END)
        || chr(10) || (CASE WHEN doc_id % 5 = 0 THEN '- bullet one' ELSE 'body one' END)
        || chr(10) || (CASE WHEN doc_id % 5 = 0 THEN '* bullet two' ELSE 'body two' END)
        || chr(10) || (CASE WHEN doc_id % 7 = 0 THEN 'to be continued...' ELSE 'closing words' END)
        || chr(10) || (CASE WHEN doc_id % 11 = 0 THEN '## ## ## ## ## ## ## ##' ELSE 'final line' END)
        AS t
    FROM documents
),
m AS (
    SELECT doc_id, t,
        str_split(trim(regexp_replace(lower(t), '\s+', ' ', 'g')), ' ') AS words,
        trim(regexp_replace(lower(t), '\s+', ' ', 'g')) AS norm,
        str_split(t, chr(10)) AS lines
    FROM deco
),
m3 AS (
    SELECT doc_id,
        len(words) AS nw,
        length(replace(norm, ' ', '')) AS total_chars,
        length(norm) - length(replace(norm, '#', '')) AS hash_count,
        len(lines) AS n_lines,
        len(list_filter(lines, x -> x LIKE '- %' OR x LIKE '* %')) AS bullets,
        len(list_filter(lines, x -> x LIKE '%...')) AS ell_lines,
        len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
        (CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END) AS stop_hits
    FROM m
),
m4 AS (
    SELECT doc_id, nw, total_chars, hash_count, n_lines, bullets,
           ell_lines, alpha_words, stop_hits,
        NOT (nw BETWEEN 40 AND 100000) AS flag_word_count,
        NOT ((total_chars / nw) BETWEEN 3.0 AND 10.0) AS flag_mean_word_len,
        (hash_count / nw) >= 0.05 AS flag_symbol_ratio,
        (bullets / n_lines) >= 0.3 AS flag_bullet_lines,
        (ell_lines / n_lines) >= 0.2 AS flag_ellipsis_lines,
        (alpha_words / nw) < 0.9 AS flag_alpha_words,
        stop_hits < 2 AS flag_stopwords
    FROM m3
)
SELECT doc_id,
    CAST(nw AS BIGINT) AS n_words,
    round(total_chars / nw, 4) AS mean_word_len,
    round(hash_count / nw, 4) AS symbol_ratio,
    round(bullets / n_lines, 4) AS bullet_frac,
    round(ell_lines / n_lines, 4) AS ellipsis_frac,
    round(alpha_words / nw, 4) AS alpha_frac,
    CAST(stop_hits AS BIGINT) AS n_stop_hits,
    flag_word_count, flag_mean_word_len, flag_symbol_ratio,
    flag_bullet_lines, flag_ellipsis_lines, flag_alpha_words,
    flag_stopwords,
    NOT (flag_word_count OR flag_mean_word_len OR flag_symbol_ratio
         OR flag_bullet_lines OR flag_ellipsis_lines OR flag_alpha_words
         OR flag_stopwords) AS keep
FROM m4
"""


@register(
    "gopher_quality_flags",
    sql=_GOPHER_SQL,
    description="Gopher-family quality rule set (Rae et al. 2021 A1.1): "
    "word-count bounds, mean word length, symbol-to-word ratio, "
    "bullet/ellipsis line fractions, alpha-word fraction, stopword "
    "presence — one boolean per rule + final keep verdict per doc, all "
    "JVM-side expressions over one scan; inputs decorated so every rule "
    "fires on a known doc_id residue class ([EXT] curation tier)",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: pure projection (split/filter/rlike lambdas are all
    # whole-stage-codegen catalyst expressions) — no shuffle, no UDF;
    # the rule table is a constant, not a join.
    docs = read_table(spark, sf_dir, "documents")
    nl = F.lit("\n")
    deco = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.col("text"), F.lit(_G_PAD)),
            ).otherwise(F.col("text")),
            nl,
            F.when(F.col("doc_id") % 5 == 0, F.lit("- bullet one"))
            .otherwise(F.lit("body one")),
            nl,
            F.when(F.col("doc_id") % 5 == 0, F.lit("* bullet two"))
            .otherwise(F.lit("body two")),
            nl,
            F.when(F.col("doc_id") % 7 == 0, F.lit("to be continued..."))
            .otherwise(F.lit("closing words")),
            nl,
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit("## ## ## ## ## ## ## ##"),
            ).otherwise(F.lit("final line")),
        ).alias("t"),
    )
    return T.gopher_quality_flags(deco, text_col="t", id_col="doc_id")


# ---------------------------------------------------------------------------
# [EXT] r9 north star — the FULL modern curation composition as ONE plan:
# unicode NFC canonicalization → Gopher quality rules → LM-fluency gate
# → exact dedup → LSH near-dup dedup → temperature mixture → sequence
# packing.  Every stage already exists as an oracle-proven operator;
# this query is the integration a 100 TB training-data build actually
# runs, where persist lifetimes, exchange budgets and operator interface
# mismatches surface (VERDICT r8 item 1).
#
# Deliberate perturbation (the fixture is pure-ASCII, exact-dup-free,
# and perfectly source-balanced — three stages would otherwise be
# no-ops with no teeth):
#   - every doc gains a precomposed ' café' suffix; doc_id % 10 == 0
#     docs additionally fan out a clone (+100000) whose suffix is the
#     DECOMPOSED encoding — byte-distinct, NFC-identical, so exact
#     dedup catches it ONLY through the NFC stage;
#   - doc_id % 10 == 5 docs fan out a near-dup clone (+200000) that
#     appends the doc's own 40-char prefix — caught by the LSH stage,
#     not exact dedup;
#   - doc_id % 4 == 0 docs are re-sourced to one large 'src_big' pool,
#     skewing the otherwise-balanced mixture so the temperature stage
#     actually downsamples.
#
# Gate constants are SELF-NORMALIZING so the pipeline behaves at every
# SF: the fluency gate keeps docs whose per-gram quantized-log score is
# >= the corpus mean via the integer cross-multiplication
# lm_score * total_grams >= total_score * lm_grams — exact in both
# engines, no float threshold, no fixed constant that drifts with
# corpus size.  (At extreme corpus sizes the products approach int64
# range — a production build would compare as DECIMAL(38); at every
# tested SF they are < 2^42.)

_V2_BUDGET = 2048
_V2_NORM_T = r"trim(regexp_replace(lower(t), '\s+', ' ', 'g'))"
_V2_WORDS = f"str_split({_V2_NORM_T}, ' ')"
_V2_SHINGLES = (
    "CASE WHEN len(w) >= 3 "
    "THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)] "
    "ELSE [array_to_string(w, ' ')] END"
)
_V2_SIG = ", ".join(
    f"list_min([md5('{i}|' || s) for s in sh]) AS h{i}"
    for i in range(D.MINHASH_K)
)
_V2_BUCKETS = "\n    UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    f"md5(h{b * D.ROWS_PER_BAND} || h{b * D.ROWS_PER_BAND + 1}) AS bucket "
    "FROM sig"
    for b in range(D.MINHASH_BANDS)
)

_CURATION_V2_SQL = rf"""
WITH base AS (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN 'src_big' ELSE source END AS source,
           text
    FROM documents
),
variants AS (
    SELECT doc_id, source, text || ' caf' || chr(233) AS raw FROM base
    UNION ALL
    SELECT doc_id + 100000, source, text || ' caf' || 'e' || chr(769)
    FROM base WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 200000, source,
           text || ' caf' || chr(233) || ' ' || substr(text, 1, 40)
    FROM base WHERE doc_id % 10 = 5
),
canon AS (SELECT doc_id, source, nfc_normalize(raw) AS t FROM variants),
gm AS (
    SELECT doc_id, source, t,
        len({_V2_WORDS}) AS nw,
        length(replace({_V2_NORM_T}, ' ', '')) AS total_chars,
        length({_V2_NORM_T})
            - length(replace({_V2_NORM_T}, '#', '')) AS hash_count,
        len(str_split(t, chr(10))) AS n_lines,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '- %' OR x LIKE '* %')) AS bullets,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '%...')) AS ell_lines,
        len(list_filter({_V2_WORDS},
            x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
        (CASE WHEN list_contains({_V2_WORDS}, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'and') THEN 1 ELSE 0 END
        ) AS stop_hits
    FROM canon
),
gated AS (
    SELECT doc_id, source, t FROM gm
    WHERE (nw BETWEEN 40 AND 100000)
      AND ((total_chars / nw) BETWEEN 3.0 AND 10.0)
      AND (hash_count / nw) < 0.05
      AND (bullets / n_lines) < 0.3
      AND (ell_lines / n_lines) < 0.2
      AND (alpha_words / nw) >= 0.9
      AND stop_hits >= 2
),
grams AS (
    SELECT doc_id, substr(lower(t), CAST(i AS INT), 3) AS gram
    FROM gated, unnest(generate_series(1, length(t) - 2)) AS u(i)
),
model AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM grams GROUP BY 1),
scores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM grams g JOIN model m USING (gram)
    GROUP BY 1
),
tot AS (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM scores
),
fl AS (
    SELECT s.doc_id, g.source, g.t, s.lm_grams, s.lm_score
    FROM scores s JOIN gated g USING (doc_id), tot
    WHERE s.lm_score * tot.tg >= tot.ts * s.lm_grams
),
fps AS (SELECT *, md5({_V2_NORM_T}) AS fp FROM fl),
ex AS (
    SELECT doc_id, source, t, lm_grams, lm_score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fps
    ) WHERE rn = 1
),
shw AS (SELECT doc_id, {_V2_WORDS} AS w FROM ex),
shg AS (SELECT doc_id, {_V2_SHINGLES} AS sh FROM shw),
sig AS (SELECT doc_id, {_V2_SIG} FROM shg),
buckets AS ({_V2_BUCKETS}),
losers AS (
    SELECT DISTINCT b.doc_id FROM buckets a
    JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.doc_id < b.doc_id
),
nd AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
cnts AS (SELECT source, count(*) AS n_source FROM nd GROUP BY 1),
thr AS (
    SELECT source,
           CAST(floor(sqrt(CAST((SELECT min(n_source) FROM cnts) AS DOUBLE)
                           / CAST(n_source AS DOUBLE)) * 256) AS BIGINT)
               AS keep_threshold
    FROM cnts
),
mixed AS (
    SELECT nd.doc_id, nd.source, nd.lm_grams, nd.lm_score,
           len(regexp_split_to_array(trim(nd.t), '\s+')) AS n_tokens
    FROM nd JOIN thr USING (source)
    WHERE ({_hash_byte_sql("mix")}) < thr.keep_threshold
),
o AS (
    SELECT doc_id, source, lm_grams, lm_score, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
           ) - n_tokens AS BIGINT) AS start_off
    FROM mixed
)
SELECT doc_id, source, lm_grams, lm_score,
       CAST(n_tokens AS BIGINT) AS n_tokens, start_off,
       CAST(start_off // {_V2_BUDGET} AS BIGINT) AS bin_id
FROM o
"""


@register(
    "curation_pipeline_v2",
    sql=_CURATION_V2_SQL,
    description="the FULL modern curation composition as ONE plan: "
    "unicode NFC canonicalization (Arrow mapInPandas, pipelined with "
    "the scan) -> Gopher quality rules (pure projection) -> corpus-"
    "mean LM-fluency gate (integer cross-multiply, self-normalizing "
    "across SFs) -> exact NFC-keyed dedup (min-struct partial agg) -> "
    "LSH near-dup greedy drop (banded bucket join, never all-pairs) "
    "-> temperature (alpha=0.5) source mixture (tiny rollup broadcast "
    "back) -> per-source sequence packing (windowed running offsets). "
    "Inputs perturbed so every stage provably removes rows: NFC-"
    "identical byte-distinct clones, 5-word-tail near-dup clones, one "
    "deliberately oversized source ([EXT] north-star composition, "
    "VERDICT r8 item 1)",
)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exchange budget of the whole chain (audited in COVERAGE.md and
    # pinned by tests/test_plan_shapes.py): data-proportional shuffles
    # ONLY at (1) the LM model rollup + per-doc score agg, (2) the
    # exact-dedup fingerprint agg, (3) the LSH signature agg + bucket
    # self-join, (4) the packing window — exactly the stages whose
    # semantics require co-location.  The gates (Gopher, fluency
    # threshold, mixture) are projections or broadcast joins; the NFC
    # canonicalization rides the scan stage inside one mapInPandas.
    #
    # Persist lifecycle: four frames (gated, scores, survivors, nd)
    # each feed 2-3 downstream subtrees, so they are persisted;
    # lifetime is caller-owned by this repo's documented convention
    # (CacheManager dedups the plan across repeated runs; release via
    # spark.catalog.clearCache() — same contract as near_dup_clusters).
    # Without the scores persist, the gram explode + per-doc rollup —
    # the chain's most expensive aggregate — would evaluate once for
    # the totals frame and once for the gate join.
    from pyspark.sql import Window

    from magshield_data_pipeline_spark.operators import lm as L

    docs = read_table_spread(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.lit("src_big"))
        .otherwise(F.col("source"))
        .alias("source"),
        "text",
    )
    # variant fan-out as ONE conditional array explode — a projection,
    # not a 3-way union of scans (one pass over the corpus)
    variant_structs = F.array(
        F.struct(
            F.col("doc_id").alias("doc_id"),
            F.concat("text", F.lit(" caf\u00e9")).alias("raw"),  # precomposed
        ),
        F.struct(
            (F.col("doc_id") + 100000).alias("doc_id"),
            # DECOMPOSED e + U+0301: byte-distinct, NFC-identical
            F.concat("text", F.lit(" cafe\u0301")).alias("raw"),
        ),
        F.struct(
            (F.col("doc_id") + 200000).alias("doc_id"),
            # near-dup tail = the doc's OWN 40-char prefix: grams are
            # corpus-typical so the clone's fluency tracks its base's
            # (a rare-word tail would sink every clone at the LM gate
            # before LSH ever saw it), yet the shingle set shifts
            # enough that only MinHash — not the exact key — pairs it
            F.concat(
                "text", F.lit(" caf\u00e9 "), F.substring("text", 1, 40)
            ).alias("raw"),
        ),
    )
    wanted = (
        F.lit(True),
        F.col("doc_id") % 10 == 0,
        F.col("doc_id") % 10 == 5,
    )
    variants = (
        base.select(
            "source",
            F.explode(
                F.filter(
                    F.zip_with(
                        variant_structs,
                        F.array(*wanted),
                        lambda v, keep: F.struct(
                            v.alias("v"), keep.alias("keep")
                        ),
                    ),
                    lambda x: x["keep"],
                )
            ).alias("e"),
        )
        .select(F.col("e.v.doc_id").alias("doc_id"), "source",
                F.col("e.v.raw").alias("raw"))
    )
    canon = T.unicode_canonicalize(
        variants, text_col="raw", nfc_col="t", stripped_col=None
    )
    gq = T.gopher_quality_flags(
        canon, text_col="t", id_col="doc_id", keep_cols=("source", "t")
    )
    gated = gq.filter("keep").select("doc_id", "source", "t").persist()

    model = L.train_ngram_counts(gated, "t", n=3)
    scores = L.fluency_score(gated, model, "t", "doc_id", n=3).persist()
    tot = scores.agg(
        F.sum("lm_score").alias("ts"), F.sum("lm_grams").alias("tg")
    )
    fl = (
        scores.join(gated, "doc_id")
        .crossJoin(F.broadcast(tot))  # 1-row totals frame
        .filter(
            F.col("lm_score") * F.col("tg") >= F.col("ts") * F.col("lm_grams")
        )
        .select("doc_id", "source", "t", "lm_grams", "lm_score")
    )
    survivors = (
        D.exact_dedup(fl, text_col="t", id_col="doc_id")
        .select("doc_id", "source", "t", "lm_grams", "lm_score")
        .persist()
    )
    buckets = D.lsh_band_buckets(survivors, text_col="t", id_col="doc_id")
    losers = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    nd = survivors.join(losers, "doc_id", "left_anti").persist()

    counts = nd.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    rates = counts.withColumn(
        "n_min", F.min("n_source").over(Window.partitionBy())
    ).select(
        "source",
        SA.temperature_threshold(F.col("n_source"), F.col("n_min")).alias(
            "keep_threshold"
        ),
    )
    mixed = (
        nd.join(F.broadcast(rates), "source")
        .filter(
            SA.mixture_keep(
                F.col("doc_id"), F.col("keep_threshold"), salt="mix"
            )
        )
        .select(
            "doc_id",
            "source",
            "lm_grams",
            "lm_score",
            T.token_count("t").alias("n_tokens"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = mixed.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return o.select(
        "doc_id",
        "source",
        "lm_grams",
        "lm_score",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("start_off").cast("long").alias("start_off"),
        F.floor(F.col("start_off") / _V2_BUDGET).alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# [EXT] Misra-Gries heavy hitters (r9): the bounded-memory frequent-
# items classic, completing the sketch tier (CMS/KMV/HLL/GK).
#
# Deliberate perturbation (teeth): the fixture vocabulary is 31
# near-uniform words, so at any useful k either everything or nothing
# is heavy.  Word rows of doc_id % 5 residues 0 and 1 are therefore
# re-keyed to two planted hot tokens (~20% of mass each); the
# remaining 31 words carry ~1.9% each — so at k=16 (threshold 6.25%)
# the true heavy-hitter set is EXACTLY the two planted tokens, and the
# MG summaries (16 counters over 33 live keys per partition) must keep
# them through the decrement churn for the hash to match.

_MG_K = 16

_MG_SQL = f"""
WITH w AS (
    SELECT doc_id, unnest({{words}}) AS word FROM documents
),
keyed AS (
    SELECT CASE WHEN doc_id % 5 = 0 THEN 'hot_token'
                WHEN doc_id % 5 = 1 THEN 'warm_token'
                ELSE word END AS key
    FROM w
),
tot AS (SELECT count(*) AS n FROM keyed)
SELECT key, CAST(count(*) AS BIGINT) AS n_occurrences
FROM keyed, tot
GROUP BY key, tot.n
HAVING count(*) * {_MG_K} > tot.n
"""


def _mg_sql() -> str:
    from magshield_data_pipeline_spark.plans import ext_queries as X

    return _MG_SQL.format(words=X._WORDS)


@register(
    "heavy_hitters_mg",
    sql=_mg_sql(),
    description=f"Misra-Gries heavy hitters (k={_MG_K}, Misra & Gries "
    "1982): per-partition bounded summaries (16 counters per task "
    "regardless of key cardinality — the memory bound an exact groupBy "
    "cannot give) generate a candidate superset, then ONE exact "
    "counting pass over the broadcast candidates verifies; output = "
    f"keys with frequency * {_MG_K} > total.  Two hot tokens planted "
    "on doc_id%5 residues make the true set exactly 2 rows among 33 "
    "live keys, so the summaries' decrement churn is load-bearing for "
    "the hash ([EXT] sketch tier, beside CMS/KMV/HLL/GK)",
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: genuinely TWO passes — pass 1 is shuffle-free (mapInPandas
    # summaries, <= k+1 rows per task, carrying the per-partition
    # totals the threshold needs); pass 2 broadcasts the tiny candidate
    # set and exact-counts ONLY those keys (semi-join pruned before the
    # partial agg).  The summaries frame is persisted (tiny) because
    # the candidate set and the global N both read it; caller-owned
    # lifetime per the repo convention.
    from magshield_data_pipeline_spark.operators import sketches as SK

    docs = read_table_spread(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(T.normalize_text(F.col("text")), " ")).alias(
            "word"
        ),
    )
    keyed = words.select(
        F.when(F.col("doc_id") % 5 == 0, F.lit("hot_token"))
        .when(F.col("doc_id") % 5 == 1, F.lit("warm_token"))
        .otherwise(F.col("word"))
        .alias("key")
    )
    summaries = SK.misra_gries_candidates(
        keyed, "key", k=_MG_K, emit_partition_totals=True
    ).persist()
    candidates = (
        summaries.filter(F.col("key").isNotNull()).select("key").distinct()
    )
    tot = (
        summaries.filter(F.col("key").isNull())
        .agg(F.sum("mg_count").alias("n"))
    )
    exact = (
        keyed.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(tot))  # 1-row total
        .filter(F.col("n_occurrences") * _MG_K > F.col("n"))
    )
    return exact.select("key", "n_occurrences")


# ---------------------------------------------------------------------------
# [EXT] incremental curation over the snapshot ledger (r10 — VERDICT r9
# item 1, the round's north star): curate ONLY the delta, never
# re-curate the corpus.  The raw corpus is a snapshot-versioned table
# (sources/snapshots.py); epoch 1 appends a delta; the epoch plan is
#
#   read_changes CDC  ->  NFC canonicalization  ->  Gopher gate
#   ->  LM fluency gate against the MATERIALIZED corpus model/totals
#   ->  exact dedup vs the MATERIALIZED corpus fingerprint index
#       (+ intra-batch min-struct)
#   ->  LSH near-dup vs the MATERIALIZED corpus bucket index
#       (+ intra-batch collisions)
#   ->  exactly-once append of the curated delta to the curated table
#       (append_stream_batch, idempotent per epoch)
#
# Every corpus-derived artifact (fp index, LSH buckets, trigram model,
# fluency totals) is written ONCE at build time; the per-epoch plan
# scans only the delta files plus those narrow indexes — cost
# proportional to the CHANGE, plan-pinned by tests/test_plan_shapes.py
# (the production shape replacing the reference's full re-extract per
# HTTP trigger, callable.py:118-156).
#
# Deliberate perturbation (teeth), one variant class per stage, each
# visible in the output FUNNEL (stage, n_docs, id_sum):
#   +1M fresh        (%5 in 2,3,4): word-order-REVERSED text — new
#                    fingerprint, new shingle set; subject to the gates
#   +2M exact clone  (%5=0): corpus text verbatim — killed ONLY by the
#                    fingerprint anti-join vs the materialized index
#   +3M/+4M NFC pair (%5=1): reversed text + precomposed vs DECOMPOSED
#                    'café' — byte-distinct, NFC-identical; without NFC
#                    the pair survives exact dedup and dies at LSH
#                    instead, shifting the exact_unique funnel row
#   +5M near-dup     (%5=2): corpus text + its own 40-char prefix —
#                    survives every exact stage, killed ONLY by the
#                    corpus LSH bucket probe
#   +6M intra clone  (%5=3): byte-identical twin of that doc's +1M
#                    fresh variant — killed by the intra-batch
#                    min-struct (lowest id wins)

_INC_NORM_TEXT = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_INC_REV = "array_to_string(list_reverse(str_split(text, ' ')), ' ')"


def _inc_lsh_ctes(prefix: str, src: str, text_expr: str) -> str:
    """CTE chain computing MinHash-LSH band buckets for *src* rows —
    the SQL twin of operators/dedup.py::lsh_band_buckets, emitted
    twice (corpus + batch) with distinct CTE names."""
    norm = rf"trim(regexp_replace(lower({text_expr}), '\s+', ' ', 'g'))"
    sig = ", ".join(
        f"list_min([md5('{i}|' || s) for s in sh]) AS h{i}"
        for i in range(D.MINHASH_K)
    )
    bands = "\n    UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(h{b * D.ROWS_PER_BAND} || h{b * D.ROWS_PER_BAND + 1}) "
        f"AS bucket FROM {prefix}_sig"
        for b in range(D.MINHASH_BANDS)
    )
    return f"""{prefix}_w AS (
    SELECT doc_id, str_split({norm}, ' ') AS w FROM {src}
),
{prefix}_sh AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 3
                THEN [array_to_string(w[i:i+2], ' ')
                      for i in range(1, len(w) - 1)]
                ELSE [array_to_string(w, ' ')] END AS sh
    FROM {prefix}_w
),
{prefix}_sig AS MATERIALIZED (SELECT doc_id, {sig} FROM {prefix}_sh),
{prefix}_buckets AS MATERIALIZED ({bands})"""


_INC_SQL = rf"""
WITH corpus AS (SELECT doc_id, text FROM documents),
delta AS (
    SELECT doc_id + 1000000 AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 IN (2, 3, 4)
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 3000000, {_INC_REV} || ' caf' || chr(233)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 4000000, {_INC_REV} || ' caf' || 'e' || chr(769)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 5000000, text || ' ' || substr(text, 1, 40)
    FROM documents WHERE doc_id % 5 = 2
    UNION ALL
    SELECT doc_id + 6000000, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 3
),
canon AS (SELECT doc_id, nfc_normalize(text) AS t FROM delta),
gm AS (
    SELECT doc_id, t,
        len({_V2_WORDS}) AS nw,
        length(replace({_V2_NORM_T}, ' ', '')) AS total_chars,
        length({_V2_NORM_T})
            - length(replace({_V2_NORM_T}, '#', '')) AS hash_count,
        len(str_split(t, chr(10))) AS n_lines,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '- %' OR x LIKE '* %')) AS bullets,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '%...')) AS ell_lines,
        len(list_filter({_V2_WORDS},
            x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
        (CASE WHEN list_contains({_V2_WORDS}, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'and') THEN 1 ELSE 0 END
        ) AS stop_hits
    FROM canon
),
gated AS (
    SELECT doc_id, t FROM gm
    WHERE (nw BETWEEN 40 AND 100000)
      AND ((total_chars / nw) BETWEEN 3.0 AND 10.0)
      AND (hash_count / nw) < 0.05
      AND (bullets / n_lines) < 0.3
      AND (ell_lines / n_lines) < 0.2
      AND (alpha_words / nw) >= 0.9
      AND stop_hits >= 2
),
cgrams AS (
    SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS gram
    FROM corpus, unnest(generate_series(1, length(text) - 2)) AS u(i)
),
model AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM cgrams GROUP BY 1),
cscores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM cgrams g JOIN model m USING (gram)
    GROUP BY 1
),
ctot AS MATERIALIZED (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM cscores
),
dgrams AS (
    SELECT doc_id, substr(lower(t), CAST(i AS INT), 3) AS gram
    FROM gated, unnest(generate_series(1, length(t) - 2)) AS u(i)
),
dscores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM dgrams g LEFT JOIN model m USING (gram)
    GROUP BY 1
),
fluent AS (
    SELECT g.doc_id, g.t
    FROM gated g JOIN dscores s USING (doc_id), ctot
    WHERE s.lm_score * ctot.tg >= ctot.ts * s.lm_grams
),
cfp AS (SELECT DISTINCT md5({_INC_NORM_TEXT}) AS fp FROM corpus),
bfp AS (SELECT doc_id, t, md5({_V2_NORM_T}) AS fp FROM fluent),
fresh AS (SELECT * FROM bfp WHERE fp NOT IN (SELECT fp FROM cfp)),
uniq AS (
    SELECT doc_id, t FROM (
        SELECT *, row_number() OVER (
            PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fresh
    ) WHERE rn = 1
),
{_inc_lsh_ctes("cb", "corpus", "text")},
{_inc_lsh_ctes("bb", "uniq", "t")},
vs_corpus AS (
    SELECT DISTINCT b.doc_id FROM bb_buckets b
    JOIN cb_buckets c ON b.band = c.band AND b.bucket = c.bucket
),
intra AS (
    SELECT DISTINCT y.doc_id FROM bb_buckets x
    JOIN bb_buckets y ON x.band = y.band AND x.bucket = y.bucket
                     AND x.doc_id < y.doc_id
),
novel AS (
    SELECT doc_id FROM uniq
    WHERE doc_id NOT IN (SELECT doc_id FROM vs_corpus
                         UNION SELECT doc_id FROM intra)
)
SELECT 'delta_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum FROM delta
UNION ALL
SELECT 'gated', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM gated
UNION ALL
SELECT 'fluent', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM fluent
UNION ALL
SELECT 'exact_unique', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM uniq
UNION ALL
SELECT 'novel', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM novel
UNION ALL
SELECT 'curated_total',
       CAST((SELECT count(*) FROM corpus)
            + (SELECT count(*) FROM novel) AS BIGINT),
       CAST((SELECT sum(doc_id) FROM corpus)
            + (SELECT sum(doc_id) FROM novel) AS BIGINT)
"""


def _inc_cur_paths(sf_dir: str) -> dict[str, str]:
    import os

    from magshield_data_pipeline_spark.sources.scratch import scratch_path

    root = scratch_path(
        "inc_cur", sf_dir,
        "raw=v1(corpus 2f)+v2(delta 2f: rev%5in234+1M clone%5=0+2M "
        "nfcpair%5=1+3M/+4M neardup%5=2+5M intraclone%5=3+6M) "
        "idx=fp,lsh,model3,stats curated=v1(corpus ids) v1",
    )
    return {
        "root": root,
        "raw": os.path.join(root, "raw"),
        "fp_idx": os.path.join(root, "fp_idx"),
        "lsh_idx": os.path.join(root, "lsh_idx"),
        "model": os.path.join(root, "model"),
        "stats": os.path.join(root, "stats"),
        "curated": os.path.join(root, "curated"),
    }


def inc_cur_epoch_frames(spark: SparkSession, sf_dir: str) -> dict:
    """Build (write-once) the raw snapshot table + corpus indexes, run
    the per-epoch curation chain over the CDC delta, and return every
    stage frame — shared by the registered query, the plan pin, and
    the stage-teeth tests."""
    import os

    from magshield_data_pipeline_spark.operators import lm as L
    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import ensure_scratch

    p = _inc_cur_paths(sf_dir)
    rev = F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")

    def _build(tmp: str) -> None:
        os.makedirs(tmp)
        corpus = read_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        m5 = F.col("doc_id") % 5

        def var(offset: int, cond, text_col):
            return corpus.filter(cond).select(
                (F.col("doc_id") + offset).alias("doc_id"),
                text_col.alias("text"),
            )

        delta = (
            var(1_000_000, m5.isin(2, 3, 4), rev)
            .unionByName(var(2_000_000, m5 == 0, F.col("text")))
            .unionByName(
                var(3_000_000, m5 == 1,
                    F.concat(rev, F.lit(" caf\u00e9")))  # precomposed
            )
            .unionByName(
                var(4_000_000, m5 == 1,
                    # DECOMPOSED e + U+0301: byte-distinct, NFC-equal
                    F.concat(rev, F.lit(" cafe\u0301")))
            )
            .unionByName(
                var(5_000_000, m5 == 2,
                    F.concat(F.col("text"), F.lit(" "),
                             F.substring("text", 1, 40)))
            )
            .unionByName(var(6_000_000, m5 == 3, rev))
        )
        raw = os.path.join(tmp, "raw")
        SN.overwrite(corpus, raw, n_files=2)
        SN.append(delta, raw, n_files=2)
        corpus.select(T.fingerprint("text").alias("fp")).distinct() \
            .write.parquet(os.path.join(tmp, "fp_idx"))
        D.lsh_band_buckets(corpus).select(
            "band", "bucket", F.col("doc_id").alias("corpus_doc")
        ).write.parquet(os.path.join(tmp, "lsh_idx"))
        model = L.train_ngram_counts(corpus, "text", n=3)
        model.write.parquet(os.path.join(tmp, "model"))
        cscores = L.fluency_score(
            corpus, spark.read.parquet(os.path.join(tmp, "model")),
            "text", "doc_id", n=3,
        )
        cscores.agg(
            F.sum("lm_score").alias("ts"), F.sum("lm_grams").alias("tg")
        ).write.parquet(os.path.join(tmp, "stats"))
        SN.overwrite(
            corpus.select("doc_id"), os.path.join(tmp, "curated"),
            n_files=1,
        )

    ensure_scratch(p["root"], _build)
    # ---- the per-epoch plan: everything below scans ONLY the delta
    # files (read_changes) and the narrow materialized indexes
    delta = SN.read_changes(spark, p["raw"], 1, 2)
    frames = curate_epoch(
        spark, delta,
        fp_idx=spark.read.parquet(p["fp_idx"]),
        corpus_buckets=spark.read.parquet(p["lsh_idx"]),
        model_df=spark.read.parquet(p["model"]),
        stats_df=spark.read.parquet(p["stats"]),
        delta_files=SN.changed_file_count(p["raw"], 1, 2),
        delta_bytes=SN.changed_bytes(p["raw"], 1, 2),
    )
    frames["paths"] = p
    return frames


def curate_epoch(spark: SparkSession, delta: DataFrame, *,
                 fp_idx: DataFrame, corpus_buckets: DataFrame,
                 model_df: DataFrame, stats_df: DataFrame,
                 delta_files: int | None = None,
                 delta_bytes: int | None = None) -> dict:
    """ONE curation epoch over a CDC *delta*, probing materialized
    indexes: NFC -> Gopher gate -> LM fluency gate (corpus model +
    1-row totals) -> exact dedup vs *fp_idx* (+ intra-batch) -> LSH
    near-dup vs *corpus_buckets* (+ intra-batch).  Shared by the
    epoch-1 query (static parquet indexes) and the epoch-2 query
    (SNAPSHOT-TABLE indexes that evolve per epoch) — the same plan
    probes whatever index version the caller resolves."""
    from magshield_data_pipeline_spark.operators import lm as L
    from magshield_data_pipeline_spark.session import conf_bytes

    # conditional spread (read_table_spread's rule): the fixture delta
    # lands as 2 files -> 2 scan splits, which would serialize the NFC
    # mapInPandas + gram explode on 2 of 32 cores (measured 7.2 ->
    # ~4-5 s median at sf0.1; the residue is Python-worker warmup on
    # the first mapInPandas pass plus the persist materializations);
    # a real epoch has many files and this is a no-op.  Callers that
    # know the delta's manifest file count pass it (r12: deciding from
    # metadata skips a per-invocation plan-analysis probe, guide §8).
    # *delta_bytes* covers the packing caveat (ADVICE r12): k files
    # only yield ~k splits when they are not bin-packed together, so a
    # byte volume under target × maxPartitionBytes also spreads.
    target = min(spark.sparkContext.defaultParallelism, 16)
    n_splits = (delta_files if delta_files is not None
                else delta.rdd.getNumPartitions())
    narrow = n_splits < target
    if not narrow and delta_bytes is not None:
        narrow = delta_bytes < target * conf_bytes(
            spark, "spark.sql.files.maxPartitionBytes", "128m"
        )
    if narrow:
        delta = delta.repartition(target)
    canon = T.unicode_canonicalize(
        delta, text_col="text", nfc_col="t", stripped_col=None
    )
    gq = T.gopher_quality_flags(
        canon, text_col="t", id_col="doc_id", keep_cols=("t",)
    )
    gated = gq.filter("keep").select("doc_id", "t").persist()
    scores = L.fluency_score(gated, model_df, "t", "doc_id", n=3)
    fluent = (
        scores.join(gated, "doc_id")
        .crossJoin(F.broadcast(stats_df))  # 1-row corpus totals
        .filter(
            F.col("lm_score") * F.col("tg")
            >= F.col("ts") * F.col("lm_grams")
        )
        .select("doc_id", "t")
        .persist()
    )
    uniq = D.incremental_exact_dedup_indexed(
        fp_idx, fluent, text_col="t", id_col="doc_id", keep=("t",),
    ).persist()
    bb = D.lsh_band_buckets(uniq, text_col="t", id_col="doc_id").persist()
    vs_corpus = bb.join(
        corpus_buckets.select("band", "bucket"), ["band", "bucket"]
    ).select("doc_id")
    intra = (
        bb.alias("a")
        .join(
            bb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
    )
    losers = vs_corpus.unionByName(intra).distinct()
    novel = uniq.join(losers, "doc_id", "left_anti").persist()
    return {
        "delta": delta,
        "gated": gated,
        "fluent": fluent,
        "uniq": uniq,
        "novel": novel,
    }


@register(
    "incremental_curation_epoch",
    sql=_INC_SQL,
    description="incremental curation over the snapshot ledger "
    "(VERDICT r9 item 1 — the production shape of a growing corpus): "
    "read_changes CDC delta -> NFC -> Gopher gate -> LM fluency gate "
    "against the MATERIALIZED corpus model + totals -> exact dedup vs "
    "the MATERIALIZED corpus fingerprint index -> LSH near-dup vs the "
    "MATERIALIZED corpus bucket index -> exactly-once append of the "
    "curated delta (append_stream_batch, replay no-op); output is the "
    "stage funnel (count + id checksum per stage), so every stage and "
    "the ledger commit itself are hash-load-bearing; per-epoch cost "
    "proportional to the DELTA, plan-pinned by tests/test_plan_shapes "
    ".py (replaces the reference's full re-extract per trigger, "
    "callable.py:118-156)",
)
def incremental_curation_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the epoch plan's only inputs are the delta files (CDC) and
    # four narrow corpus-derived indexes (fp, buckets, trigram model,
    # 1-row totals) — the corpus TEXT is never re-read, re-shingled or
    # re-scored per epoch; at 100 TB each epoch costs O(delta) plus
    # index-probe shuffles.  The curated append is idempotent per epoch
    # (exactly-once under driver/bench re-runs — a replay that
    # double-committed would shift the curated_total funnel row and
    # fail the hash).
    from magshield_data_pipeline_spark.sources import snapshots as SN

    fr = inc_cur_epoch_frames(spark, sf_dir)
    SN.append_stream_batch(
        fr["novel"].select("doc_id"), fr["paths"]["curated"],
        batch_id=1, n_files=1,
    )
    curated_now = SN.read(spark, fr["paths"]["curated"])

    def row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )

    out = (
        row("delta_raw", fr["delta"])
        .unionByName(row("gated", fr["gated"]))
        .unionByName(row("fluent", fr["fluent"]))
        .unionByName(row("exact_unique", fr["uniq"]))
        .unionByName(row("novel", fr["novel"]))
        .unionByName(row("curated_total", curated_now))
    )
    return out.select(
        "stage", "n_docs", F.col("id_sum").cast("long").alias("id_sum")
    )


# ---------------------------------------------------------------------------
# [EXT] epoch 2 — the loop CLOSES (r10): the dedup indexes themselves
# are snapshot tables that EVOLVE per epoch.  The build commits epoch 1
# once (write-once scratch): its novel docs' fingerprints and LSH
# buckets are APPENDED to the index tables (exactly-once per-epoch
# commits), so the registered query is the steady-state production
# shape — curate epoch 2's CDC delta against the EVOLVED index, never
# against a recomputation of anything older.
#
# Deliberate perturbation (teeth): epoch-2 variants target docs that
# exist ONLY in the evolved index (epoch 1's novel output, absent from
# the original corpus), so the kill can only come from index evolution:
#   +10M fresh2      (%5=0): reversed text — never produced before
#                    (epoch 1 reversed residues 1-4 only); flows through
#   +11M evolved-LSH (%5=1): plain reversed text — near-dup of epoch
#                    1's +3M novel doc (reversed + ' café'), which is
#                    NOT in the corpus index; killed ONLY by the
#                    bucket rows epoch 1 appended
#   +12M evolved-fp  (%5=2): byte-exact copy of epoch 1's +1M novel
#                    text; killed ONLY by the fingerprint rows epoch 1
#                    appended

_INC2_OFF = {"fresh2": 10_000_000, "lsh2": 11_000_000, "fp2": 12_000_000}


def _inc2_paths(sf_dir: str) -> dict[str, str]:
    import os

    from magshield_data_pipeline_spark.sources.scratch import scratch_path

    root = scratch_path(
        "inc_cur2", sf_dir,
        "raw=v1(corpus)+v2(delta1 as inc_cur)+v3(delta2 rev%5=0+10M "
        "rev%5=1+11M rev%5=2clone+12M) idx tables fp(fp,doc_id),lsh "
        "evolve by epoch-1 append; curated v1+e1 v1",
    )
    return {
        "root": root,
        "raw": os.path.join(root, "raw"),
        "fp_tbl": os.path.join(root, "fp_tbl"),
        "lsh_tbl": os.path.join(root, "lsh_tbl"),
        "model": os.path.join(root, "model"),
        "stats": os.path.join(root, "stats"),
        "curated": os.path.join(root, "curated"),
    }


def inc_cur2_epoch_frames(spark: SparkSession, sf_dir: str) -> dict:
    """Build (write-once) the 3-version raw table, the SNAPSHOT-TABLE
    indexes, and epoch 1's committed evolution; then run the epoch-2
    curation chain against the EVOLVED index versions and return every
    stage frame."""
    import os

    from magshield_data_pipeline_spark.operators import lm as L
    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import ensure_scratch

    p = _inc2_paths(sf_dir)
    rev = F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")

    def _build(tmp: str) -> None:
        os.makedirs(tmp)
        corpus = read_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        m5 = F.col("doc_id") % 5

        def var(offset: int, cond, text_col):
            return corpus.filter(cond).select(
                (F.col("doc_id") + offset).alias("doc_id"),
                text_col.alias("text"),
            )

        delta1 = (
            var(1_000_000, m5.isin(2, 3, 4), rev)
            .unionByName(var(2_000_000, m5 == 0, F.col("text")))
            .unionByName(
                var(3_000_000, m5 == 1,
                    F.concat(rev, F.lit(" café")))  # precomposed
            )
            .unionByName(
                var(4_000_000, m5 == 1,
                    # DECOMPOSED e + U+0301: byte-distinct, NFC-equal
                    F.concat(rev, F.lit(" café")))
            )
            .unionByName(
                var(5_000_000, m5 == 2,
                    F.concat(F.col("text"), F.lit(" "),
                             F.substring("text", 1, 40)))
            )
            .unionByName(var(6_000_000, m5 == 3, rev))
        )
        delta2 = (
            var(_INC2_OFF["fresh2"], m5 == 0, rev)
            .unionByName(var(_INC2_OFF["lsh2"], m5 == 1, rev))
            # byte-exact copy of epoch 1's +1M novel text for %5=2 docs
            .unionByName(var(_INC2_OFF["fp2"], m5 == 2, rev))
        )
        raw = os.path.join(tmp, "raw")
        SN.overwrite(corpus, raw, n_files=2)
        SN.append(delta1, raw, n_files=2)
        SN.append(delta2, raw, n_files=2)
        # indexes as SNAPSHOT TABLES: v1 = the corpus index
        SN.overwrite(
            corpus.groupBy(T.fingerprint("text").alias("fp"))
            .agg(F.min("doc_id").alias("doc_id")),
            os.path.join(tmp, "fp_tbl"), n_files=1,
        )
        SN.overwrite(
            D.lsh_band_buckets(corpus).select(
                "band", "bucket", F.col("doc_id").alias("corpus_doc")
            ),
            os.path.join(tmp, "lsh_tbl"), n_files=1,
        )
        model = L.train_ngram_counts(corpus, "text", n=3)
        model.write.parquet(os.path.join(tmp, "model"))
        cscores = L.fluency_score(
            corpus, spark.read.parquet(os.path.join(tmp, "model")),
            "text", "doc_id", n=3,
        )
        cscores.agg(
            F.sum("lm_score").alias("ts"), F.sum("lm_grams").alias("tg")
        ).write.parquet(os.path.join(tmp, "stats"))
        SN.overwrite(
            corpus.select("doc_id"), os.path.join(tmp, "curated"),
            n_files=1,
        )
        # ---- EPOCH 1, committed once at build: curate delta1 against
        # the v1 indexes, then EVOLVE — append the novel docs' ids,
        # fingerprints and buckets as exactly-once epoch commits
        e1 = curate_epoch(
            spark, SN.read_changes(spark, raw, 1, 2),
            fp_idx=SN.read(spark, os.path.join(tmp, "fp_tbl"), 1),
            corpus_buckets=SN.read(spark, os.path.join(tmp, "lsh_tbl"), 1),
            model_df=spark.read.parquet(os.path.join(tmp, "model")),
            stats_df=spark.read.parquet(os.path.join(tmp, "stats")),
        )
        novel1 = e1["novel"]
        SN.append_stream_batch(
            novel1.select("doc_id"), os.path.join(tmp, "curated"),
            batch_id=1, n_files=1,
        )
        SN.append_stream_batch(
            novel1.select(T.fingerprint("t").alias("fp"), "doc_id"),
            os.path.join(tmp, "fp_tbl"), batch_id=1, n_files=1,
        )
        SN.append_stream_batch(
            D.lsh_band_buckets(novel1, text_col="t", id_col="doc_id")
            .select("band", "bucket", F.col("doc_id").alias("corpus_doc")),
            os.path.join(tmp, "lsh_tbl"), batch_id=1, n_files=1,
        )

    ensure_scratch(p["root"], _build)
    # ---- the epoch-2 plan: the CDC delta + the index AT ITS EPOCH-2
    # BASE VERSION (v2 = post-epoch-1) — nothing older is recomputed,
    # and pinning the version (rather than "latest") is what makes the
    # epoch idempotent: the registered query later appends epoch 2's
    # own fingerprints as v3, and a replayed run must not anti-join
    # the delta against its own committed output
    frames = curate_epoch(
        spark, SN.read_changes(spark, p["raw"], 2, 3),
        fp_idx=SN.read(spark, p["fp_tbl"], 2),
        corpus_buckets=SN.read(spark, p["lsh_tbl"], 2),
        model_df=spark.read.parquet(p["model"]),
        stats_df=spark.read.parquet(p["stats"]),
        delta_files=SN.changed_file_count(p["raw"], 2, 3),
        delta_bytes=SN.changed_bytes(p["raw"], 2, 3),
    )
    frames["paths"] = p
    return frames


def _inc_stage_ctes(pfx: str, delta_cte: str, fp_src: str,
                    buckets_cte: str) -> str:
    """The SQL twin of one curate_epoch() pass, parametrized so the
    epoch-2 oracle can emit it twice (epoch 1 against the corpus
    index, epoch 2 against the EVOLVED index) without duplicating the
    gate / LM / dedup logic by hand."""
    return f"""{pfx}canon AS (SELECT doc_id, nfc_normalize(text) AS t FROM {delta_cte}),
{pfx}gm AS (
    SELECT doc_id, t,
        len({_V2_WORDS}) AS nw,
        length(replace({_V2_NORM_T}, ' ', '')) AS total_chars,
        length({_V2_NORM_T})
            - length(replace({_V2_NORM_T}, '#', '')) AS hash_count,
        len(str_split(t, chr(10))) AS n_lines,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '- %' OR x LIKE '* %')) AS bullets,
        len(list_filter(str_split(t, chr(10)),
            x -> x LIKE '%...')) AS ell_lines,
        len(list_filter({_V2_WORDS},
            x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
        (CASE WHEN list_contains({_V2_WORDS}, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({_V2_WORDS}, 'and') THEN 1 ELSE 0 END
        ) AS stop_hits
    FROM {pfx}canon
),
{pfx}gated AS MATERIALIZED (
    SELECT doc_id, t FROM {pfx}gm
    WHERE (nw BETWEEN 40 AND 100000)
      AND ((total_chars / nw) BETWEEN 3.0 AND 10.0)
      AND (hash_count / nw) < 0.05
      AND (bullets / n_lines) < 0.3
      AND (ell_lines / n_lines) < 0.2
      AND (alpha_words / nw) >= 0.9
      AND stop_hits >= 2
),
{pfx}grams AS (
    SELECT doc_id, substr(lower(t), CAST(i AS INT), 3) AS gram
    FROM {pfx}gated, unnest(generate_series(1, length(t) - 2)) AS u(i)
),
{pfx}scores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM {pfx}grams g LEFT JOIN model m USING (gram)
    GROUP BY 1
),
{pfx}fluent AS MATERIALIZED (
    SELECT g.doc_id, g.t
    FROM {pfx}gated g JOIN {pfx}scores s USING (doc_id), ctot
    WHERE s.lm_score * ctot.tg >= ctot.ts * s.lm_grams
),
{pfx}bfp AS (SELECT doc_id, t, md5({_V2_NORM_T}) AS fp FROM {pfx}fluent),
{pfx}fresh AS (
    SELECT * FROM {pfx}bfp
    WHERE fp NOT IN (SELECT fp FROM {fp_src})
),
{pfx}uniq AS MATERIALIZED (
    SELECT doc_id, t FROM (
        SELECT *, row_number() OVER (
            PARTITION BY fp ORDER BY doc_id) AS rn
        FROM {pfx}fresh
    ) WHERE rn = 1
),
{_inc_lsh_ctes(pfx + "bb", pfx + "uniq", "t")},
{pfx}vs AS (
    SELECT DISTINCT b.doc_id FROM {pfx}bb_buckets b
    JOIN {buckets_cte} c ON b.band = c.band AND b.bucket = c.bucket
),
{pfx}intra AS (
    SELECT DISTINCT y.doc_id FROM {pfx}bb_buckets x
    JOIN {pfx}bb_buckets y ON x.band = y.band AND x.bucket = y.bucket
                          AND x.doc_id < y.doc_id
),
{pfx}novel AS MATERIALIZED (
    SELECT doc_id, t FROM {pfx}uniq
    WHERE doc_id NOT IN (SELECT doc_id FROM {pfx}vs
                         UNION SELECT doc_id FROM {pfx}intra)
)"""


_INC2_SQL = rf"""
WITH corpus AS (SELECT doc_id, text FROM documents),
delta1 AS MATERIALIZED (
    SELECT doc_id + 1000000 AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 IN (2, 3, 4)
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 3000000, {_INC_REV} || ' caf' || chr(233)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 4000000, {_INC_REV} || ' caf' || 'e' || chr(769)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 5000000, text || ' ' || substr(text, 1, 40)
    FROM documents WHERE doc_id % 5 = 2
    UNION ALL
    SELECT doc_id + 6000000, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 3
),
delta2 AS MATERIALIZED (
    SELECT doc_id + {_INC2_OFF["fresh2"]} AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + {_INC2_OFF["lsh2"]}, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + {_INC2_OFF["fp2"]}, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 2
),
cgrams AS (
    SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS gram
    FROM corpus, unnest(generate_series(1, length(text) - 2)) AS u(i)
),
model AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM cgrams GROUP BY 1),
cscores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM cgrams g JOIN model m USING (gram)
    GROUP BY 1
),
ctot AS MATERIALIZED (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM cscores
),
cfp AS MATERIALIZED (
    SELECT md5({_INC_NORM_TEXT}) AS fp, min(doc_id) AS doc_id
    FROM corpus GROUP BY 1
),
{_inc_lsh_ctes("cb", "corpus", "text")},
{_inc_stage_ctes("e1", "delta1", "cfp", "cb_buckets")},
{_inc_lsh_ctes("nb1", "e1novel", "t")},
evfp AS MATERIALIZED (
    SELECT fp, doc_id FROM cfp
    UNION ALL
    SELECT md5({_V2_NORM_T}) AS fp, doc_id FROM e1novel
),
evb AS MATERIALIZED (
    SELECT band, bucket FROM cb_buckets
    UNION ALL
    SELECT band, bucket FROM nb1_buckets
),
{_inc_stage_ctes("e2", "delta2", "evfp", "evb")}
SELECT 'delta2_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum FROM delta2
UNION ALL
SELECT 'gated', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM e2gated
UNION ALL
SELECT 'fluent', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM e2fluent
UNION ALL
SELECT 'exact_unique', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM e2uniq
UNION ALL
SELECT 'novel', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM e2novel
UNION ALL
SELECT 'index_fps',
       CAST((SELECT count(*) FROM evfp)
            + (SELECT count(*) FROM e2novel) AS BIGINT),
       CAST((SELECT sum(doc_id) FROM evfp)
            + (SELECT sum(doc_id) FROM e2novel) AS BIGINT)
UNION ALL
SELECT 'curated_total',
       CAST((SELECT count(*) FROM corpus)
            + (SELECT count(*) FROM e1novel)
            + (SELECT count(*) FROM e2novel) AS BIGINT),
       CAST((SELECT sum(doc_id) FROM corpus)
            + (SELECT sum(doc_id) FROM e1novel)
            + (SELECT sum(doc_id) FROM e2novel) AS BIGINT)
"""


@register(
    "incremental_curation_epoch2",
    sql=_INC2_SQL,
    description="the curation loop CLOSES (r10): the dedup indexes are "
    "themselves snapshot tables that EVOLVE per epoch — epoch 1 "
    "(committed once at build) appends its novel docs' fingerprints "
    "and LSH buckets to the index tables; the query curates epoch 2's "
    "CDC delta against the index AT ITS EPOCH-2 BASE VERSION and then "
    "commits epoch 2's own evolution (ids, fps, buckets — exactly-once "
    "batch 2).  Planted teeth target docs that exist ONLY in the "
    "evolved index: byte-exact copies of epoch-1 novel texts die at "
    "the evolved fingerprint probe, their near-dups at the evolved "
    "bucket probe, fresh docs flow through; the index_fps and "
    "curated_total funnel rows pin both evolution commits ([EXT] "
    "north-star composition, steady-state shape)",
)
def incremental_curation_epoch2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the steady-state epoch loop — per-epoch cost is the delta
    # plus index probes; the index grows by |novel| per epoch and is
    # never recomputed (epoch N probes the table version committed by
    # epoch N-1, pinned so replays can't see their own output).
    from magshield_data_pipeline_spark.sources import snapshots as SN

    fr = inc_cur2_epoch_frames(spark, sf_dir)
    p = fr["paths"]
    novel = fr["novel"]
    SN.append_stream_batch(
        novel.select("doc_id"), p["curated"], batch_id=2, n_files=1
    )
    SN.append_stream_batch(
        novel.select(T.fingerprint("t").alias("fp"), "doc_id"),
        p["fp_tbl"], batch_id=2, n_files=1,
    )
    SN.append_stream_batch(
        D.lsh_band_buckets(novel, text_col="t", id_col="doc_id")
        .select("band", "bucket", F.col("doc_id").alias("corpus_doc")),
        p["lsh_tbl"], batch_id=2, n_files=1,
    )
    curated_now = SN.read(spark, p["curated"])
    index_now = SN.read(spark, p["fp_tbl"])

    def row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )

    out = (
        row("delta2_raw", fr["delta"])
        .unionByName(row("gated", fr["gated"]))
        .unionByName(row("fluent", fr["fluent"]))
        .unionByName(row("exact_unique", fr["uniq"]))
        .unionByName(row("novel", fr["novel"]))
        .unionByName(row("index_fps", index_now))
        .unionByName(row("curated_total", curated_now))
    )
    return out.select(
        "stage", "n_docs", F.col("id_sum").cast("long").alias("id_sum")
    )


# ---------------------------------------------------------------------------
# [EXT] model refresh (r10): the last static piece of the epoch loop
# becomes versioned.  The LM gate's trigram model and fluency totals
# were trained once on the original corpus; a production loop
# periodically REFRESHES them from the curated table so the gate
# tracks the corpus it actually guards.  The model is itself a
# snapshot table: v1 = corpus-trained, v2 = retrained on
# curated-as-of-epoch-1 (corpus + novel1 texts, resolved by joining
# the curated ledger's PINNED version 2 back to the raw table — never
# "latest", so the query is run-order independent of the epoch-2
# query sharing the same scratch).
#
# Teeth: epoch 1's novel docs are word-REVERSED texts (+ café-suffixed
# variants), so v2 genuinely contains grams v1 has never seen
# (new_grams > 0), and re-scoring epoch 2's gated docs under
# (model v2, totals v2) flips some LM-gate verdicts (gate_flips > 0 —
# the refresh demonstrably changes curation decisions, it is not a
# cosmetic recount).


def _model_refresh_paths(sf_dir: str) -> dict[str, str]:
    import os

    from magshield_data_pipeline_spark.sources.scratch import scratch_path

    root = scratch_path(
        "inc_model", sf_dir,
        "model_tbl v1=corpus-trained v2=retrain(curated@v2 join raw@v2) "
        "3gram + stats_tbl committed totals v2",
    )
    return {
        "root": root,
        "model_tbl": os.path.join(root, "model_tbl"),
        "stats_tbl": os.path.join(root, "stats_tbl"),
    }


_MODEL_REFRESH_SQL = rf"""
WITH corpus AS (SELECT doc_id, text FROM documents),
delta1 AS MATERIALIZED (
    SELECT doc_id + 1000000 AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 IN (2, 3, 4)
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 3000000, {_INC_REV} || ' caf' || chr(233)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 4000000, {_INC_REV} || ' caf' || 'e' || chr(769)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 5000000, text || ' ' || substr(text, 1, 40)
    FROM documents WHERE doc_id % 5 = 2
    UNION ALL
    SELECT doc_id + 6000000, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 3
),
delta2 AS MATERIALIZED (
    SELECT doc_id + {_INC2_OFF["fresh2"]} AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + {_INC2_OFF["lsh2"]}, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + {_INC2_OFF["fp2"]}, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 2
),
cgrams AS MATERIALIZED (
    SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS gram
    FROM corpus, unnest(generate_series(1, length(text) - 2)) AS u(i)
),
model AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM cgrams GROUP BY 1),
cscores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM cgrams g JOIN model m USING (gram)
    GROUP BY 1
),
ctot AS MATERIALIZED (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM cscores
),
cfp AS MATERIALIZED (
    SELECT md5({_INC_NORM_TEXT}) AS fp, min(doc_id) AS doc_id
    FROM corpus GROUP BY 1
),
{_inc_lsh_ctes("cb", "corpus", "text")},
{_inc_stage_ctes("e1", "delta1", "cfp", "cb_buckets")},
curated1 AS MATERIALIZED (
    SELECT doc_id, text FROM corpus
    UNION ALL
    SELECT d.doc_id, d.text FROM delta1 d
    WHERE d.doc_id IN (SELECT doc_id FROM e1novel)
),
g2 AS MATERIALIZED (
    SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS gram
    FROM curated1, unnest(generate_series(1, length(text) - 2)) AS u(i)
),
model2 AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM g2 GROUP BY 1),
sc2t AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM g2 g JOIN model2 m USING (gram)
    GROUP BY 1
),
ctot2 AS MATERIALIZED (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM sc2t
),
{_inc_stage_ctes("mr", "delta2", "cfp", "cb_buckets")},
mrg AS MATERIALIZED (
    SELECT doc_id, substr(lower(t), CAST(i AS INT), 3) AS gram
    FROM mrgated, unnest(generate_series(1, length(t) - 2)) AS u(i)
),
sc1 AS MATERIALIZED (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM mrg g LEFT JOIN model m USING (gram)
    GROUP BY 1
),
sc2 AS MATERIALIZED (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM mrg g LEFT JOIN model2 m USING (gram)
    GROUP BY 1
),
kv1 AS (
    SELECT doc_id,
           (lm_score * (SELECT tg FROM ctot)
            >= (SELECT ts FROM ctot) * lm_grams) AS keep
    FROM sc1
),
kv2 AS (
    SELECT doc_id,
           (lm_score * (SELECT tg FROM ctot2)
            >= (SELECT ts FROM ctot2) * lm_grams) AS keep
    FROM sc2
),
flips AS (
    SELECT kv1.doc_id FROM kv1 JOIN kv2 USING (doc_id)
    WHERE kv1.keep <> kv2.keep
)
SELECT 'model_v1' AS stage, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(cnt) AS BIGINT) AS metric FROM model
UNION ALL
SELECT 'model_v2', CAST(count(*) AS BIGINT),
       CAST(sum(cnt) AS BIGINT) FROM model2
UNION ALL
SELECT 'new_grams', CAST(count(*) AS BIGINT),
       CAST(sum(cnt) AS BIGINT) FROM model2
WHERE gram NOT IN (SELECT gram FROM model)
UNION ALL
SELECT 'gate_flips', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM flips
"""


def model_refresh_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Ensure (write-once) the VERSIONED model + totals snapshot tables
    on top of the inc_cur2 scratch — v1 corpus-trained, v2 retrained on
    curated-as-of-epoch-1 — and return their paths.  Shared by
    curation_model_refresh (the flip AUDIT) and
    curation_retraction_epoch (the flip audit ACTING — r10 item 1)."""
    import os

    from magshield_data_pipeline_spark.operators import lm as L
    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import ensure_scratch

    p2 = _inc2_paths(sf_dir)
    mp = _model_refresh_paths(sf_dir)

    def _build(tmp: str) -> None:
        os.makedirs(tmp)
        # v1: the corpus-trained model + its totals (identical content
        # to inc_cur2's parquet artifacts, committed as table versions)
        tbl = os.path.join(tmp, "model_tbl")
        st = os.path.join(tmp, "stats_tbl")
        SN.overwrite(spark.read.parquet(p2["model"]), tbl, n_files=1)
        SN.overwrite(spark.read.parquet(p2["stats"]), st, n_files=1)
        # v2: retrain on curated-as-of-epoch-1 — the PINNED curated v2
        # (corpus + novel1 ids), texts resolved from raw v2 — and
        # commit the matching totals WITH the model (the totals are
        # part of the model artifact: recomputing the training-set
        # scores per consumer would be an O(corpus) tax on every gate)
        curated_ids = SN.read(spark, p2["curated"], 2)
        raw = SN.read(spark, p2["raw"], 2).select("doc_id", "text")
        curated_docs = raw.join(curated_ids, "doc_id", "left_semi")
        m2 = L.train_ngram_counts(curated_docs, "text", n=3)
        SN.overwrite(m2, tbl, n_files=1)
        m2_committed = SN.read(spark, tbl, 2)
        SN.overwrite(
            L.fluency_score(curated_docs, m2_committed, "text",
                            "doc_id", n=3)
            .agg(F.sum("lm_score").alias("ts"),
                 F.sum("lm_grams").alias("tg")),
            st, n_files=1,
        )

    # the refresh builds ON the epoch scratch: materialize it first
    inc_cur2_epoch_frames(spark, sf_dir)
    ensure_scratch(mp["root"], _build)
    return mp


@register(
    "curation_model_refresh",
    sql=_MODEL_REFRESH_SQL,
    description="MODEL REFRESH in the epoch loop (r10): the LM gate's "
    "trigram model + totals are versioned in a snapshot table — v1 "
    "corpus-trained, v2 retrained on curated-as-of-epoch-1 (the PINNED "
    "curated ledger version joined back to the raw table, so the query "
    "is run-order independent); output pins both model versions' gram "
    "statistics, the genuinely-new grams v2 learned from epoch 1's "
    "reversed/café novel texts, and the epoch-2 gate verdicts "
    "that FLIP under (model v2, totals v2) — the refresh demonstrably "
    "changes curation decisions, not just counts ([EXT] north-star "
    "composition: the last static piece of the loop is now versioned)",
)
def curation_model_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the refresh is ONE training scan over the curated slice
    # (ids semi-joined back to the raw table — both manifest-bounded
    # snapshot reads) committed as model-table v2; scoring is the
    # broadcast-model shape both times.  Gate-flip counting runs over
    # epoch 2's gated delta only — the refresh audit costs O(delta),
    # never O(corpus).
    from magshield_data_pipeline_spark.operators import lm as L
    from magshield_data_pipeline_spark.sources import snapshots as SN

    p2 = _inc2_paths(sf_dir)
    mp = model_refresh_tables(spark, sf_dir)
    tbl, st = mp["model_tbl"], mp["stats_tbl"]
    m1, m2 = SN.read(spark, tbl, 1), SN.read(spark, tbl, 2)
    t1, t2 = SN.read(spark, st, 1), SN.read(spark, st, 2)

    # gate flips over epoch 2's GATED delta only — computed directly
    # (CDC read -> NFC -> Gopher), not via the full epoch-2 chain whose
    # dedup stages this audit doesn't need
    delta2 = SN.read_changes(spark, p2["raw"], 2, 3)
    target = min(spark.sparkContext.defaultParallelism, 16)
    # spread decision from manifest metadata (r12, guide §8): the
    # delta's file count AND byte volume are known without planning
    # the frame (ADVICE r12: file count alone misses FilePartition
    # bin-packing — many small files can coalesce into few splits)
    if _delta_is_narrow(spark, p2["raw"], 2, 3, target):
        delta2 = delta2.repartition(target)
    canon = T.unicode_canonicalize(
        delta2, text_col="text", nfc_col="t", stripped_col=None
    )
    gated = T.gopher_quality_flags(
        canon, text_col="t", id_col="doc_id", keep_cols=("t",)
    ).filter("keep").select("doc_id", "t").persist()

    # ONE gram-explode pass scoring BOTH model versions (r13, guide
    # §1.2/§2.4 — previously two full fluency_score passes over the
    # gated delta joined back on doc_id: twice the explode, twice the
    # per-doc aggregation exchange, plus a doc_id join exchange).  Both
    # models broadcast; per-gram bit-scores fold in the same aggregate,
    # so both verdicts land on one row and the flip test is a plain
    # column comparison — bit-identical to the two-pass form
    # (lm_grams is the same count either way; each s_i matches
    # fluency_score's lm_score exactly: sum of bit_length(cnt_i)-1
    # over non-null joins, 0 otherwise).
    grams = gated.select(
        "doc_id",
        F.explode_outer(L.char_ngrams(F.lower(F.col("t")), 3)).alias("gram"),
    )

    def bits(c: str):
        return F.when(
            F.col(c).isNotNull(),
            F.length(F.bin(F.col(c))) - F.lit(1),
        ).otherwise(F.lit(0))

    scored = (
        grams
        .join(F.broadcast(m1.withColumnRenamed("cnt", "c1")), "gram", "left")
        .join(F.broadcast(m2.withColumnRenamed("cnt", "c2")), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("lm_grams"),
            F.sum(bits("c1")).cast("long").alias("s1"),
            F.sum(bits("c2")).cast("long").alias("s2"),
        )
    )
    flips = (
        scored
        .crossJoin(F.broadcast(t1.select(
            F.col("ts").alias("ts1"), F.col("tg").alias("tg1"))))
        .crossJoin(F.broadcast(t2.select(
            F.col("ts").alias("ts2"), F.col("tg").alias("tg2"))))
        .select(
            "doc_id",
            (F.col("s1") * F.col("tg1")
             >= F.col("ts1") * F.col("lm_grams")).alias("keep1"),
            (F.col("s2") * F.col("tg2")
             >= F.col("ts2") * F.col("lm_grams")).alias("keep2"),
        )
        .filter(F.col("keep1") != F.col("keep2"))
    )

    def mrow(stage, df, metric_col):
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(metric_col).alias("metric"),
        )

    new_grams = m2.join(m1.select("gram"), "gram", "left_anti")
    out = (
        mrow("model_v1", m1, "cnt")
        .unionByName(mrow("model_v2", m2, "cnt"))
        .unionByName(mrow("new_grams", new_grams, "cnt"))
        .unionByName(mrow("gate_flips", flips, "doc_id"))
    )
    return out.select(
        "stage", "n_items", F.col("metric").cast("long").alias("metric")
    )


# ---------------------------------------------------------------------------
# [EXT] retraction epoch (r11): the flip audit ACTS.  curation_model_
# refresh proves model v2 flips gate verdicts — but through r10 the
# curated table was never corrected: docs v2 would reject stayed
# curated forever (VERDICT r10 "What's missing" #1).  This epoch closes
# that: flip-to-REJECT verdicts over the already-curated slice become a
# row-level DELETE commit on the curated ledger (snapshots.delete —
# stats-pruned copy-on-write, txn-idempotent), and flip-to-PASS docs
# from epoch 2's gated delta are re-examined under the full dedup
# chain (evolved fp + LSH indexes, pinned at their epoch-2 base
# version) and ADMITTED as an exactly-once epoch append.
#
# Teeth: both directions are decision-load-bearing —
#   - retracted > 0: curated docs that passed the v1 gate but fail
#     under (model v2, totals v2) genuinely leave the table (the
#     curated_final funnel row would shift on a double-applied or
#     skipped retraction and fail the hash);
#   - admitted > 0 but strictly fewer than the flip-to-pass set: the
#     +12M byte-copies of epoch-1 novel texts die at the EVOLVED
#     fingerprint probe and the +11M near-dups at the EVOLVED bucket
#     probe, so re-admission provably respects the evolved index, not
#     just the flipped gate.
#
# Run-order independence: every input is version-PINNED (curated@2,
# raw@2, delta = raw 2->3, fp/lsh index@2, model/stats tables @1/@2),
# and the epoch commits land on this query's OWN snapshot table —
# never on the inc_cur2 scratch other queries read.  Replays are
# no-ops at both commits (delete: durable app-txn high-water; append:
# durable batch high-water), so repeated driver/bench runs see
# identical ledger state.
#
# Reference analog: the replace-else-create upsert (one_drive.py:
# 130-211) is "latest wins" at FILE grain; this is its honest scale-up
# to row-grain retraction inside a closed curation loop.

_RETRACT_SQL = rf"""
WITH corpus AS (SELECT doc_id, text FROM documents),
delta1 AS MATERIALIZED (
    SELECT doc_id + 1000000 AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 IN (2, 3, 4)
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 3000000, {_INC_REV} || ' caf' || chr(233)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 4000000, {_INC_REV} || ' caf' || 'e' || chr(769)
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + 5000000, text || ' ' || substr(text, 1, 40)
    FROM documents WHERE doc_id % 5 = 2
    UNION ALL
    SELECT doc_id + 6000000, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 3
),
delta2 AS MATERIALIZED (
    SELECT doc_id + {_INC2_OFF["fresh2"]} AS doc_id, {_INC_REV} AS text
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + {_INC2_OFF["lsh2"]}, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 1
    UNION ALL
    SELECT doc_id + {_INC2_OFF["fp2"]}, {_INC_REV}
    FROM documents WHERE doc_id % 5 = 2
),
cgrams AS MATERIALIZED (
    SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS gram
    FROM corpus, unnest(generate_series(1, length(text) - 2)) AS u(i)
),
model AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM cgrams GROUP BY 1),
cscores AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM cgrams g JOIN model m USING (gram)
    GROUP BY 1
),
ctot AS MATERIALIZED (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM cscores
),
cfp AS MATERIALIZED (
    SELECT md5({_INC_NORM_TEXT}) AS fp, min(doc_id) AS doc_id
    FROM corpus GROUP BY 1
),
{_inc_lsh_ctes("cb", "corpus", "text")},
{_inc_stage_ctes("e1", "delta1", "cfp", "cb_buckets")},
curated1 AS MATERIALIZED (
    SELECT doc_id, text FROM corpus
    UNION ALL
    SELECT d.doc_id, d.text FROM delta1 d
    WHERE d.doc_id IN (SELECT doc_id FROM e1novel)
),
g2 AS MATERIALIZED (
    SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS gram
    FROM curated1, unnest(generate_series(1, length(text) - 2)) AS u(i)
),
model2 AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM g2 GROUP BY 1),
sc2t AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(sum(length(bin(m.cnt)) - 1) AS BIGINT) AS lm_score
    FROM g2 g JOIN model2 m USING (gram)
    GROUP BY 1
),
ctot2 AS MATERIALIZED (
    SELECT CAST(sum(lm_score) AS BIGINT) AS ts,
           CAST(sum(lm_grams) AS BIGINT) AS tg
    FROM sc2t
),
-- verdicts over the CURATED slice under both (model, totals) versions:
-- one gram set (g2), two broadcast models — flip-to-reject retracts
scc1 AS MATERIALIZED (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM g2 g LEFT JOIN model m USING (gram)
    GROUP BY 1
),
kc AS MATERIALIZED (
    SELECT a.doc_id,
           (a.lm_score * (SELECT tg FROM ctot)
            >= (SELECT ts FROM ctot) * a.lm_grams) AS keep1,
           (b.lm_score * (SELECT tg FROM ctot2)
            >= (SELECT ts FROM ctot2) * b.lm_grams) AS keep2
    FROM scc1 a JOIN sc2t b USING (doc_id)
),
retract AS MATERIALIZED (
    SELECT doc_id FROM kc WHERE keep1 AND NOT keep2
),
-- flip-to-pass candidates from epoch 2's gated delta, then the full
-- dedup chain against the EVOLVED index (corpus + epoch-1 novel)
{_inc_stage_ctes("mr", "delta2", "cfp", "cb_buckets")},
mrg AS MATERIALIZED (
    SELECT doc_id, substr(lower(t), CAST(i AS INT), 3) AS gram
    FROM mrgated, unnest(generate_series(1, length(t) - 2)) AS u(i)
),
sc1 AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM mrg g LEFT JOIN model m USING (gram)
    GROUP BY 1
),
sc2 AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS lm_grams,
           CAST(coalesce(sum(CASE WHEN m.cnt IS NOT NULL
                                  THEN length(bin(m.cnt)) - 1 END),
                         0) AS BIGINT) AS lm_score
    FROM mrg g LEFT JOIN model2 m USING (gram)
    GROUP BY 1
),
kd AS MATERIALIZED (
    SELECT a.doc_id,
           (a.lm_score * (SELECT tg FROM ctot)
            >= (SELECT ts FROM ctot) * a.lm_grams) AS keep1,
           (b.lm_score * (SELECT tg FROM ctot2)
            >= (SELECT ts FROM ctot2) * b.lm_grams) AS keep2
    FROM sc1 a JOIN sc2 b USING (doc_id)
),
fcand AS MATERIALIZED (
    SELECT g.doc_id, g.t FROM mrgated g
    JOIN kd USING (doc_id)
    WHERE NOT kd.keep1 AND kd.keep2
),
{_inc_lsh_ctes("nb1", "e1novel", "t")},
evfp AS MATERIALIZED (
    SELECT fp FROM cfp
    UNION ALL
    SELECT md5({_V2_NORM_T}) AS fp FROM e1novel
),
evb AS MATERIALIZED (
    SELECT band, bucket FROM cb_buckets
    UNION ALL
    SELECT band, bucket FROM nb1_buckets
),
fbfp AS (SELECT doc_id, t, md5({_V2_NORM_T}) AS fp FROM fcand),
ffresh AS (
    SELECT * FROM fbfp WHERE fp NOT IN (SELECT fp FROM evfp)
),
funiq AS MATERIALIZED (
    SELECT doc_id, t FROM (
        SELECT *, row_number() OVER (
            PARTITION BY fp ORDER BY doc_id) AS rn
        FROM ffresh
    ) WHERE rn = 1
),
{_inc_lsh_ctes("fb", "funiq", "t")},
fvs AS (
    SELECT DISTINCT b.doc_id FROM fb_buckets b
    JOIN evb c ON b.band = c.band AND b.bucket = c.bucket
),
fintra AS (
    SELECT DISTINCT y.doc_id FROM fb_buckets x
    JOIN fb_buckets y ON x.band = y.band AND x.bucket = y.bucket
                     AND x.doc_id < y.doc_id
),
admit AS MATERIALIZED (
    SELECT doc_id FROM funiq
    WHERE doc_id NOT IN (SELECT doc_id FROM fvs
                         UNION SELECT doc_id FROM fintra)
)
SELECT 'curated_base' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum FROM curated1
UNION ALL
SELECT 'retracted', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM retract
UNION ALL
SELECT 'admitted', CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT) FROM admit
UNION ALL
SELECT 'curated_final',
       CAST((SELECT count(*) FROM curated1)
            - (SELECT count(*) FROM retract)
            + (SELECT count(*) FROM admit) AS BIGINT),
       CAST((SELECT sum(doc_id) FROM curated1)
            - (SELECT coalesce(sum(doc_id), 0) FROM retract)
            + (SELECT coalesce(sum(doc_id), 0) FROM admit) AS BIGINT)
"""


def _retract_paths(sf_dir: str) -> dict[str, str]:
    import os

    from magshield_data_pipeline_spark.sources.scratch import scratch_path

    root = scratch_path(
        "inc_retract", sf_dir,
        "curated_tbl v1=curated@2(inc_cur2) then query commits v2=delete"
        "(flip-to-reject, txn retraction/1) v3=admit append(batch 1)",
    )
    return {"root": root, "curated_tbl": os.path.join(root, "curated_tbl")}


def _delta_is_narrow(spark: SparkSession, table_path: str, from_v: int,
                     to_v: int, target: int) -> bool:
    """Metadata-only spread decision for a delta consumer — see
    ``snapshots.delta_is_narrow`` (file count OR byte volume under the
    fan-out target; ADVICE r12: count alone misses split packing)."""
    from magshield_data_pipeline_spark.sources import snapshots as _SN

    return _SN.delta_is_narrow(spark, table_path, from_v, to_v, target)


def _advisory_bytes(spark: SparkSession) -> int:
    """``spark.sql.adaptive.advisoryPartitionSizeInBytes`` as an int.
    Delegates to :func:`session.conf_bytes`, which accepts every byte-
    suffix form Spark itself accepts — the previous single-letter unit
    lookup crashed on two-letter forms like '16KB' (ADVICE r12
    medium)."""
    from magshield_data_pipeline_spark.session import conf_bytes

    return conf_bytes(
        spark, "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"
    )


def retraction_frames(spark: SparkSession, sf_dir: str) -> dict:
    """Compute the retraction epoch's frames (retract set, admit set,
    verdicts) WITHOUT committing — shared by the registered query, the
    plan-shape pin, and the teeth tests."""
    from magshield_data_pipeline_spark.operators import lm as L
    from magshield_data_pipeline_spark.sources import snapshots as SN

    p2 = _inc2_paths(sf_dir)
    mp = model_refresh_tables(spark, sf_dir)
    m1 = SN.read(spark, mp["model_tbl"], 1)
    m2 = SN.read(spark, mp["model_tbl"], 2)
    t1 = SN.read(spark, mp["stats_tbl"], 1)
    t2 = SN.read(spark, mp["stats_tbl"], 2)
    target = min(spark.sparkContext.defaultParallelism, 16)

    def dual_verdicts(docs: DataFrame, text_col: str) -> DataFrame:
        # ONE gram-explode pass, BOTH model versions broadcast: the
        # explode dominates the cost, so scoring v1 and v2 together
        # halves the audit scan vs two fluency_score passes
        grams = docs.select(
            "doc_id",
            F.explode_outer(
                L.char_ngrams(F.lower(F.col(text_col)), 3)
            ).alias("gram"),
        )

        def bits(c: str):
            return F.when(
                F.col(c).isNotNull(),
                F.length(F.bin(F.col(c))) - F.lit(1),
            ).otherwise(F.lit(0))

        scored = (
            grams
            .join(F.broadcast(m1.withColumnRenamed("cnt", "c1")),
                  "gram", "left")
            .join(F.broadcast(m2.withColumnRenamed("cnt", "c2")),
                  "gram", "left")
            .groupBy("doc_id")
            .agg(
                F.count("gram").alias("lm_grams"),
                F.sum(bits("c1")).cast("long").alias("s1"),
                F.sum(bits("c2")).cast("long").alias("s2"),
            )
        )
        return (
            scored
            .crossJoin(F.broadcast(t1.select(
                F.col("ts").alias("ts1"), F.col("tg").alias("tg1"))))
            .crossJoin(F.broadcast(t2.select(
                F.col("ts").alias("ts2"), F.col("tg").alias("tg2"))))
            .select(
                "doc_id",
                (F.col("s1") * F.col("tg1")
                 >= F.col("ts1") * F.col("lm_grams")).alias("keep1"),
                (F.col("s2") * F.col("tg2")
                 >= F.col("ts2") * F.col("lm_grams")).alias("keep2"),
            )
        )

    # --- retract: flip-to-reject over the curated slice (pinned reads)
    curated_ids = SN.read(spark, p2["curated"], 2)
    raw2 = SN.read(spark, p2["raw"], 2).select("doc_id", "text")
    cur_docs = raw2.join(curated_ids, "doc_id", "left_semi")
    # spread decision from manifest metadata (r12): probing the JOIN
    # frame's partition count EXECUTED the semi-join's child stages
    # under AQE — throwaway jobs re-paid every invocation, twice the
    # scan at any scale.  The engine-mirroring rule instead: AQE
    # coalesces the join output below `target` partitions exactly when
    # its bytes sit under target x advisoryPartitionSizeInBytes, and
    # the scan side's manifest bytes bound the join output — so
    # repartition for the gram-explode fan-out iff the table is
    # metadata-small (at 100 TB the condition is false: no extra
    # exchange, and AQE keeps the join output wide on its own).
    if SN.table_bytes(p2["raw"], 2) < target * _advisory_bytes(spark):
        cur_docs = cur_docs.repartition(target)
    cv = dual_verdicts(cur_docs, "text")
    retract = cv.filter(
        F.col("keep1") & ~F.col("keep2")
    ).select("doc_id").persist()

    # --- admit: flip-to-pass among epoch 2's gated delta, then the
    # full dedup chain vs the EVOLVED index at its pinned version
    delta2 = SN.read_changes(spark, p2["raw"], 2, 3)
    if _delta_is_narrow(spark, p2["raw"], 2, 3, target):
        delta2 = delta2.repartition(target)
    canon = T.unicode_canonicalize(
        delta2, text_col="text", nfc_col="t", stripped_col=None
    )
    gated = T.gopher_quality_flags(
        canon, text_col="t", id_col="doc_id", keep_cols=("t",)
    ).filter("keep").select("doc_id", "t").persist()
    dv = dual_verdicts(gated, "t")
    fcand = gated.join(
        dv.filter(~F.col("keep1") & F.col("keep2")).select("doc_id"),
        "doc_id",
    )
    uniqf = D.incremental_exact_dedup_indexed(
        SN.read(spark, p2["fp_tbl"], 2), fcand,
        text_col="t", id_col="doc_id", keep=("t",),
    ).persist()
    bbf = D.lsh_band_buckets(uniqf, text_col="t", id_col="doc_id").persist()
    vsf = bbf.join(
        SN.read(spark, p2["lsh_tbl"], 2).select("band", "bucket"),
        ["band", "bucket"],
    ).select("doc_id")
    intraf = (
        bbf.alias("a")
        .join(
            bbf.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
    )
    admit = uniqf.join(
        vsf.unionByName(intraf).distinct(), "doc_id", "left_anti"
    ).select("doc_id").persist()
    return {
        "paths": {"p2": p2, "mp": mp},
        "retract": retract,
        "fcand": fcand,
        "admit": admit,
    }


@register(
    "curation_retraction_epoch",
    sql=_RETRACT_SQL,
    description="RETRACTION epoch — the flip audit ACTS (r11, VERDICT "
    "r10 item 1): model v2's flip-to-REJECT verdicts over the curated "
    "slice become a row-level DELETE commit on the curated ledger "
    "(snapshots.delete: stats-pruned copy-on-write, app-txn idempotent "
    "so a replayed retraction is a no-op even after vacuum), and "
    "flip-to-PASS docs from epoch 2's gated delta are re-admitted as "
    "an exactly-once append AFTER the full dedup chain against the "
    "EVOLVED fp/LSH indexes at their pinned epoch-2 base version — "
    "the +12M byte-copies die at the evolved fingerprint probe and "
    "the +11M near-dups at the evolved bucket probe, so re-admission "
    "respects the index, not just the flipped gate; the curated_final "
    "funnel row pins both ledger commits (a double-applied retraction "
    "or skipped admit shifts it and fails the hash)",
)
def curation_retraction_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the retract audit is ONE gram-explode over the curated
    # slice scoring BOTH broadcast model versions (at 100 TB: one scan
    # of the curated table, no corpus rescan — the models and totals
    # are manifest-bounded snapshot reads); the admit pass costs
    # O(delta) plus index probes.  The delete commit rewrites only
    # files whose key range intersects the retract set; the admit
    # append is exactly-once per epoch.  Both commits land on this
    # query's OWN ledger table, every input is version-pinned, and
    # replays of either commit are durable no-ops — repeated runs
    # produce identical ledger state (hash-load-bearing via
    # curated_final).
    import os

    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import ensure_scratch

    fr = retraction_frames(spark, sf_dir)
    p2 = fr["paths"]["p2"]
    rp = _retract_paths(sf_dir)

    def _build(tmp: str) -> None:
        os.makedirs(tmp)
        SN.overwrite(
            SN.read(spark, p2["curated"], 2),
            os.path.join(tmp, "curated_tbl"), n_files=2,
        )

    ensure_scratch(rp["root"], _build)
    rt = rp["curated_tbl"]
    # the epoch's two ledger commits — both idempotent under replay
    SN.delete(fr["retract"], rt, key="doc_id",
              txn=("model-v2-retraction", 1), n_files=2)
    SN.append_stream_batch(fr["admit"], rt, batch_id=1, n_files=1)

    base = SN.read(spark, rt, 1)   # pinned pre-retraction reader:
    final = SN.read(spark, rt)     # still sees every retracted row

    def row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )

    out = (
        row("curated_base", base)
        .unionByName(row("retracted", fr["retract"]))
        .unionByName(row("admitted", fr["admit"]))
        .unionByName(row("curated_final", final))
    )
    return out.select(
        "stage", "n_docs", F.col("id_sum").cast("long").alias("id_sum")
    )


# ---------------------------------------------------------------------------
# PII redaction epoch: positional UPDATE + CDC-incremental index (r12 s4)

_REDACT_PAT = "555-0[0-9]+"

_REDACTION_SQL = f"""
WITH planted AS (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 3
                THEN text || ' contact: 555-0' || CAST(doc_id AS VARCHAR)
                ELSE text END AS text
    FROM documents
),
redacted AS (
    SELECT doc_id,
           regexp_replace(text, '{_REDACT_PAT}', '[REDACTED]', 'g')
           AS text
    FROM planted
),
hits AS (SELECT * FROM planted WHERE doc_id % 11 = 3),
idx AS (
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(regexp_extract_all(text, '{_REDACT_PAT}'))
                AS BIGINT) AS n_pii
    FROM redacted
)
SELECT 'corpus_v1' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS chars_sum,
       CAST(sum(CASE WHEN regexp_matches(text, '{_REDACT_PAT}')
                THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs
FROM planted
UNION ALL
SELECT 'corpus_v2', CAST(count(*) AS BIGINT),
       CAST(sum(length(text)) AS BIGINT),
       CAST(sum(CASE WHEN regexp_matches(text, '{_REDACT_PAT}')
                THEN 1 ELSE 0 END) AS BIGINT)
FROM redacted
UNION ALL
SELECT 'cdc_preimages', CAST(count(*) AS BIGINT),
       CAST(sum(length(text)) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM hits
UNION ALL
SELECT 'index_incremental', CAST(count(*) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT), CAST(sum(n_pii) AS BIGINT)
FROM idx
UNION ALL
SELECT 'index_rebuild', CAST(count(*) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT), CAST(sum(n_pii) AS BIGINT)
FROM idx
UNION ALL
SELECT 'audit', 111, CAST((SELECT count(*) FROM hits) AS BIGINT), 0
"""


@register(
    "curation_redaction_epoch",
    sql=_REDACTION_SQL,
    description="PII REDACTION epoch (r12): the in-place corpus "
    "rewrite a governed training pipeline must support — planted "
    "phone-style tokens are redacted with ONE update_where commit "
    "(positional coordinates + post-images, zero untouched files "
    "rewritten — audit-pinned), and the per-doc feature index is "
    "maintained INCREMENTALLY from the update CDC feed: only the "
    "update_postimage docs are re-featurized and merged, cost "
    "O(redacted docs) not O(corpus), with the incremental index "
    "hash-pinned equal to a from-scratch rebuild of the final "
    "corpus; zero PII matches survive (content-pinned) and replay "
    "of the epoch is a durable no-op (app-txn); at 100 TB this is "
    "a right-to-be-forgotten pass priced by the matches, with every "
    "downstream consumer repaired through the same CDC feed that "
    "repaired the index ([EXT] curation tier)",
)
def curation_redaction_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: detection pushes the rlike into the scan; the UPDATE
    # commits coordinates + post-images only; the index repair reads
    # the CDC feed (touched files), never rescans the corpus.
    import json as _json
    import os as _os

    from magshield_data_pipeline_spark.sources import snapshots as SN
    from magshield_data_pipeline_spark.sources.scratch import (
        ensure_scratch,
        scratch_path,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 3,
               F.concat(F.col("text"), F.lit(" contact: 555-0"),
                        F.col("doc_id").cast("string")))
        .otherwise(F.col("text")).alias("text"),
    )
    base = scratch_path(
        "curation_redaction", sf_dir,
        f"v1=planted(%11=3, 555-0<id>) v2=update_where redact "
        f"pat={_REDACT_PAT}; idx ledger v1=full v2=cdc-merge",
    )

    def _feats(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.size(F.regexp_extract_all(
                "text", F.lit(_REDACT_PAT), 0)).cast("long")
            .alias("n_pii"),
        )

    def _build(tmp: str) -> None:
        corpus = _os.path.join(tmp, "corpus")
        idx = _os.path.join(tmp, "idx")
        SN.overwrite(docs, corpus, n_files=3)
        SN.overwrite(_feats(SN.read(spark, corpus)), idx, n_files=1)
        SN.update_where(
            spark, corpus, f"text rlike '{_REDACT_PAT}'",
            {"text": f"regexp_replace(text, '{_REDACT_PAT}', "
                     "'[REDACTED]')"},
            txn=("redaction", 1),
        )
        # index repair: ONLY the update feed's post-images re-featurize
        post = SN.read_row_changes(spark, corpus, 1, 2).filter(
            "_change_type = 'update_postimage'"
        ).select("doc_id", "text")
        SN.merge(_feats(post), idx, key="doc_id",
                 txn=("redaction-idx", 1))
        # epoch replay: both commits durable no-ops
        replay_a = SN.update_where(
            spark, corpus, f"text rlike '{_REDACT_PAT}'", {"text": "text"},
            txn=("redaction", 1)) is None
        replay_b = SN.merge(_feats(post), idx, key="doc_id",
                            txn=("redaction-idx", 1)) is None
        m1 = SN.read_manifest(corpus, 1)
        m2 = SN.read_manifest(corpus, 2)
        zero_rewrite = {e["path"] for e in m1["files"]} <= {
            e["path"] for e in m2["files"]}
        flag = (100 * int(zero_rewrite)
                + 10 * int(replay_a and replay_b)
                + int(len(SN.versions(idx)) == 2))
        with open(_os.path.join(tmp, "_audit_flag.json"), "w") as f:
            _json.dump({"flag": flag}, f)

    ensure_scratch(base, _build)
    with open(_os.path.join(base, "_audit_flag.json")) as f:
        flag = _json.load(f)["flag"]
    corpus = _os.path.join(base, "corpus")
    idx = _os.path.join(base, "idx")

    def corpus_row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("chars_sum"),
            F.sum(F.col("text").rlike(_REDACT_PAT).cast("long"))
            .cast("long").alias("pii_docs"),
        )

    def idx_row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum("n_pii").cast("long").alias("pii_docs"),
        )

    cdc_pre = SN.read_row_changes(spark, corpus, 1, 2).filter(
        "_change_type = 'update_preimage'").select("doc_id", "text")
    audit = spark.range(1).select(
        F.lit("audit").alias("stage"),
        F.lit(flag).cast("long").alias("n_docs"),
        F.lit(cdc_pre.count()).cast("long").alias("chars_sum"),
        F.lit(SN.read(spark, corpus).filter(
            F.col("text").rlike(_REDACT_PAT)).count()).cast("long")
        .alias("pii_docs"),
    )
    return (
        corpus_row("corpus_v1", SN.read(spark, corpus, 1))
        .unionByName(corpus_row("corpus_v2", SN.read(spark, corpus, 2)))
        .unionByName(corpus_row("cdc_preimages", cdc_pre)
                     .withColumn("pii_docs",
                                 F.col("n_docs").cast("long")))
        .unionByName(idx_row("index_incremental", SN.read(spark, idx)))
        .unionByName(idx_row("index_rebuild",
                             _feats(SN.read(spark, corpus))))
        .unionByName(audit)
    )
