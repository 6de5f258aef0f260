"""Property-based tests (hypothesis) for the scalar library and dedup
operators (SURVEY §5.4): fallback round-trips, idempotence,
normalization invariance, subset/determinism laws.

Each property batches its generated examples into ONE Spark job (a
single-column DataFrame) so hypothesis cost stays bounded.
"""

from __future__ import annotations

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.functions import scalars as S
from magshield_data_pipeline_spark.operators import dedup as D
from magshield_data_pipeline_spark.operators import text as T

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text, newlines included (clean_text's whole domain)
texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=60,
    ),
    min_size=1,
    max_size=20,
)


def _col_apply(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.o for r in df.select(expr_fn("v").alias("o")).collect()]


@settings(**_SETTINGS)
@given(vals=texts)
def test_clean_text_idempotent(spark, vals):
    once = _col_apply(spark, vals, S.clean_text)
    twice = _col_apply(spark, once, S.clean_text)
    assert once == twice
    assert all("\n" not in (o or "") and "\r" not in (o or "") for o in once)


@settings(**_SETTINGS)
@given(vals=texts)
def test_date_format_passthrough_for_unparseable(spark, vals):
    # F2 contract: any string that doesn't parse comes back unchanged
    unparseable = [
        v for v in vals
        if not _re.match(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", v or "")
    ]
    out = _col_apply(spark, unparseable, S.format_date_quote)
    assert out == unparseable


@settings(**_SETTINGS)
@given(vals=texts)
def test_fingerprint_whitespace_invariant(spark, vals):
    mangled = ["  " + (v or "").replace(" ", "   ") + "\t" for v in vals]
    a = _col_apply(spark, vals, T.fingerprint)
    b = _col_apply(spark, mangled, T.fingerprint)
    assert a == b


@settings(**_SETTINGS)
@given(vals=st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=40),
                     min_size=1, max_size=15))
def test_fingerprint_ascii_case_invariant(spark, vals):
    # ASCII only: Unicode special casings (e.g. 'ß'.upper() == 'SS') are
    # legitimately NOT fingerprint-invariant — hypothesis found that one
    mangled = [(v or "").upper() for v in vals]
    a = _col_apply(spark, vals, T.fingerprint)
    b = _col_apply(spark, mangled, T.fingerprint)
    assert a == b


@settings(**_SETTINGS)
@given(vals=st.lists(st.text(alphabet="ab c", min_size=0, max_size=30),
                     min_size=1, max_size=15))
def test_exact_dedup_is_subset_and_deterministic(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, text string"
    )
    out1 = sorted(r.doc_id for r in D.exact_dedup(df).collect())
    out2 = sorted(r.doc_id for r in D.exact_dedup(df).collect())
    assert out1 == out2  # deterministic
    assert set(out1) <= set(range(len(vals)))  # subset of input
    # survivor count equals distinct normalized text count
    n_distinct = df.select(T.normalize_text("text").alias("n")).distinct().count()
    assert len(out1) == n_distinct


@settings(**_SETTINGS)
@given(vals=st.lists(st.text(alphabet="xy z", min_size=0, max_size=40),
                     min_size=1, max_size=10))
def test_shingles_nonempty_and_window_sized(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    rows = df.select(
        D.word_shingles("text").alias("sh"),
        F.size(F.split(T.normalize_text("text"), " ")).alias("nw"),
    ).collect()
    for r in rows:
        assert len(r.sh) >= 1  # every doc contributes at least one shingle
        assert len(r.sh) == max(1, r.nw - 2)  # n-2 trigrams (or the whole text)
