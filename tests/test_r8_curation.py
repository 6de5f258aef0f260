"""Round-8 curation/temporal additions: unicode canonicalization,
Gopher-family quality rules, LOCF gap-fill.  The registry queries
carry the DuckDB hash parity; these pin the operator contracts the
oracle cannot observe (flag teeth, collapse semantics, fill rules)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import temporal as TP
from magshield_data_pipeline_spark.operators import text as T
from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from tests.conftest import SF_SMALL


def test_unicode_variants_collapse_to_one_fingerprint(spark):
    # decomposed e+U+0301 and precomposed U+00E9 are DIFFERENT byte
    # strings but ONE canonical document
    df = spark.createDataFrame(
        [(1, "cafe\u0301"), (2, "caf\u00e9")], ["id", "v"]
    )
    out = T.unicode_canonicalize(df, text_col="v").collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["v"] != by_id[2]["v"]
    assert by_id[1]["nfc_text"] == by_id[2]["nfc_text"] == "caf\u00e9"
    assert by_id[1]["stripped_text"] == by_id[2]["stripped_text"] == "cafe"


def test_unicode_canonicalize_passes_nulls(spark):
    df = spark.createDataFrame([(1, None)], "id long, v string")
    r = T.unicode_canonicalize(df, text_col="v").collect()[0]
    assert r["nfc_text"] is None and r["stripped_text"] is None


def test_every_gopher_flag_fires_and_keep_is_their_negation(spark):
    # teeth: the decorated fixture must make each of the 7 rules fire
    # on a non-empty subset (a rule that can never fire proves nothing)
    out = QUERY_REGISTRY["gopher_quality_flags"].fn(spark, SF_SMALL)
    flags = [c for c in out.columns if c.startswith("flag_")]
    assert len(flags) == 7
    agg = out.agg(
        *[F.sum(F.col(c).cast("int")).alias(c) for c in flags],
        F.sum(
            (
                ~(
                    F.col("keep")
                    == ~(
                        F.col(flags[0])
                        | F.col(flags[1])
                        | F.col(flags[2])
                        | F.col(flags[3])
                        | F.col(flags[4])
                        | F.col(flags[5])
                        | F.col(flags[6])
                    )
                )
            ).cast("int")
        ).alias("keep_mismatch"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    for c in flags:
        assert agg[c] > 0, f"rule {c} never fires — no teeth"
    assert agg["keep_mismatch"] == 0
    assert 0 < agg["kept"] < agg["n"]


def test_gap_fill_locf_semantics(spark):
    # key k: observed day2=5.0, day4=7.0 over span day1..day5
    # → leading gap takes default, day3 carries 5.0, day5 carries 7.0
    d = datetime.date
    sparse = spark.createDataFrame(
        [("k", d(2024, 1, 2), 5.0), ("k", d(2024, 1, 4), 7.0)],
        "key string, day date, value double",
    )
    keys = spark.createDataFrame([("k",)], "key string")
    span = spark.createDataFrame(
        [(d(2024, 1, 1), d(2024, 1, 5))], "d0 date, d1 date"
    )
    rows = {
        r["day"].isoformat(): (r["value_filled"], r["was_gap"])
        for r in TP.gap_fill_locf(sparse, keys, span).collect()
    }
    assert rows == {
        "2024-01-01": (0.0, True),
        "2024-01-02": (5.0, False),
        "2024-01-03": (5.0, True),
        "2024-01-04": (7.0, False),
        "2024-01-05": (7.0, True),
    }
