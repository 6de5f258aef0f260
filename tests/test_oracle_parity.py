"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — a faster local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from magshield_data_pipeline_spark.plans import oracle_harness
from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from tests.conftest import SF_SMALL

ORACLE_QUERIES = sorted(n for n, s in QUERY_REGISTRY.items() if s.sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERY_REGISTRY.items() if s.sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, name):
    spec = QUERY_REGISTRY[name]
    res = oracle_harness.compare_query(spark, name, spec.fn, spec.sql, SF_SMALL)
    assert res["ok"], res


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    df = QUERY_REGISTRY[name].fn(spark, SF_SMALL)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# mutation controls: an all-green parity suite is only evidence if the
# comparator actually REJECTS wrong answers — perturb a known-good
# query three ways and assert each perturbation is caught


def test_comparator_catches_value_mutation(spark):
    spec = QUERY_REGISTRY["pricing_summary"]
    mutated = spec.sql.replace("sum(", "sum(1e-3 + ", 1)
    res = oracle_harness.compare_query(
        spark, "mutated", spec.fn, mutated, SF_SMALL
    )
    assert res["rows_match"] and res["cols_match"]
    assert not res["values_match"], "value mutation went undetected"


def test_comparator_catches_row_mutation(spark):
    spec = QUERY_REGISTRY["mail_scan_topn"]
    mutated = spec.sql.replace("LIMIT", "LIMIT 1 --", 1)
    if "LIMIT" not in spec.sql:
        mutated = f"SELECT * FROM ({spec.sql}) q LIMIT 1"
    res = oracle_harness.compare_query(
        spark, "mutated", spec.fn, mutated, SF_SMALL
    )
    assert not res["rows_match"], "row-count mutation went undetected"


def test_comparator_catches_column_rename(spark):
    spec = QUERY_REGISTRY["count_probe"]
    mutated = f"SELECT *, 1 AS extra_col FROM ({spec.sql}) q"
    res = oracle_harness.compare_query(
        spark, "mutated", spec.fn, mutated, SF_SMALL
    )
    assert not res["cols_match"], "schema mutation went undetected"


def test_comparator_catches_integer_float_dtype_drift(spark):
    # the HUGEINT/int64 class: 123 (int) vs 123.0 (float) must differ
    import pandas as pd

    from magshield_data_pipeline_spark.plans.oracle_harness import _canon_frame

    a = _canon_frame(pd.DataFrame({"x": [123]}))
    b = _canon_frame(pd.DataFrame({"x": [123.0]}))
    assert a != b, "int/float drift invisible to the canonicalizer"


def test_comparator_catches_q20_quantum_mutation(spark):
    # the integer-quantization contract must have teeth: shifting the
    # oracle's quantum by ONE (2^20 -> 2^20+1) changes some per-element
    # floor and the hash must catch it — otherwise "exact integer
    # scores" would be an unfalsifiable claim
    spec = QUERY_REGISTRY["embedding_gram_matrix_blas"]
    mutated = spec.sql.replace("1048576.0", "1048577.0")
    assert mutated != spec.sql
    res = oracle_harness.compare_query(
        spark, "mutated_q20", spec.fn, mutated, SF_SMALL
    )
    assert res["rows_match"] and res["cols_match"]
    assert not res["values_match"], "q20 quantum mutation went undetected"
