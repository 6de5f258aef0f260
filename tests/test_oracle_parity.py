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
