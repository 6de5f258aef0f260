"""Local replica of the driver's DuckDB-oracle differential check.

Runs each registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and an order-insensitive
value fingerprint. Strictly at-least-as-strict as the driver's hash, so a
green run here predicts a green CORRECTNESS_r{N}.json.

Driver-faithfulness notes (learned from CORRECTNESS_r02):

- The driver materializes BOTH results through pandas before hashing, so
  dtype drift is visible: DuckDB widens integer sums to HUGEINT, which
  pandas stores as float64 (``123.0``) while Spark returns int64
  (``123``) — bit-identical values, divergent hashes. We therefore go
  through ``toPandas()`` / ``.df()`` here too and tag every canonical
  value with its dtype kind (``i:`` / ``f:`` / ``b:`` …) so an int-vs-
  float mismatch fails locally exactly like it fails under the driver.
- The driver's canonicalizer ``sort_values``-then-``factorize``s each
  column, which raises ``TypeError: unhashable type: 'list'`` on any
  array-typed output column. We detect list/ndarray cells and fail the
  query with an explicit ``array_typed_columns`` error instead of
  silently canonicalizing them.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from magshield_data_pipeline_spark.sources.parquet import STAR_TABLES


def _canon_value(v: Any) -> str:
    """Dtype-kind-tagged canonical string for one cell.

    The kind tag is the load-bearing part: the driver hashes pandas
    values, so ``int64 123`` and ``float64 123.0`` must NOT collapse to
    the same string here (they did in round 2, hiding three HUGEINT
    hash-fails from the local check).
    """
    if v is None:
        return "␀"
    # pandas NaT / NaN / NA
    if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "␀"
    if v is pd.NA:
        return "␀"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        # 12 significant digits absorbs float32→float64 formatting noise
        return f"f:{float(v):.12g}"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError("unhashable type: 'list' (array-typed output column)")
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def _canon_frame(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(_canon_value(v) for v in row))
    return sorted(out)


def spark_pandas(df: DataFrame) -> pd.DataFrame:
    return df.toPandas()


def duckdb_pandas(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    res = con.execute(sql).df()
    con.close()
    return res


def compare_query(
    spark: SparkSession, name: str, fn, sql: str, sf_dir: str
) -> dict[str, Any]:
    s_df = spark_pandas(fn(spark, sf_dir))
    d_df = duckdb_pandas(sql, sf_dir)
    out: dict[str, Any] = {
        "name": name,
        "spark_rows": len(s_df),
        "oracle_rows": len(d_df),
        "rows_match": len(s_df) == len(d_df),
        "cols_match": sorted(s_df.columns) == sorted(d_df.columns),
    }
    if not (out["rows_match"] and out["cols_match"]):
        out["values_match"] = False
        out["spark_cols"] = list(s_df.columns)
        out["oracle_cols"] = list(d_df.columns)
        out["ok"] = False
        return out
    try:
        s_canon = _canon_frame(s_df)
        d_canon = _canon_frame(d_df)
    except TypeError as e:
        out["values_match"] = False
        out["ok"] = False
        out["error"] = f"array_typed_columns: {e}"
        return out
    out["values_match"] = s_canon == d_canon
    if not out["values_match"]:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        out["first_diffs"] = diffs
    out["ok"] = out["rows_match"] and out["cols_match"] and out["values_match"]
    return out


def run_all(spark: SparkSession, sf_dir: str, only: list[str] | None = None) -> list[dict]:
    from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY

    results = []
    for name, spec in QUERY_REGISTRY.items():
        if only and name not in only:
            continue
        if spec.sql is None:
            # rows-only check, mirroring the driver's weaker path
            try:
                n = spec.fn(spark, sf_dir).count()
                results.append({"name": name, "rows_only": True, "rows": n, "ok": n >= 0})
            except Exception as e:  # noqa: BLE001
                results.append({"name": name, "rows_only": True, "ok": False, "error": str(e)})
            continue
        try:
            results.append(compare_query(spark, name, spec.fn, spec.sql, sf_dir))
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "ok": False, "error": str(e)})
        finally:
            # pair pipelines persist caller-owned frames; drop them so a
            # full-registry run doesn't accumulate cache entries
            from magshield_data_pipeline_spark.session import release_caches

            release_caches(spark)
    return results


if __name__ == "__main__":
    import json
    import sys

    from magshield_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("oracle-harness")
    ok = True
    for res in run_all(spark, sf_dir, only):
        ok = ok and res["ok"]
        print(json.dumps(res, default=str))
    sys.exit(0 if ok else 1)
