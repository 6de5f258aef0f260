"""Local replica of the driver's DuckDB-oracle differential check.

Runs each registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and an order-insensitive
value fingerprint (columns sorted by name, rows sorted by their string
form). Strictly at-least-as-strict as the driver's hash, so a green run
here predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from magshield_data_pipeline_spark.sources.parquet import STAR_TABLES


def _canon_value(v: Any) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits absorbs float32→float64 formatting noise
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows


def compare_query(
    spark: SparkSession, name: str, fn, sql: str, sf_dir: str
) -> dict[str, Any]:
    s_cols, s_rows = spark_result(fn(spark, sf_dir))
    d_cols, d_rows = duckdb_result(sql, sf_dir)
    out: dict[str, Any] = {
        "name": name,
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    if out["rows_match"] and out["cols_match"]:
        s_canon = _canon_rows(s_cols, s_rows)
        d_canon = _canon_rows(d_cols, d_rows)
        out["values_match"] = s_canon == d_canon
        if not out["values_match"]:
            diffs = [
                (a, b) for a, b in zip(s_canon, d_canon) if a != b
            ][:3]
            out["first_diffs"] = diffs
    else:
        out["values_match"] = False
        out["spark_cols"] = s_cols
        out["oracle_cols"] = d_cols
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
