"""Sinks (SURVEY §2.2 K1–K3).

The reference's load path is: write an Excel workbook to /tmp
(quote.py:236-246), then upsert it into a OneDrive folder by name —
list children, replace if the name exists, else create
(/root/reference/modules/one_drive.py:130-211) — then delete the local
file (callable.py:102-116).

Spark-first restatement:

- K1 Excel: a driver-side pandas bridge (`toPandas().to_excel`).
  Excel is inherently a small-export format — the bridge collects to
  the driver, so it is gated to row counts a driver can hold; the
  scale-out sink is Parquet. openpyxl is optional: when absent we fall
  back to CSV next to the requested path (export still usable).
- K2 overwrite-by-name: ``df.write.mode('overwrite')`` to a named
  object IS replace-else-create — idempotent, atomic per job, no
  list-then-branch race. For remote object stores the same semantics
  come from an idempotent PUT in ``foreachBatch``.
- K3 upload-then-delete: subsumed — writing directly to the final name
  leaves no temp artifact to clean up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

EXCEL_ROW_LIMIT = 1_000_000  # driver-side bridge guard (xlsx hard cap is 1,048,576)


def write_excel(df: DataFrame, path: str, row_limit: int = EXCEL_ROW_LIMIT) -> str | None:
    """K1 — Excel writer via the pandas bridge. Returns the written path,
    or None when the frame is empty (the reference skips empty exports —
    quote.py:236-242). Falls back to CSV when openpyxl is unavailable.
    """
    # limit+1 probe instead of count(): one job, stops scanning early
    head = df.limit(row_limit + 1).toPandas()
    if head.empty:
        return None
    if len(head) > row_limit:
        raise ValueError(
            f"Excel bridge is for driver-sized exports (> {row_limit} rows); "
            "use overwrite_by_name (parquet) for scale-out output"
        )
    try:
        import openpyxl  # noqa: F401

        head.to_excel(path, index=False, engine="openpyxl")
        return path
    except ImportError:
        fallback = os.path.splitext(path)[0] + ".csv"
        head.to_csv(fallback, index=False)
        return fallback


def overwrite_by_name(
    df: DataFrame, base_dir: str, name: str, fmt: str = "parquet"
) -> str:
    """K2 — upsert-by-name: writing ``mode('overwrite')`` to the named
    location replaces an existing object or creates a new one, exactly
    the reference's find-then-replace-else-create flow
    (one_drive.py:143-209) without the race between find and put."""
    target = os.path.join(base_dir, name)
    df.write.mode("overwrite").format(fmt).save(target)
    return target


def merge_upsert(
    existing: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level MERGE (upsert): K2's replace-else-create semantics
    generalized from file-by-name to row-by-key — update rows win over
    existing rows on key collision, unmatched existing rows pass
    through, new keys insert. Pure function: compose with
    ``overwrite_by_name`` for the read-merge-rewrite cycle a lakehouse
    table runs (Delta/Iceberg MERGE INTO is this plan plus transaction
    metadata).

    Scale: ONE anti-join shuffle on the key (updates broadcast when
    small — the common CDC case) + a zero-shuffle union. No full-table
    window, no driver collection; the rewrite cost is the overwrite
    itself, which partition-pruned lakehouse writers bound to touched
    partitions."""
    kept = existing.join(updates.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(updates)
