"""Incremental materialized-view maintenance over the snapshot ledger.

A materialized aggregate view — ``SELECT g, count(*), sum(m1), ... FROM
source GROUP BY g`` — kept fresh by consuming the source table's
row-level change feed (``sources.snapshots.read_row_changes``) instead
of recomputing the group-by from scratch.  This is the canonical
*subscriber* for the CDC feed: the feed's cost contract (each commit
delivers only its touched files' net row changes, maintenance compacts
deliver nothing) only pays off if the downstream refresh is likewise
proportional to the change, and for SUM/COUNT-additive aggregates it
is — classic incremental view maintenance (Griffin & Libkin, "Incremental
Maintenance of Views with Duplicates", SIGMOD '95): every change row
carries a sign (+1 for ``insert``/``update_postimage``, −1 for
``delete``/``update_preimage``), the signed per-group delta folds into
the stored per-group state, and groups whose row count reaches zero are
retracted from the view.

Scale shape at 100 TB:

- **refresh cost = O(commit's touched files) + O(affected groups)** —
  the feed scan is the commit's before/after images only, the fold is
  one small groupBy over those rows, and the ledger MERGE into the
  view rewrites only view files whose group range intersects the
  affected groups (manifest min/max stats; cluster the view on the
  group key to make that pruning sharp).  A compact on the source is
  free: the feed is empty by contract and the refresh commits nothing.
- **exactly-once** — the view merge and the zero-group delete each
  commit under an application transaction keyed to the source version
  consumed (the Delta txnAppId/txnVersion contract, durable across
  vacuum), so a replayed or crash-resumed refresh converges to the
  same view state instead of double-applying the delta.  The replay
  path is total: if the merge already landed but the delete did not,
  re-running the refresh no-ops the merge and completes the delete.

Reference analog: the reference recomputes every export from a full
re-extract per trigger (callable.py:118-156); this is the incremental
shape that replaces recompute-the-world once the corpus is a ledger
table receiving appends, corrections, and retractions.

Only SUM/COUNT-additive measures are supported by construction: every
measure expression is maintained as ``SUM(expr)``.  MIN/MAX have no
additive inverse under deletes (retracting the current extremum needs
auxiliary per-group state) and are deliberately out of the API's reach.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import snapshots as SN

#: column holding the maintained per-group row count (doubles as the
#: group-liveness counter: a group retracts when it reaches zero).
COUNT_COL = "n_rows"

_POS_CHANGES = ("insert", "update_postimage")


def _measure_cols(measures: dict) -> list[str]:
    bad = [k for k in measures if k == COUNT_COL]
    if bad:
        raise ValueError(f"measure name {COUNT_COL!r} is reserved")
    return list(measures)


def init_agg_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    group: Column,
    group_name: str,
    measures: dict,
    *,
    version: int | None = None,
    n_files: int = 1,
) -> int:
    """Materialize the view from scratch at *version* (default: the
    source's latest snapshot) and commit it as version 1 of
    *view_path*, range-clustered on the group key so later refresh
    MERGEs stats-prune to the affected group range.  *measures* maps
    output column name -> SUM-additive Column expression over source
    rows (evaluated identically here and on feed rows in
    :func:`refresh_agg_view`).  Returns the view's committed version.
    """
    src = SN.read(spark, source_path, version)
    agg = src.groupBy(group.alias(group_name)).agg(
        F.count(F.lit(1)).alias(COUNT_COL),
        *[F.sum(expr).alias(name) for name, expr in measures.items()],
    )
    v = SN.overwrite(agg, view_path, n_files=n_files)
    if n_files > 1:
        # disjoint group ranges per file = the pruning index refreshes
        # rely on; a single-file view is trivially "clustered" already
        v = SN.compact(spark, view_path, n_files=n_files,
                       cluster_by=[group_name])
    return v


def refresh_agg_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    group: Column,
    group_name: str,
    measures: dict,
    *,
    from_version: int,
    to_version: int,
    app: str = "ivm",
    n_files: int = 1,
) -> dict:
    """Fold the source's row changes in ``(from_version, to_version]``
    into the maintained view.  Returns a summary dict::

        {"applied": bool,          # False when the feed was empty or
                                   #   the refresh had already committed
         "groups_upserted": int,   # live groups merged into the view
         "groups_deleted": int}    # groups retracted at count zero

    Exactly-once: the merge commits under ``(app + ":m", to_version)``
    and the retract under ``(app + ":d", to_version)`` — replays of
    either are durable no-ops, and because the fold routes every write
    through those two transactional commits, a crash between them
    resumes correctly (the recomputed fold may differ against the
    half-updated view, but the already-committed half refuses to
    re-apply).
    """
    ch = SN.read_row_changes(spark, source_path, from_version, to_version)
    return apply_changes(
        spark, view_path, ch, group, group_name, measures,
        txn_version=to_version, app=app, n_files=n_files,
    )


def apply_changes(
    spark: SparkSession,
    view_path: str,
    changes: DataFrame,
    group: Column,
    group_name: str,
    measures: dict,
    *,
    txn_version: int,
    app: str = "ivm",
    n_files: int = 1,
) -> dict:
    """Fold an arbitrary frame of CDC rows (``_change_type`` +-signed,
    e.g. one ``ledger_cdc`` micro-batch inside ``foreachBatch``) into
    the maintained view — the streaming entry point.  *txn_version*
    must be monotone per *app* (a stream passes its batch id; the
    batch path passes the source version consumed).  Same return
    shape and exactly-once contract as :func:`refresh_agg_view`.

    Replay safety (ADVICE r11 high — a redelivered batch folded the
    delta into the ALREADY-merged view, so the recomputed dead set
    could retract a live group): the fold is applied in two commits
    whose inputs make replays total —

    1. the MERGE upserts every affected group INCLUDING groups whose
       folded count reached zero (zeroed in place; groups born and
       killed within one batch never touch the view).  A replay
       no-ops on the txn marker, so the untrustworthy re-fold is
       never applied.
    2. the RETRACT deletes groups whose count **in the view itself**
       is zero, restricted to this batch's affected groups — derived
       from committed state, not from the re-fold, so it finds
       exactly the zeros step 1 wrote: on a clean replay there are
       none (no-op), after a crash between the commits the leftover
       zeros are completed.  A view scan between the two commits may
       observe count-zero rows (filter ``n_rows > 0`` for a
       mid-refresh read); every completed refresh leaves none."""
    _measure_cols(measures)
    ch = changes
    to_version = txn_version
    sign = F.when(
        F.col("_change_type").isin(*_POS_CHANGES), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        ch.groupBy(group.alias(group_name))
        .agg(
            F.sum(sign).alias(f"_d_{COUNT_COL}"),
            *[
                F.sum(sign * expr).alias(f"_d_{name}")
                for name, expr in measures.items()
            ],
        )
    ).persist()
    try:
        # bounded: one row per AFFECTED group (never the group universe)
        if not delta.head(1):
            return {"applied": False, "groups_upserted": 0,
                    "groups_deleted": 0}
        cur = SN.read(spark, view_path)
        names = [COUNT_COL, *measures]
        folded = (
            delta.join(cur, [group_name], "left")
            .select(
                group_name,
                F.col(COUNT_COL).isNotNull().alias("_in_view"),
                *[
                    (
                        F.coalesce(F.col(n), F.lit(0))
                        + F.coalesce(F.col(f"_d_{n}"), F.lit(0))
                    ).alias(n)
                    for n in names
                ],
            )
            .persist()
        )
        try:
            # groups at zero that never existed in the view (insert +
            # delete within one batch) are dropped; zeros that DO exist
            # ride the merge so upsert+zeroing is one atomic commit
            upserts = folded.filter(
                (F.col(COUNT_COL) > 0) | F.col("_in_view")
            ).drop("_in_view")
            n_up = upserts.filter(F.col(COUNT_COL) > 0).count()
            if upserts.head(1):
                if SN.merge(
                    upserts, view_path, key=group_name, n_files=n_files,
                    txn=(f"{app}:m", to_version),
                ) is None:
                    n_up = 0  # replay — the merge already landed
            # retract from COMMITTED view state among affected groups —
            # bounded by the delta's group count, trustworthy on replay
            dead = (
                SN.read(spark, view_path)
                .join(delta.select(group_name), [group_name], "left_semi")
                .filter(F.col(COUNT_COL) == 0)
                .select(group_name)
            )
            n_dead = dead.count()
            if n_dead:
                if SN.delete(
                    dead, view_path, key=group_name, n_files=n_files,
                    txn=(f"{app}:d", to_version),
                ) is None:
                    n_dead = 0  # replay — the retract already landed
            return {
                "applied": bool(n_up or n_dead),
                "groups_upserted": n_up,
                "groups_deleted": n_dead,
            }
        finally:
            folded.unpersist()
    finally:
        delta.unpersist()


def view_equals_recompute(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    group: Column,
    group_name: str,
    measures: dict,
) -> DataFrame:
    """Audit frame: the maintained view ``exceptAll`` a from-scratch
    group-by of the source's latest snapshot, unioned with the reverse
    — empty iff incremental maintenance converged to the batch answer.
    (Diagnostic; tests assert ``.head(1) == []``.)"""
    fresh = (
        SN.read(spark, source_path)
        .groupBy(group.alias(group_name))
        .agg(
            F.count(F.lit(1)).alias(COUNT_COL),
            *[F.sum(expr).alias(n) for n, expr in measures.items()],
        )
    )
    view = SN.read(spark, view_path).select(*fresh.columns)
    return view.exceptAll(fresh).unionByName(fresh.exceptAll(view))
