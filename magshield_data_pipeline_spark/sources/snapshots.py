"""Snapshot-versioned parquet tables: the minimal table-format core —
versioned manifests, time travel, append/overwrite/compaction — built
on the same atomic-publish primitives as sinks.py / scratch.py.

The jsonl_sink commit (sources/jsonl_sink.py) is the "one job lands
atomically" primitive and its docstring names the gap on purpose: a
cross-job append LEDGER is a table format's job.  This module is that
ledger, reduced to its load-bearing core (the Iceberg/Delta snapshot
contract, stdlib only):

- a table is a directory: immutable data files under ``data/``, one
  JSON manifest per VERSION under ``_manifests/vN.json`` listing the
  exact files that make up that snapshot;
- a manifest is published with stage-then-``os.link`` — exclusive
  creation, so of two racing writers allocating the same version
  exactly ONE wins and the loser retries at N+1 (optimistic
  concurrency, the Iceberg commit protocol on a filesystem);
- data files are IMMUTABLE and never deleted by table operations:
  ``overwrite`` and ``compact`` publish a new manifest that simply
  stops listing old files, so a reader holding version N's file list
  is never broken by a later commit — snapshot isolation by
  construction (``vacuum`` reclaims files referenced by no RETAINED
  snapshot after a keep-newest-K retention window);
- ``read`` resolves a version (default: latest) to its manifest and
  scans exactly the listed files — time travel is just passing an
  older version; ``read_changes`` scans only the files ADDED between
  two versions (exact CDC for append-only chains, cost proportional
  to the change).

At 100 TB this is precisely the scan contract that makes planning
cheap: the manifest bounds the file listing (no directory walks), and
per-file min/max column stats in the manifest let the reader prune
files before Spark ever sees them (``min_max`` below records them;
``read`` applies an optional ``prune`` range).

Reference analog: none (the reference swaps ONE workbook per run —
report.py's upload-then-delete); this is the [EXT] lakehouse tier
generalization.
"""

from __future__ import annotations

import json
import os
import re
import uuid

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "_manifests")


def versions(table_path: str) -> list[int]:
    """All committed versions, ascending. A manifest file EXISTS iff
    its commit completed (exclusive-create publish), so this listing
    never sees a partial commit."""
    d = _manifest_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = _MANIFEST_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_manifest(table_path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_path), f"v{version}.json")) as f:
        return json.load(f)


def _publish_manifest(
    table_path: str,
    operation: str,
    entries: list[dict],
    carry: bool = False,
) -> int:
    """Optimistic commit: stage the manifest, then exclusively link it
    as the next version; on collision (a concurrent writer took the
    number) retry at the next one.  ``carry=True`` (append semantics)
    re-resolves the carried-forward file list against the CURRENT
    latest on every retry — a concurrent commit that wins the version
    race must have its files carried, never lost-updated away (the
    append-append conflict is resolvable by construction: both file
    sets are additions).  Returns the committed version."""
    d = _manifest_dir(table_path)
    os.makedirs(d, exist_ok=True)
    staged = os.path.join(d, f".staged-{uuid.uuid4().hex}.json")
    while True:
        prior = versions(table_path)
        v = (prior or [0])[-1] + 1
        carried = (
            read_manifest(table_path, prior[-1])["files"]
            if carry and prior
            else []
        )
        manifest = {
            "operation": operation,
            "version": v,
            "files": carried + entries,
        }
        with open(staged, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        try:
            os.link(staged, os.path.join(d, f"v{v}.json"))
        except FileExistsError:
            continue  # lost the race — re-resolve against the new latest
        os.unlink(staged)
        return v


def _write_data_files(df, table_path: str, n_files: int) -> list[dict]:
    """Land *df* as exactly *n_files* immutable parquet files under a
    commit-unique subdirectory of ``data/`` and return their manifest
    entries (path relative to the table root, row count, and min/max
    stats for every numeric column — the file-pruning index)."""
    from pyspark.sql import functions as F

    sub = os.path.join("data", f"snap-{uuid.uuid4().hex[:12]}")
    target = os.path.join(table_path, sub)
    df.repartition(n_files).write.parquet(target)
    files = sorted(
        f for f in os.listdir(target)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    spark = df.sparkSession
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in
        ("long", "integer", "double", "float", "short", "decimal")
    ]
    # per-file stats in ONE job keyed by input_file_name() — never a
    # Spark job per file (a real table format reads them straight from
    # the parquet footers; one grouped scan is the engine-level
    # equivalent and stays O(1) jobs however many files the commit has)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in numeric:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    by_file = {
        os.path.basename(r["_f"]): r
        for r in (
            spark.read.parquet(target)
            .groupBy(F.input_file_name().alias("_f"))
            .agg(*aggs)
            .collect()
        )
    }
    entries = []
    for name in files:
        got = by_file.get(name)
        if got is None:  # an empty part file groups to no row
            entries.append(
                {"path": os.path.join(sub, name), "rows": 0, "stats": {}}
            )
            continue
        row = got.asDict()
        row.pop("_f")
        entries.append(
            {
                "path": os.path.join(sub, name),
                "rows": row.pop("_n"),
                "stats": {k: (None if v is None else float(v))
                          for k, v in row.items()},
            }
        )
    return entries


def append(df, table_path: str, n_files: int = 2) -> int:
    """Commit *df* as new files ON TOP of the latest snapshot (the
    carried file list is resolved inside the commit's retry loop, so
    concurrent appends compose instead of lost-updating)."""
    entries = _write_data_files(df, table_path, n_files)
    return _publish_manifest(table_path, "append", entries, carry=True)


def overwrite(df, table_path: str, n_files: int = 2) -> int:
    """Commit *df* as the ENTIRE table content; prior files stay on
    disk (older snapshots remain readable) but are no longer listed."""
    entries = _write_data_files(df, table_path, n_files)
    return _publish_manifest(table_path, "overwrite", entries)


def compact(spark, table_path: str, n_files: int = 1) -> int:
    """Rewrite the latest snapshot's content as *n_files* files —
    logically a no-op (same rows), physically the small-file fix; a
    reader of any prior version is untouched (its files are
    immutable)."""
    latest = versions(table_path)[-1]
    entries = _write_data_files(read(spark, table_path, latest),
                                table_path, n_files)
    return _publish_manifest(table_path, "compact", entries)


def read(spark, table_path: str, version: int | None = None, *,
         prune: tuple[str, float, float] | None = None):
    """Scan snapshot *version* (default latest): exactly the manifest's
    files, nothing else.  ``prune=(col, lo, hi)`` drops files whose
    [min, max] range cannot intersect [lo, hi] BEFORE Spark plans the
    scan — manifest-level file pruning (the caller still applies the
    row-level filter; pruning only shrinks the file list)."""
    vs = versions(table_path)
    if not vs:
        raise ValueError(f"snapshot table {table_path} has no versions")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs} at {table_path}")
    manifest = read_manifest(table_path, v)
    entries = manifest["files"]
    if prune is not None:
        col, lo, hi = prune
        kept = []
        for e in entries:
            mn, mx = e["stats"].get(f"min_{col}"), e["stats"].get(f"max_{col}")
            if mn is None or mx is None or (mn <= hi and mx >= lo):
                kept.append(e)
        entries = kept
    if not entries:
        raise ValueError(
            f"snapshot v{v} at {table_path} has no files after pruning"
        )
    return spark.read.parquet(
        *[os.path.join(table_path, e["path"]) for e in entries]
    )


def read_changes(spark, table_path: str, from_version: int,
                 to_version: int):
    """Incremental consumption: scan ONLY the files ADDED between two
    snapshots (files are immutable, so the file-list diff IS the row
    diff for append-only chains — exact CDC without a log).  For
    chains containing overwrite/compact commits the added files may
    restate rows; callers consuming across such commits diff at the
    row level instead (orders_replica_diff is that operator).  Cost is
    proportional to the CHANGE, never the table — the property that
    makes incremental downstream jobs affordable at 100 TB."""
    if from_version >= to_version:
        raise ValueError(
            f"read_changes: need from < to, got {from_version} >= "
            f"{to_version}"
        )
    old = {e["path"] for e in read_manifest(table_path, from_version)["files"]}
    added = [
        e["path"]
        for e in read_manifest(table_path, to_version)["files"]
        if e["path"] not in old
    ]
    if not added:
        raise ValueError(
            f"read_changes: no files added between v{from_version} and "
            f"v{to_version}"
        )
    return spark.read.parquet(
        *[os.path.join(table_path, p) for p in added]
    )


def vacuum(table_path: str, keep_versions: int = 1) -> list[str]:
    """Reclaim data files referenced by NO retained snapshot: keep the
    newest *keep_versions* manifests (and their files), delete the
    rest — the retention-windowed cleanup every snapshot format pairs
    with immutable files.  Returns the deleted file paths.  The
    retained manifests stay byte-identical, so time travel within the
    retention window is unaffected; older version reads fail loudly on
    the missing manifest rather than scanning half a snapshot."""
    if keep_versions < 1:
        raise ValueError("vacuum: keep_versions must be >= 1")
    vs = versions(table_path)
    keep, drop = vs[-keep_versions:], vs[:-keep_versions]
    live = {
        e["path"] for v in keep for e in read_manifest(table_path, v)["files"]
    }
    deleted = []
    for v in drop:
        for e in read_manifest(table_path, v)["files"]:
            p = e["path"]
            if p not in live:
                full = os.path.join(table_path, p)
                if os.path.exists(full):
                    os.remove(full)
                deleted.append(p)
        os.remove(os.path.join(_manifest_dir(table_path), f"v{v}.json"))
    return sorted(set(deleted))


def append_stream_batch(df, table_path: str, batch_id: int,
                        n_files: int = 1) -> int | None:
    """Exactly-once per-epoch commit for ``writeStream.foreachBatch``:
    commit *df* as an append whose manifest RECORDS the epoch id, and
    make replays no-ops — Structured Streaming re-runs a failed epoch
    with the SAME batch_id, so idempotence of this call is what turns
    the sink's at-least-once delivery into exactly-once table state
    (the Delta/Iceberg ``txnAppId``/``txnVersion`` contract).

    Returns the committed version, or ``None`` when this epoch was
    already committed (replay) — decided BEFORE writing data files,
    and re-checked after losing a manifest race, so two concurrent
    attempts of one epoch commit exactly once."""
    def _committed() -> bool:
        # newest-first with early stop: epoch ids commit in order for a
        # stream, so the first stream-append manifest carrying a batch
        # id BELOW ours proves ours was never committed — the check
        # stays O(1) manifest reads per epoch on a long-running stream
        # instead of O(versions)
        for v in reversed(versions(table_path)):
            bid = read_manifest(table_path, v).get("batch_id")
            if bid == batch_id:
                return True
            if bid is not None and bid < batch_id:
                return False
        return False

    if _committed():
        return None
    entries = _write_data_files(df, table_path, n_files)
    d = _manifest_dir(table_path)
    os.makedirs(d, exist_ok=True)
    staged = os.path.join(d, f".staged-{uuid.uuid4().hex}.json")
    while True:
        if _committed():  # a racing replay of THIS epoch won
            if os.path.exists(staged):
                os.unlink(staged)
            return None
        # resolve carry against the CURRENT latest inside the loop: a
        # concurrent commit of a DIFFERENT epoch that wins the version
        # race must have its files carried forward on our retry, never
        # lost-updated away (the append-append conflict is resolvable
        # by construction — both file sets are additions)
        prior = versions(table_path)
        carry = read_manifest(table_path, prior[-1])["files"] if prior else []
        v = (prior or [0])[-1] + 1
        manifest = {
            "operation": "stream-append",
            "batch_id": batch_id,
            "version": v,
            "files": carry + entries,
        }
        with open(staged, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        try:
            os.link(staged, os.path.join(d, f"v{v}.json"))
        except FileExistsError:
            continue  # lost the version race — re-resolve and retry
        os.unlink(staged)
        return v
