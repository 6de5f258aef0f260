"""JSONL Python DataSource WRITER (SURVEY §2.2 K-tier, the write half
of the custom-connector story — sources/paged.py covers the read half).

The reference publishes its output with upload-then-swap semantics
(upload a fresh workbook, delete the old one only after the upload
succeeds — /root/reference/modules/report.py); the distributed
restatement of that contract is the two-phase commit every Spark file
sink implements, here spelled out on the Python DataSource writer API:

- ``write`` runs ONCE PER TASK on executors and lands rows in a
  process-unique STAGED file — a task that fails or is speculatively
  re-executed leaves only stage debris, never a visible partial
  output;
- ``commit`` runs once on the driver after every task succeeded and
  publishes all staged files with atomic renames plus a ``_SUCCESS``
  manifest carrying the per-task row counts — readers accept the
  directory only when the manifest exists, so output is all-or-
  nothing;
- ``abort`` deletes the staged files, restoring the pre-job state.

This is the same atomic-publish discipline as sources/scratch.py, but
at TASK granularity under Spark's own job/task retry machinery — at
100 TB the pattern is what object-store committers do with multipart
uploads; on a local filesystem it is rename().

Like every Python-source class in this repo, register ships the module
BY VALUE (pyspark.cloudpickle) so executor workers of an arbitrary
caller session need no --py-files.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged_path: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, field_names: list[str]):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires option('path', ...)")
        self.path = path
        self.field_names = field_names

    # -- executor side ----------------------------------------------------
    def write(self, iterator) -> _StagedFile:
        os.makedirs(os.path.join(self.path, "_staged"), exist_ok=True)
        staged = os.path.join(
            self.path, "_staged", f"part-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        dict(zip(self.field_names, row)), sort_keys=True
                    )
                    + "\n"
                )
                n += 1
        return _StagedFile(staged_path=staged, n_rows=n)

    # -- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        # part names carry a job-unique token: a second job appending to
        # the same path must never silently overwrite an earlier job's
        # files.  The manifest still describes THIS job's publish only —
        # the sink's contract is "one job lands atomically", not a
        # cross-job append ledger (that is a table format's job; at
        # 100 TB this commit is the manifest-swap primitive such a
        # format builds on).
        job = uuid.uuid4().hex[:8]
        counts = {}
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{job}-{i:05d}.jsonl")
            os.rename(m.staged_path, final)  # atomic publish per file
            counts[os.path.basename(final)] = m.n_rows
        # stage-then-rename, same discipline as the part files (ADVICE
        # r8): a driver crash mid-write must never leave a truncated
        # _SUCCESS that manifest-gated readers would crash on — an
        # unfinished publish looks unpublished, never half-published
        manifest = os.path.join(self.path, "_SUCCESS")
        staged_dir = os.path.join(self.path, "_staged")
        os.makedirs(staged_dir, exist_ok=True)  # zero-partition jobs
        staged_manifest = os.path.join(staged_dir, f"_SUCCESS-{job}")
        with open(staged_manifest, "w") as f:
            json.dump({"files": counts, "rows": sum(counts.values())}, f)
        os.rename(staged_manifest, manifest)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged_path)
            except FileNotFoundError:
                pass  # the task never got far enough to stage a file


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", p).mode("append")``
    — register with :func:`register`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(dict(self.options), schema.fieldNames())


def register(spark) -> None:
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(JsonlSinkDataSource)
