"""Orchestration layer (SURVEY §3 / /root/reference/modules/callable.py).

The reference exposes five HTTP entry points, each running one or more
export pipelines end to end (callable.py:118-156: final→quote+org,
final2→opportunity, final3→invoice+equipment+users, final4→task,
final5→report ingest). Two structural fixes over the reference:

- **shared dims, fetched once**: final3 re-fetches Users and
  Organisations inside both invoice.py:152-153 and equiment.py:127-128.
  Here the shared dimension frames are built once per run and
  ``cache()``d, so every export reuses the same in-memory copy (SURVEY
  §4 "join-input caching / reuse — trivial win").
- **upsert sink, no temp files**: each export writes straight to its
  named target via ``overwrite_by_name`` (K2 replace-else-create); the
  reference's write-to-/tmp → upload → delete dance (K3) disappears.

Inputs are plain DataFrames, so the same jobs run against any source
tier (parquet fixtures here; a REST DataSource in production).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from magshield_data_pipeline_spark import exports as E
from magshield_data_pipeline_spark import sinks

# output object names, as the reference writes them (quote.py:236,
# organisation.py:171, opportunity.py:259, task.py:270, invoice.py:208,
# equiment.py:170, users.py:139)
EXPORT_NAMES = {
    "quote": "Quotes",
    "organisation": "Organisations BRP",
    "opportunity": "Opportunities BPR",
    "task": "Tasks",
    "invoice": "Invoice History",
    "equipment": "Equipment",
    "users": "Users",
}


@dataclass
class ExportRun:
    """One orchestrated run over a set of source frames.

    ``sources`` keys (all optional): users, organisations, contacts,
    quotes, opportunities, tasks, invoices, equipment, categories,
    leads, projects, notes, pricebooks, products, state_reasons,
    stages, pricebook_entries, line_items, opportunity_links.
    An export whose required sources are absent is SKIPPED — recorded
    as ``written[key] = None``, same as the empty-extract guard — so a
    partial source set runs the exports it can feed instead of raising
    KeyError.
    """

    sources: dict[str, DataFrame]
    out_dir: str
    fmt: str = "parquet"
    written: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # shared dims: cached ONCE, reused by every export this run
        self._shared = {}
        for dim in ("users", "organisations"):
            if dim in self.sources:
                self._shared[dim] = self.sources[dim].cache()

    def dim(self, name: str) -> DataFrame:
        return self._shared.get(name, self.sources.get(name))

    def _run_if(self, key: str, required: tuple[str, ...], builder) -> str | None:
        """Skip-and-record when any required source frame is absent;
        otherwise build the export lazily and write it."""
        if any(k not in self.sources for k in required):
            self.written[key] = None
            return None
        return self._write(key, builder())

    def _write(self, key: str, df: DataFrame) -> str | None:
        # P9 existence guard: the reference skips an export when the
        # extract is empty (quote.py:87-91, organisation.py:155-158).
        # The frame is persisted around the probe so the multi-join
        # pipeline computes ONCE — isEmpty() then save() on an
        # unpersisted frame would each evaluate the whole DAG.
        df = df.persist()
        try:
            if df.isEmpty():
                self.written[key] = None
                return None
            path = sinks.overwrite_by_name(df, self.out_dir, EXPORT_NAMES[key], self.fmt)
            self.written[key] = path
            return path
        finally:
            df.unpersist()

    # --- entry points, mirroring callable.py final1..5 ---

    def run_quote_and_organisation(self) -> list[str | None]:
        """final() — quote export then organisation export
        (callable.py:118-125)."""
        s = self.sources
        return [
            self._run_if(
                "quote",
                ("quotes", "opportunities", "organisations", "contacts"),
                lambda: E.quote_export(
                    s["quotes"], s["opportunities"], self.dim("organisations"), s["contacts"]
                ),
            ),
            self._run_if(
                "organisation",
                ("organisations",),
                lambda: E.organisation_export(self.dim("organisations")),
            ),
        ]

    def run_opportunity(self) -> str | None:
        """final2() — the flagship multi-join export (callable.py:127-131)."""
        s = self.sources
        return self._run_if(
            "opportunity",
            (
                "opportunities", "organisations", "users", "pricebooks",
                "products", "state_reasons", "stages", "pricebook_entries",
                "line_items", "opportunity_links",
            ),
            lambda: E.opportunity_export(
                s["opportunities"],
                self.dim("organisations"),
                self.dim("users"),
                s["pricebooks"],
                s["products"],
                s["state_reasons"],
                s["stages"],
                s["pricebook_entries"],
                s["line_items"],
                s["opportunity_links"],
            ),
        )

    def run_invoice_equipment_users(self) -> list[str | None]:
        """final3() — three exports sharing the cached users/orgs dims
        (the reference fetches them twice — callable.py:133-144,
        invoice.py:152-153, equiment.py:127-128)."""
        s = self.sources
        return [
            self._run_if(
                "invoice",
                ("invoices", "users", "organisations"),
                lambda: E.invoice_export(
                    s["invoices"], self.dim("users"), self.dim("organisations")
                ),
            ),
            self._run_if(
                "equipment",
                ("equipment", "users", "organisations"),
                lambda: E.equipment_export(
                    s["equipment"], self.dim("users"), self.dim("organisations")
                ),
            ),
            self._run_if(
                "users", ("users",), lambda: E.users_export(self.dim("users"))
            ),
        ]

    def run_task(self) -> str | None:
        """final4() — task export with its eight lookup dims
        (callable.py:149-151)."""
        s = self.sources
        return self._run_if(
            "task",
            (
                "tasks", "categories", "users", "contacts", "leads",
                "opportunities", "organisations", "projects", "notes",
            ),
            lambda: E.task_export(
                s["tasks"],
                s["categories"],
                self.dim("users"),
                s["contacts"],
                s["leads"],
                s["opportunities"],
                self.dim("organisations"),
                s["projects"],
                s["notes"],
            ),
        )

    def run_all(self) -> dict[str, str | None]:
        self.run_quote_and_organisation()
        self.run_opportunity()
        self.run_invoice_equipment_users()
        self.run_task()
        return dict(self.written)

    def close(self) -> None:
        for df in self._shared.values():
            df.unpersist()
