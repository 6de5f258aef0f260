"""Orchestration tests (jobs.py): all exports run end to end against
one set of sources, shared dims are cached and reused, outputs land
under their reference names."""

from __future__ import annotations

import pytest

from magshield_data_pipeline_spark import jobs, schemas as SCH


@pytest.fixture()
def sources(spark):
    def df(rows, schema):
        return spark.createDataFrame(rows, schema=schema)

    return {
        "users": df([{"USER_ID": 1, "FIRST_NAME": "Ann", "LAST_NAME": "Lee"}], SCH.USER_SCHEMA),
        "organisations": df(
            [{"ORGANISATION_ID": 5, "ORGANISATION_NAME": "OrgA",
              "CUSTOMFIELDS": [("Region__c", "NA")], "LINKS": [("Contact", 10)]}],
            SCH.ORGANISATION_SCHEMA,
        ),
        "contacts": df([{"CONTACT_ID": 10, "FIRST_NAME": "Cal", "LAST_NAME": "One"}], SCH.CONTACT_SCHEMA),
        "quotes": df(
            [{"QUOTE_ID": 1, "ORGANISATION_ID": 5, "OPPORTUNITY_ID": 100,
              "CUSTOMFIELDS": []}],
            SCH.QUOTATION_SCHEMA,
        ),
        "opportunities": df(
            [{"OPPORTUNITY_ID": 100, "OPPORTUNITY_NAME": "Opp", "ORGANISATION_ID": 5,
              "OWNER_USER_ID": 1, "OPPORTUNITY_STATE": "WON", "CUSTOMFIELDS": []}],
            SCH.OPPORTUNITY_SCHEMA,
        ),
        "tasks": df(
            [{"TASK_ID": 7, "STATUS": "OPEN", "OWNER_USER_ID": 1,
              "LINKS": [("Opportunity", 100)]}],
            SCH.TASK_SCHEMA,
        ),
        "invoices": df(
            [{"RECORD_ID": 11, "RECORD_NAME": "INV", "OWNER_USER_ID": 1,
              "CUSTOMFIELDS": [("Invoiced_Organization__c", "5")]}],
            SCH.INVOICE_SCHEMA,
        ),
        "equipment": df(
            [{"RECORD_ID": 21, "RECORD_NAME": "EQ", "OWNER_USER_ID": 1,
              "CUSTOMFIELDS": []}],
            SCH.EQUIPMENT_SCHEMA,
        ),
        "categories": df([{"CATEGORY_ID": 3, "CATEGORY_NAME": "Call"}], SCH.TASK_CATEGORY_SCHEMA),
        "leads": df([{"LEAD_ID": 40, "FIRST_NAME": "Lu", "LAST_NAME": "L"}], SCH.LEAD_SCHEMA),
        "projects": df([{"PROJECT_ID": 70, "PROJECT_NAME": "P"}], SCH.PROJECT_SCHEMA),
        "notes": df([{"NOTE_ID": 80, "TITLE": "N"}], SCH.NOTE_SCHEMA),
        "pricebooks": df([{"PRICEBOOK_ID": 60, "NAME": "PB"}], SCH.PRICEBOOK_SCHEMA),
        "products": df([{"PRODUCT_ID": 900, "PRODUCT_FAMILY": "Fam"}], SCH.PRODUCT_SCHEMA),
        "state_reasons": df([{"STATE_REASON_ID": 70, "STATE_REASON": "R"}],
                            SCH.OPPORTUNITY_STATE_REASON_SCHEMA),
        "stages": df([{"STAGE_ID": 50, "STAGE_NAME": "S"}], SCH.PIPELINE_STAGE_SCHEMA),
        "pricebook_entries": df([{"PRICEBOOK_ENTRY_ID": 800, "PRODUCT_ID": 900}],
                                SCH.PRICEBOOK_ENTRY_SCHEMA),
        "line_items": df([{"OPPORTUNITY_ID": 100, "PRICEBOOK_ENTRY_ID": 800}],
                         SCH.OPPORTUNITY_LINE_ITEM_SCHEMA),
        "opportunity_links": df(
            [{"OBJECT_NAME": "Opportunity", "OBJECT_ID": 100,
              "LINK_OBJECT_NAME": "Organisation", "LINK_OBJECT_ID": 5}],
            SCH.OPPORTUNITY_LINK_SCHEMA,
        ),
    }


def test_run_all_exports(spark, sources, tmp_path):
    run = jobs.ExportRun(sources, str(tmp_path))
    written = run.run_all()
    assert set(written) == set(jobs.EXPORT_NAMES)
    # every output is a readable parquet object under its reference name
    for key, path in written.items():
        out = spark.read.parquet(path)
        assert out.count() >= 1, key
    # spot checks across pipelines
    quotes = spark.read.parquet(written["quote"])
    assert "Sales Person Id" in quotes.columns
    tasks = spark.read.parquet(written["task"])
    [t] = tasks.collect()
    assert t["Linked Opportunity"] == "Opp"
    assert t["Linked Organization"] == "OrgA"  # backfill through opp's org
    run.close()


def test_shared_dims_cached_once(spark, sources, tmp_path):
    run = jobs.ExportRun(sources, str(tmp_path))
    assert run.dim("users").storageLevel.useMemory  # cached
    assert run.dim("users") is run.dim("users")  # same frame reused
    run.run_invoice_equipment_users()
    run.close()
    assert not run.dim("users").storageLevel.useMemory  # unpersisted


def test_overwrite_semantics_between_runs(spark, sources, tmp_path):
    first = jobs.ExportRun(sources, str(tmp_path))
    p1 = first.run_task()
    n1 = spark.read.parquet(p1).count()
    first.close()
    second = jobs.ExportRun(sources, str(tmp_path))
    p2 = second.run_task()
    second.close()
    assert p1 == p2
    assert spark.read.parquet(p2).count() == n1  # replaced, not appended


def test_empty_export_skipped(spark, sources, tmp_path):
    import os
    empty = dict(sources)
    empty["tasks"] = sources["tasks"].filter("TASK_ID < 0")
    run = jobs.ExportRun(empty, str(tmp_path))
    assert run.run_task() is None  # P9: empty extract → no file written
    assert run.written["task"] is None
    assert not os.path.exists(str(tmp_path / jobs.EXPORT_NAMES["task"]))
    run.close()


def test_partial_sources_skip_instead_of_raise(spark, sources, tmp_path):
    # only organisations provided: the organisation export runs, every
    # export missing a required source is recorded as skipped (None)
    run = jobs.ExportRun({"organisations": sources["organisations"]}, str(tmp_path))
    written = run.run_all()
    assert written["organisation"] is not None
    assert spark.read.parquet(written["organisation"]).count() == 1
    skipped = {k for k, v in written.items() if v is None}
    assert skipped == set(jobs.EXPORT_NAMES) - {"organisation"}
    run.close()


def test_crm_consolidation_composition(spark):
    # end-to-end composition of the r5 components on the reference's
    # core story: ingest a dirty contact batch → DQ gate + quarantine →
    # entity-resolve survivors against the master → emit matched pairs.
    # Each stage is the already-tested operator; this proves they chain.
    import pyspark.sql.functions as F

    from magshield_data_pipeline_spark.operators import linkage as L
    from magshield_data_pipeline_spark.operators import quality as Q

    master = spark.createDataFrame(
        [(1, "Acme Corp 001"), (2, "Globex 002"), (3, "Initech 003")],
        "id long, name string",
    )
    batch = spark.createDataFrame(
        [
            (10, "Acme Xorp 001", 5.0),    # typo; should match 1
            (11, "Globex 002", -1.0),      # DQ violation: negative amount
            (12, None, 3.0),               # DQ violation: null name
            (13, "Initech 003", 7.0),      # clean exact match
        ],
        "id long, name string, amount double",
    )
    rules = {
        "name_present": F.col("name").isNotNull(),
        "amount_pos": F.col("amount") > 0,
    }
    quarantined = Q.dq_quarantine(batch, rules)
    q_ids = {r["id"] for r in quarantined.collect()}
    assert q_ids == {11, 12}

    clean = batch.join(quarantined.select("id"), "id", "left_anti")
    pairs = L.link_candidates(
        clean.select("id", "name"),
        master,
        block_key=F.substring(F.col("name"), -3, 3),
        threshold=0.8,
    )
    matches = {r["dirty_id"]: r["matched_id"] for r in L.best_match(pairs).collect()}
    assert matches == {10: 1, 13: 3}

    # the gate report agrees with the quarantine split
    report = {
        r["rule"]: r["n_violations"]
        for r in Q.dq_violation_counts(batch, rules).collect()
    }
    assert report == {"name_present": 1, "amount_pos": 1}
