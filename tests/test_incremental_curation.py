"""Incremental curation over the snapshot ledger (VERDICT r9 item 1):
stage teeth — every planted variant class is killed at EXACTLY the
stage it was planted for — and exactly-once epoch replay semantics
(plans/curation_queries.py::incremental_curation_epoch)."""

from __future__ import annotations

from magshield_data_pipeline_spark.plans.curation_queries import (
    inc_cur_epoch_frames,
)
from magshield_data_pipeline_spark.plans.registry import QUERY_REGISTRY
from magshield_data_pipeline_spark.sources import snapshots as SN
from tests.conftest import SF_SMALL


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_each_variant_class_dies_at_its_stage(spark):
    fr = inc_cur_epoch_frames(spark, SF_SMALL)
    fluent, uniq, novel = _ids(fr["fluent"]), _ids(fr["uniq"]), _ids(fr["novel"])

    def cls(ids, lo):
        return {i for i in ids if lo <= i < lo + 1_000_000}

    # +2M exact corpus clones: reach the dedup stage, none survive the
    # fingerprint anti-join vs the materialized corpus index
    assert cls(fluent, 2_000_000), "no exact clone reached dedup — no teeth"
    assert not cls(uniq, 2_000_000)
    # +4M decomposed NFC twins: byte-distinct from their +3M
    # precomposed twins, NFC-identical — the +4M side must die at the
    # intra-batch exact stage (min-struct keeps the lower id), which
    # only happens if NFC ran before fingerprinting
    both = {
        i - 3_000_000
        for i in cls(fluent, 3_000_000)
        if i + 1_000_000 in cls(fluent, 4_000_000)
    }
    assert both, "no NFC pair survived to dedup — no teeth"
    assert not cls(uniq, 4_000_000)
    assert {i + 3_000_000 for i in both} <= cls(uniq, 3_000_000)
    # +6M intra-batch clones of the +1M fresh variants: same rule
    twins = {
        i - 6_000_000
        for i in cls(fluent, 6_000_000)
        if i - 5_000_000 in cls(fluent, 1_000_000)
    }
    assert twins, "no intra clone reached dedup — no teeth"
    assert not cls(uniq, 6_000_000)
    # +5M corpus near-dups: survive every exact stage, die ONLY at the
    # materialized LSH bucket probe
    assert cls(uniq, 5_000_000), "no near-dup survived exact — no teeth"
    assert not cls(novel, 5_000_000)
    # and fresh docs genuinely flow through to the commit
    assert cls(novel, 1_000_000)


def test_epoch_replay_is_exactly_once(spark):
    fn = QUERY_REGISTRY["incremental_curation_epoch"].fn
    first = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    second = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    # the second run replays epoch 1 against the committed curated
    # table: the append is a no-op and every funnel row is identical —
    # in particular curated_total did NOT grow
    assert first == second
    fr = inc_cur_epoch_frames(spark, SF_SMALL)
    curated = fr["paths"]["curated"]
    assert SN.versions(curated) == [1, 2]  # corpus baseline + ONE epoch
    assert SN.read_manifest(curated, 2)["batch_id"] == 1
    # the funnel's ledger row equals corpus + novel exactly
    n_corpus = SN.read(spark, curated, 1).count()
    assert first["curated_total"][0] == n_corpus + first["novel"][0]
