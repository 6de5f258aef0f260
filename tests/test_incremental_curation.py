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


def test_epoch2_kills_come_only_from_index_evolution(spark):
    from magshield_data_pipeline_spark.plans.curation_queries import (
        _INC2_OFF,
        inc_cur2_epoch_frames,
    )

    fr = inc_cur2_epoch_frames(spark, SF_SMALL)
    fluent, uniq, novel = _ids(fr["fluent"]), _ids(fr["uniq"]), _ids(fr["novel"])

    def cls(ids, lo):
        return {i for i in ids if lo <= i < lo + 1_000_000}

    # +12M byte-exact copies of epoch-1 NOVEL texts (absent from the
    # corpus): reach dedup, and the kill can only come from the
    # fingerprints epoch 1 APPENDED to the index table
    fp2 = cls(fluent, _INC2_OFF["fp2"])
    assert fp2, "no evolved-fp clone reached dedup — no teeth"
    assert len(cls(uniq, _INC2_OFF["fp2"])) < len(fp2)
    # +11M near-dups of epoch-1 novel docs: survive every exact stage,
    # some die ONLY at the buckets epoch 1 appended
    lsh2_uniq = cls(uniq, _INC2_OFF["lsh2"])
    assert lsh2_uniq, "no evolved-LSH near-dup survived exact — no teeth"
    assert len(cls(novel, _INC2_OFF["lsh2"])) < len(lsh2_uniq)
    # fresh docs flow through to the commit
    assert cls(novel, _INC2_OFF["fresh2"])


def test_epoch2_replay_is_exactly_once_and_version_pinned(spark):
    fn = QUERY_REGISTRY["incremental_curation_epoch2"].fn
    first = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    second = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    # idempotent even though the query itself evolves the index with
    # epoch 2's fingerprints: the epoch probes the index AT ITS BASE
    # VERSION (v2), so a replay cannot anti-join its own output, and
    # all three batch-2 commits are exactly-once
    assert first == second
    from magshield_data_pipeline_spark.plans.curation_queries import (
        _inc2_paths,
    )

    p = _inc2_paths(SF_SMALL)
    for tbl in ("curated", "fp_tbl", "lsh_tbl"):
        assert SN.versions(p[tbl]) == [1, 2, 3], tbl
        assert SN.read_manifest(p[tbl], 3)["batch_id"] == 2, tbl
    # the ledger rows really are corpus + novel1 + novel2
    assert first["curated_total"][0] == first["index_fps"][0]


def test_index_maintenance_preserves_epoch_exactly_once(spark, tmp_path):
    # integration of the round's pieces: after epoch 2, run the
    # MAINTENANCE pass a production table needs — compact the evolved
    # fingerprint index and vacuum old versions — then replay epoch 2.
    # Vacuum drops the stream-append manifests that recorded batch 2,
    # so the replay's no-op now rests ENTIRELY on the durable
    # high-water file (ADVICE r9 medium); the table content and the
    # funnel must be byte-stable through maintenance + replay.
    from magshield_data_pipeline_spark.plans.curation_queries import (
        _inc2_paths,
    )

    import shutil

    fn = QUERY_REGISTRY["incremental_curation_epoch2"].fn
    before = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    assert before["index_fps"] == before["curated_total"]
    p = _inc2_paths(SF_SMALL)
    # maintenance MUTATES the table (vacuum drops versions) — run it on
    # a COPY so the shared write-once scratch keeps serving the
    # registered query (which probes the index at version 2)
    fp_tbl = str(tmp_path / "fp_tbl_copy")
    shutil.copytree(p["fp_tbl"], fp_tbl)
    n_before = SN.read(spark, fp_tbl).count()
    SN.compact(spark, fp_tbl, n_files=1)          # v4: one file
    dropped = SN.vacuum(fp_tbl, keep_versions=1)  # only v4 retained
    assert dropped  # the pre-compaction files really were reclaimed
    assert SN.versions(fp_tbl) == [4]
    assert SN.read(spark, fp_tbl).count() == n_before
    # epoch-2 replay after vacuum: batch 2's manifests are gone, the
    # high-water file must still prove the epoch committed
    assert SN.append_stream_batch(
        SN.read(spark, fp_tbl).limit(1), fp_tbl, batch_id=2
    ) is None
    assert SN.versions(fp_tbl) == [4]


def test_model_refresh_changes_decisions(spark):
    # the refresh must be decision-load-bearing, not a recount: v2
    # learned grams v1 never saw (epoch 1's reversed/café texts) and
    # some epoch-2 gate verdicts flip under the refreshed model+totals
    rows = {
        r.stage: (r.n_items, r.metric)
        for r in QUERY_REGISTRY["curation_model_refresh"]
        .fn(spark, SF_SMALL).collect()
    }
    assert rows["new_grams"][0] > 0
    assert rows["gate_flips"][0] > 0
    assert rows["model_v2"][1] > rows["model_v1"][1]  # strictly more mass


def test_retraction_epoch_acts_and_replays_exactly_once(spark):
    # VERDICT r10 item 1: the flip audit must ACT — flip-to-reject docs
    # genuinely leave the curated ledger, flip-to-pass docs are
    # re-admitted through the evolved-index dedup chain, and a replayed
    # retraction is a no-op at both commits
    from magshield_data_pipeline_spark.plans.curation_queries import (
        _retract_paths,
        retraction_frames,
    )

    fn = QUERY_REGISTRY["curation_retraction_epoch"].fn
    first = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    rt = _retract_paths(SF_SMALL)["curated_tbl"]
    vs = SN.versions(rt)
    assert vs == [1, 2, 3]  # base, delete commit, admit append
    assert SN.read_manifest(rt, 2)["operation"] == "delete"
    assert SN.read_manifest(rt, 3)["operation"] == "stream-append"
    # teeth: both directions decision-load-bearing
    base, retr = first["curated_base"], first["retracted"]
    adm, final = first["admitted"], first["curated_final"]
    assert retr[0] > 0, "no doc flipped to reject — retraction has no teeth"
    assert adm[0] > 0, "no doc re-admitted — admit pass has no teeth"
    assert final[0] == base[0] - retr[0] + adm[0]
    assert final[1] == base[1] - retr[1] + adm[1]
    # the ledger really lost the retracted rows (not just the funnel)
    assert SN.read(spark, rt).count() == final[0]
    # snapshot isolation: a reader pinned pre-retraction still sees all
    assert SN.read(spark, rt, 1).count() == base[0]
    # replay: identical output, NO new ledger versions
    second = {r.stage: (r.n_docs, r.id_sum) for r in fn(spark, SF_SMALL).collect()}
    assert first == second
    assert SN.versions(rt) == vs
    # the admit set passed through the dedup chain: it can never exceed
    # the flip-to-pass candidates (strictly fewer when a candidate is a
    # dup of an evolved-index doc — holds at sf>=0.01; at sf0.001 the
    # candidates happen to all be fresh)
    fr = retraction_frames(spark, SF_SMALL)
    assert adm[0] <= fr["fcand"].count()
    # retracted docs were all curated; admitted docs never were
    retracted_ids = _ids(fr["retract"])
    assert retracted_ids <= _ids(SN.read(spark, rt, 1))
    assert not (_ids(fr["admit"]) & _ids(SN.read(spark, rt, 1)))


def test_advisory_bytes_parses_spark_suffix_forms(spark):
    """ADVICE r12 (medium): '16KB'-style two-letter suffixes crashed
    _advisory_bytes with ValueError (the trailing 'b' matched the unit
    table, leaving int('16k')).  Pin every form Spark itself accepts."""
    from magshield_data_pipeline_spark.plans.curation_queries import (
        _advisory_bytes,
    )

    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    saved = spark.conf.get(key, None)
    try:
        for raw, want in [
            ("64m", 64 << 20), ("16KB", 16 << 10), ("256k", 256 << 10),
            ("1g", 1 << 30), ("2GB", 2 << 30), ("1048576", 1 << 20),
            ("512b", 512), ("1t", 1 << 40),
        ]:
            spark.conf.set(key, raw)
            assert _advisory_bytes(spark) == want, raw
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
