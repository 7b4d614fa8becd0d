"""Checkpoint/resume semantics (north_rule: resumable from last committed
snapshot per stage, with per-partition lineage metrics)."""

import json
import os
import shutil

import pytest

from tests.conftest import load_reference_model
from tests.fixture_data import fixture_transcripts
from zentity_spark.model import Model
from zentity_spark.pipeline import ResolutionConfig, resolve_all_checkpointed
from zentity_spark.storage import SnapshotStore


@pytest.fixture()
def out_root(tmp_path):
    return str(tmp_path / "warehouse")


def _model():
    m = Model(load_reference_model("TestEntityModelA.json"))
    m.prune(
        {"include": {"indices": ["zentity_test_index_a", "zentity_test_index_b",
                                 "zentity_test_index_c"],
                     "resolvers": ["resolver_a", "resolver_b"]}}
    )
    return m


def test_stage_commits_and_metrics(spark, out_root):
    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_[abc]/"))
    res = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc"
    )
    store = SnapshotStore(out_root)
    for stage in ("records", "pairs", "edges", "clusters"):
        snap = store.latest(stage)
        assert snap is not None and snap["rows"] > 0
        assert not res["stages"][stage].get("resumed")
    # lineage metrics: one commit per computed stage, rows per partition
    metrics = store.read_all(spark, "metrics")
    assert metrics is not None
    rows = metrics.collect()
    assert {r["stage"] for r in rows} >= {"records", "pairs", "clusters"}
    assert all(r["rows"] > 0 for r in rows)
    assert all(r["run_id"] == res["run_id"] for r in rows)


def test_resume_from_snapshots(spark, out_root):
    """Second run with identical input/config resumes every stage."""
    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_[abc]/"))
    first = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc"
    )
    second = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc"
    )
    for stage in ("records", "pairs", "edges", "clusters"):
        assert second["stages"][stage].get("resumed"), f"{stage} not resumed"
    a = sorted(map(tuple, first["clusters"].collect()))
    b = sorted(map(tuple, second["clusters"].collect()))
    assert a == b


def test_resume_after_partial_crash(spark, out_root):
    """Kill/resume: wipe the clusters stage (simulating a crash before its
    commit); rerun recomputes ONLY clusters, resuming earlier stages."""
    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_[abc]/"))
    first = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc"
    )
    a = sorted(map(tuple, first["clusters"].collect()))
    shutil.rmtree(os.path.join(out_root, "clusters"))
    second = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc"
    )
    assert second["stages"]["records"].get("resumed")
    assert second["stages"]["pairs"].get("resumed")
    assert not second["stages"]["clusters"].get("resumed")
    b = sorted(map(tuple, second["clusters"].collect()))
    assert a == b


def test_config_change_invalidates(spark, out_root):
    """A changed fingerprint (different config) must NOT resume."""
    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_[abc]/"))
    resolve_all_checkpointed(spark, turns, _model(), out_root, input_token="fixture-abc")
    second = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc",
        config=ResolutionConfig(max_block_size=123),
    )
    assert not second["stages"]["records"].get("resumed")


def test_crash_consistency_orphan_data(spark, out_root):
    """Data written without a manifest (crash between write and commit)
    must be invisible to readers."""
    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_a/"))
    store = SnapshotStore(out_root)
    # simulate orphan: data dir exists, no snapshot manifest
    df = turns.limit(5)
    df.write.mode("overwrite").parquet(os.path.join(out_root, "ghost", "data", "dead"))
    assert store.latest("ghost") is None
    assert store.read(spark, "ghost") is None


def test_candidates_stage_and_key_cap_lineage(spark, out_root):
    """Round 2: candidates are a committed stage (blocking runs once per
    run) and the max_keys_per_record truncation leaves a lineage row."""
    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_[abc]/"))
    res = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc",
        config=ResolutionConfig(entity_closure=False, max_keys_per_record=2),
    )
    store = SnapshotStore(out_root)
    assert store.latest("candidates") is not None
    metrics = store.read_all(spark, "metrics")
    stages = {r["stage"] for r in metrics.collect()}
    assert "blocking.key_capped" in stages  # cap=2 must truncate somebody
    second = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc",
        config=ResolutionConfig(entity_closure=False, max_keys_per_record=2),
    )
    assert second["stages"]["candidates"].get("resumed")


def test_checkpointed_closure_matches_batch(spark, out_root):
    """entity_closure in the checkpointed path must produce the same
    clusters as resolve_all with closure (it was silently skipped before
    round 2)."""
    from zentity_spark.pipeline import resolve_all

    turns = fixture_transcripts(spark)
    turns = turns.where(turns.conv_id.rlike("^zentity_test_index_[abc]/"))
    cfg = ResolutionConfig(entity_closure=True)
    res = resolve_all_checkpointed(
        spark, turns, _model(), out_root, input_token="fixture-abc", config=cfg
    )
    assert "clusters_closed" in res["stages"]
    batch = resolve_all(spark, turns, _model(), cfg)
    a = sorted(map(tuple, res["clusters"].collect()))
    b = sorted(map(tuple, batch.clusters.collect()))
    assert a == b
