"""Delta clusters mode for incremental streaming linkage: per-batch
assignment maintenance is an incremental union-find over bucketed
assign/cmembers delta logs — per-batch WRITE is proportional to the
touched components, never the corpus (full mode re-commits a
corpus-sized clusters snapshot every micro-batch), while cluster ids
keep exact batch-path parity (min record id of the component)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming import MODEL, ROWS
from zentity_spark.model import Model
from zentity_spark.storage import SnapshotStore
from zentity_spark.streaming import (
    current_assignments,
    incremental_resolve,
    read_turn_stream,
)

TURN_SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
               " tool string, ts string")


def test_delta_mode_matches_batch(spark, tmp_path):
    """4 micro-batches incl. a cross-batch transitive merge and a
    valueless filler batch: the materialized delta view must equal the
    batch pipeline's (record_id, cluster_id) EXACTLY (ids, not just
    partitions)."""
    from zentity_spark.pipeline import ResolutionConfig, resolve_all

    df = spark.createDataFrame(list(ROWS), TURN_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    filler = spark.createDataFrame(
        [("f1", 0, "assistant", "nothing to extract", None,
          "2024-01-02 00:00:00")], TURN_SCHEMA
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    in_dir = str(tmp_path / "in")
    for group in (["c1"], ["c2", "c3"], ["c4", "c5"], ["c6"]):
        (df.where(F.col("conv_id").isin(group)).coalesce(1)
         .write.mode("append").parquet(in_dir))
    filler.coalesce(1).write.mode("append").parquet(in_dir)

    out_root = str(tmp_path / "inc")
    stream = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    q = incremental_resolve(spark, stream, Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"),
                            clusters_mode="delta")
    q.awaitTermination(300)

    store = SnapshotStore(out_root)
    got = {
        (r["record_id"], r["cluster_id"])
        for r in current_assignments(spark, store).collect()
    }
    batch = resolve_all(spark, df, Model(MODEL),
                        ResolutionConfig(entity_closure=False))
    expect = {
        (r["record_id"], r["cluster_id"]) for r in batch.clusters.collect()
    }
    assert got == expect
    # the delta-mode marker replaces the per-batch corpus snapshot
    assert store.latest("clusters") is None
    for i in range(5):
        assert store.contains_fingerprint("batch_done", f"batch-{i}")


def test_delta_write_is_touched_proportional(spark, tmp_path):
    """After an 80-record committed corpus, a 2-record batch (one record
    linking into an existing singleton, one fresh singleton) must write
    exactly 2 assign delta rows — not re-commit 82 assignments — and the
    merge must land on the min-record-id root."""
    corpus = [
        (f"big{i}", 0, "user", f"key={i}", None, "2024-01-01 00:00:00")
        for i in range(80)
    ]
    small = [
        ("new1", 0, "user", "key=3", None, "2024-01-02 00:00:00"),
        ("new2", 0, "user", "key=999", None, "2024-01-02 00:00:00"),
    ]
    in_dir = str(tmp_path / "in")
    df_a = spark.createDataFrame(corpus, TURN_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    df_b = spark.createDataFrame(small, TURN_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    df_a.coalesce(1).write.parquet(in_dir, mode="overwrite")
    df_b.coalesce(1).write.mode("append").parquet(in_dir)

    out_root = str(tmp_path / "inc")
    stream = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    q = incremental_resolve(spark, stream, Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"),
                            clusters_mode="delta")
    q.awaitTermination(300)

    store = SnapshotStore(out_root)
    by_fp = {
        s["fingerprint"]: s["rows"]
        for s in store.snapshots("assign", include_replaced=True)
        if s["fingerprint"].startswith("batch-")
    }
    assert by_fp["batch-0"] == 80
    assert by_fp["batch-1"] == 2  # new1 + new2 only, corpus untouched
    am = {r["batch_id"]: r for r in
          store.read_all(spark, "assign_metrics").collect()}
    assert am[max(am)]["delta_rows"] == 2
    # pruned read: the small batch consulted only its touched buckets
    assert am[max(am)]["assign_scan_rows"] <= 80 * 0.25

    cur = {r["record_id"]: r["cluster_id"]
           for r in current_assignments(spark, store).collect()}
    assert len(cur) == 82
    assert cur["new1"] == "big3" and cur["big3"] == "big3"  # min-id root
    assert cur["new2"] == "new2"
    assert sum(1 for v in cur.values() if v == "big3") == 2


def _drop_manifest(store, table, fingerprint):
    import json
    import os

    snap_dir = os.path.join(store.root, table, "snapshots")
    for fn in os.listdir(snap_dir):
        if not fn.endswith(".json"):
            continue
        path = os.path.join(snap_dir, fn)
        with open(path) as fh:
            if json.load(fh).get("fingerprint") == fingerprint:
                os.unlink(path)
                return True
    return False


def test_delta_crash_between_cmembers_and_assign(spark, tmp_path):
    """The delta commit protocol's crash window: cmembers committed,
    assign (and everything after) not. Replay must recompute the SAME
    delta — and afterwards the reverse-index invariant must hold: every
    current member of a live cluster has a cmembers row under that id
    (a violation here silently loses members from FUTURE merges)."""
    rows = [
        ("a1", 0, "user", "key=1", None, "2024-01-01 00:00:00"),
        ("a2", 0, "user", "key=1", None, "2024-01-01 00:00:01"),
        ("b1", 0, "user", "key=2", None, "2024-01-01 00:00:02"),
        # batch 2: b1 bridges into {a1,a2} via a shared key
        ("c1", 0, "user", "key=1", None, "2024-01-02 00:00:00"),
        ("c1", 1, "user", "key=2", None, "2024-01-02 00:00:01"),
        # batch 3 (post-recovery): merges into the same component —
        # correctness depends on cmembers rows written during recovery
        ("d1", 0, "user", "key=2", None, "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(rows, TURN_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    in_dir = str(tmp_path / "in")
    for group in (["a1", "a2", "b1"], ["c1"]):
        (df.where(F.col("conv_id").isin(group)).coalesce(1)
         .write.mode("append").parquet(in_dir))

    out_root = str(tmp_path / "inc")
    stream = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    q = incremental_resolve(spark, stream, Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"),
                            clusters_mode="delta")
    q.awaitTermination(300)

    store = SnapshotStore(out_root)
    # simulate the crash: batch-1 ran through the cmembers commit only
    for table in ("assign", "assign_metrics", "stream_metrics", "batch_done"):
        assert _drop_manifest(store, table, "batch-1"), table
    assert store.contains_fingerprint("cmembers", "batch-1")

    # recovery replay (fresh checkpoint) + the post-recovery batch 3
    (df.where(F.col("conv_id") == "d1").coalesce(1)
     .write.mode("append").parquet(in_dir))
    stream2 = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    q2 = incremental_resolve(spark, stream2, Model(MODEL), out_root,
                             checkpoint_dir=str(tmp_path / "ck2"),
                             clusters_mode="delta",
                             # deliberate replay of the same input via a
                             # fresh checkpoint — the lineage guard
                             # rightly rejects this without the sanction
                             rebind_checkpoint=True)
    q2.awaitTermination(300)

    cur = {r["record_id"]: r["cluster_id"]
           for r in current_assignments(spark, store).collect()}
    assert cur == {k: "a1" for k in ("a1", "a2", "b1", "c1", "d1")}
    # invariant (a): every current member has a cmembers row under its
    # current cluster id
    members = {
        (r["cluster_id"], r["record_id"])
        for r in store.read_all(spark, "cmembers")
        .select("cluster_id", "record_id").collect()
    }
    for rec, cid in cur.items():
        assert (cid, rec) in members, (rec, cid)
