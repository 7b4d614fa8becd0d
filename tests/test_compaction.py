"""Snapshot compaction + logarithmic merge maintenance (Iceberg
rewrite_data_files / expire_snapshots semantics over the SnapshotStore):
long-running streams append one snapshot per micro-batch, so append
tables need maintenance that bounds live snapshots while preserving
rows, fingerprint witnesses (replay idempotence), and bucket layout.
Policy is Bentley–Saxe logarithmic merging — periodic FULL rewrites
would cost amortized O(corpus) per batch; the geometric invariant costs
O(log) amortized rewrites per row (PLANS.md rule 15)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.test_streaming import MODEL, ROWS
from zentity_spark.model import Model
from zentity_spark.storage import SnapshotStore


def _commit_n(spark, store, table, tag, n, start=0):
    df = spark.createDataFrame(
        [(f"{tag}-{start + j}", (start + j) % 3) for j in range(n)],
        "record_id string, rb int",
    )
    return store.commit(df, table, stage=table, fingerprint=tag,
                        partition_by=["rb"])


def test_compact_append_table(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "wh"))
    for i in range(3):
        _commit_n(spark, store, "t", f"fp-{i}", 4, start=4 * i)
    before = {tuple(r) for r in store.read_all(spark, "t").collect()}
    old_dirs = [s["data_path"] for s in store.snapshots("t")]

    manifest = store.compact(spark, "t", partition_by=["rb"])
    assert manifest is not None and manifest["stage"] == "compact"

    live = store.snapshots("t")
    assert len(live) == 1 and live[0]["snapshot_id"] == manifest["snapshot_id"]
    after = {tuple(r) for r in store.read_all(spark, "t").collect()}
    assert after == before and len(after) == 12
    # replaced data dirs expired; manifests remain as fingerprint history
    assert all(not os.path.isdir(p) for p in old_dirs)
    for i in range(3):
        assert store.contains_fingerprint("t", f"fp-{i}")
        assert store.latest("t", fingerprint=f"fp-{i}") is None  # hidden
    # bucket layout preserved for partition-pruned readers
    assert os.path.isdir(os.path.join(manifest["data_path"], "rb=1"))

    # a fresh commit after compaction must not clobber manifest numbering
    m2 = _commit_n(spark, store, "t", "fp-3", 1, start=90)
    assert m2["sequence"] > manifest["sequence"]
    assert {tuple(r) for r in store.read_all(spark, "t").collect()} == (
        after | {("fp-3-90", 0)}
    )
    # nothing to do below the snapshot floor
    assert store.compact(spark, "u") is None


def test_maintain_logarithmic_growth(spark, tmp_path):
    """Equal-size appends with per-append maintenance: live snapshot
    count stays logarithmic (binary-counter growth), rows and
    fingerprints are never lost, empty snapshots merge away too."""
    store = SnapshotStore(str(tmp_path / "wh"))
    live_counts = []
    for i in range(8):
        _commit_n(spark, store, "t", f"b-{i}", 2, start=2 * i)
        store.maintain(spark, "t", partition_by=["rb"])
        live_counts.append(len(store.snapshots("t")))
    # 8 equal appends: strictly fewer live snapshots than appends, never
    # more than ~log2 + slack (the geometric invariant's worst case)
    assert max(live_counts) <= 4 and live_counts[-1] <= 4
    rows = {tuple(r) for r in store.read_all(spark, "t").collect()}
    assert len(rows) == 16
    for i in range(8):
        assert store.contains_fingerprint("t", f"b-{i}")
    # the invariant holds at the end: each live snapshot >= sum of later
    live = store.snapshots("t")
    for i in range(len(live) - 1):
        assert live[i]["rows"] >= sum(s["rows"] for s in live[i + 1:])

    # zero-row snapshots must not accumulate unboundedly
    empty = spark.createDataFrame([], "record_id string, rb int")
    for i in range(4):
        store.commit(empty, "z", stage="z", fingerprint=f"e-{i}",
                     partition_by=["rb"])
        store.maintain(spark, "z", partition_by=["rb"])
    assert len(store.snapshots("z")) <= 2


def test_incremental_resolve_with_maintenance(spark, tmp_path):
    """maintain_every=1 exercises mid-stream maintenance over 4
    micro-batches: clusters match the linkage expectation, merging
    actually happened, and a replayed stream (fresh checkpoint, same
    store) re-appends nothing because fingerprint witnesses survive
    compaction."""
    from zentity_spark.streaming import incremental_resolve, read_turn_stream

    # four files -> four micro-batches under maxFilesPerTrigger=1
    df = spark.createDataFrame(
        list(ROWS),
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    in_dir = str(tmp_path / "in")
    for group in (["c1"], ["c2", "c3"], ["c4", "c5"], ["c6"]):
        (df.where(F.col("conv_id").isin(group)).coalesce(1)
         .write.mode("append").parquet(in_dir))

    out_root = str(tmp_path / "inc")
    stream = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    q = incremental_resolve(spark, stream, Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"),
                            maintain_every=1)
    q.awaitTermination(300)

    store = SnapshotStore(out_root)
    hist = store.snapshots("values", include_replaced=True)
    assert {s["fingerprint"] for s in hist} >= {f"batch-{i}" for i in range(4)}
    assert any(s["stage"] == "compact" for s in hist)  # merging happened
    assert len(store.snapshots("values")) < 4
    for i in range(4):
        assert store.contains_fingerprint("values", f"batch-{i}")

    clusters = store.read(spark, "clusters")
    got = {
        frozenset(g["ids"])
        for g in clusters.groupBy("cluster_id")
        .agg(F.collect_set("record_id").alias("ids")).collect()
    }
    assert got == {frozenset({"c1", "c2", "c3"}), frozenset({"c4", "c5"}),
                   frozenset({"c6"})}

    # clusters is an overwrite table: ONE live snapshot, prior batches'
    # corpus-sized data dirs expired, fingerprints witnessed
    live_clusters = store.snapshots("clusters")
    assert len(live_clusters) == 1
    hist = store.snapshots("clusters", include_replaced=True)
    assert len(hist) == 4
    for s in hist[:-1]:
        assert not os.path.isdir(s["data_path"]), s["fingerprint"]
    for i in range(4):
        assert store.contains_fingerprint("clusters", f"batch-{i}")

    # replay with a fresh checkpoint: every batch short-circuits on the
    # clusters completion marker; snapshot history must not grow
    counts = {
        t: len(store.snapshots(t, include_replaced=True))
        for t in ("values", "blkeys", "edges", "record_ids", "clusters")
    }
    stream2 = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    q2 = incremental_resolve(spark, stream2, Model(MODEL), out_root,
                             checkpoint_dir=str(tmp_path / "ck2"),
                             maintain_every=1,
                             rebind_checkpoint=True)
    q2.awaitTermination(300)
    for t, n in counts.items():
        assert len(store.snapshots(t, include_replaced=True)) == n, t
