"""Structured Streaming surface: streaming values parity with the batch
path, session windows, the applyInPandasWithState assembly operator, and
multi-batch incremental linkage converging to the batch result."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zentity_spark.compiler import compile_model
from zentity_spark.model import Model

MODEL = {
    "attributes": {"k": {}},
    "resolvers": {"r": {"attributes": ["k"]}},
    "matchers": {"exact": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
    "indices": {"default": {"fields": {"key": {"attribute": "k", "matcher": "exact"}}}},
}

# three linkage components: {c1,c2,c3} via k=1/2 chains, {c4,c5}, {c6}
ROWS = [
    ("c1", 0, "user", "key=1", None, "2024-01-01 00:00:00"),
    ("c1", 1, "user", "key=2", None, "2024-01-01 00:00:05"),
    ("c2", 0, "user", "key=2", None, "2024-01-01 00:30:00"),
    ("c3", 0, "user", "key=1", None, "2024-01-01 01:00:00"),
    ("c4", 0, "user", "key=7", None, "2024-01-01 00:00:00"),
    ("c5", 0, "user", "key=7", None, "2024-01-01 00:00:01"),
    ("c6", 0, "user", "key=9", None, "2024-01-01 00:00:00"),
]


def _write_turn_files(spark, base: str, split: int):
    """Two parquet files (one per micro-batch under maxFilesPerTrigger=1)."""
    df = spark.createDataFrame(
        [(c, i, r, t, tool, ts) for c, i, r, t, tool, ts in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    a = df.where(F.col("conv_id").isin([r[0] for r in ROWS[:split]]))
    b = df.subtract(a)
    a.coalesce(1).write.parquet(os.path.join(base, "in"), mode="overwrite")
    b.coalesce(1).write.mode("append").parquet(os.path.join(base, "in"))
    return os.path.join(base, "in")


def test_stream_values_parity(spark, tmp_path):
    from zentity_spark.streaming import read_turn_stream, stream_values
    from zentity_spark.transcripts import build_values

    path = _write_turn_files(spark, str(tmp_path), split=4)
    compiled = compile_model(Model(MODEL))
    stream = read_turn_stream(spark, path)
    sv = stream_values(spark, stream, compiled, {("default", "key"): "key"})
    assert sv.isStreaming
    q = (
        sv.writeStream.format("memory").queryName("sv_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["record_id"], r["attribute"], r["raw"])
        for r in spark.sql("SELECT * FROM sv_out").collect()
    }
    batch_df = spark.createDataFrame(
        [(c, i, r, t, tool, ts) for c, i, r, t, tool, ts in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expect = {
        (r["record_id"], r["attribute"], r["raw"])
        for r in build_values(spark, batch_df, compiled,
                              {("default", "key"): "key"}).collect()
    }
    assert got == expect and len(got) == 7


def test_stream_sessionize(spark, tmp_path):
    from zentity_spark.streaming import read_turn_stream, stream_sessionize

    path = _write_turn_files(spark, str(tmp_path), split=4)
    stream = read_turn_stream(spark, path)
    sess = stream_sessionize(stream, gap_seconds=600)
    q = (
        sess.writeStream.format("memory").queryName("sess_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT conv_id, n_turns FROM sess_out").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["n_turns"])
    # c1's two turns are 5s apart → one session of 2; every other conv
    # has single-turn sessions
    assert by_conv["c1"] == [2]
    assert all(v == [1] for c, v in by_conv.items() if c != "c1")


def test_stateful_assembly(spark, tmp_path):
    from zentity_spark.streaming import (
        assemble_conversations_stateful,
        read_turn_stream,
    )
    from zentity_spark.transcripts import assemble_conversations

    path = _write_turn_files(spark, str(tmp_path), split=4)
    stream = read_turn_stream(spark, path, max_files_per_trigger=1)
    asm = assemble_conversations_stateful(stream)
    q = (
        asm.writeStream.format("memory").queryName("asm_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # update mode: keep the final (highest n_turns) row per conv
    rows = spark.sql(
        "SELECT conv_id, conv_text, n_turns FROM asm_out"
    ).collect()
    final = {}
    for r in rows:
        if r["conv_id"] not in final or r["n_turns"] > final[r["conv_id"]]["n_turns"]:
            final[r["conv_id"]] = r
    batch_df = spark.createDataFrame(
        [(c, i, r, t, tool, ts) for c, i, r, t, tool, ts in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expect = {
        r["conv_id"]: r for r in assemble_conversations(batch_df).collect()
    }
    assert set(final) == set(expect)
    for c in expect:
        assert final[c]["conv_text"] == expect[c]["conv_text"], c
        assert final[c]["n_turns"] == expect[c]["n_turns"], c


def test_incremental_resolve_converges(spark, tmp_path):
    """Multi-micro-batch incremental linkage == batch resolve_all on the
    full corpus (new×all blocking; snapshot-committed values/edges/
    clusters; idempotent on batch replay)."""
    from zentity_spark.pipeline import ResolutionConfig, resolve_all
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import incremental_resolve, read_turn_stream

    path = _write_turn_files(spark, str(tmp_path), split=3)
    out_root = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    stream = read_turn_stream(spark, path, max_files_per_trigger=1)
    model = Model(MODEL)
    q = incremental_resolve(spark, stream, model, out_root,
                            checkpoint_dir=ckpt)
    q.awaitTermination(240)

    store = SnapshotStore(out_root)
    clusters = store.read(spark, "clusters")
    got = {
        frozenset(
            r["record_id"] for r in clusters.where(F.col("cluster_id") == cid).collect()
        )
        for cid in [r["cluster_id"] for r in clusters.select("cluster_id").distinct().collect()]
    }
    batch_df = spark.createDataFrame(
        [(c, i, r, t, tool, ts) for c, i, r, t, tool, ts in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = resolve_all(spark, batch_df, model,
                        ResolutionConfig(entity_closure=False))
    expect = set()
    bc = batch.clusters.collect()
    for cid in {r["cluster_id"] for r in bc}:
        expect.add(frozenset(r["record_id"] for r in bc if r["cluster_id"] == cid))
    assert got == expect
    assert {frozenset(x) for x in [{"c1", "c2", "c3"}, {"c4", "c5"}, {"c6"}]} == got

    # ran as MULTIPLE micro-batches (maxFilesPerTrigger=1, two files) —
    # read the full snapshot history: maintenance may have merged the
    # live list, but replaced manifests keep the per-batch fingerprints
    fps = {
        s["fingerprint"]
        for s in store.snapshots("values", include_replaced=True)
        if s["fingerprint"].startswith("batch-")
    }
    assert len(fps) >= 2


def test_incremental_resolve_scan_is_batch_proportional(spark, tmp_path):
    """O(batch) evidence (the scan, not just the join): after a LARGE
    first micro-batch builds the committed corpus, a SMALL second batch
    must read only its touched hash-bucket partitions of the committed
    values/blocking-keys tables — per-batch scanned rows ∝ batch size,
    not corpus size. The stream_metrics table records the pruned-scan
    row counts per batch."""
    import os

    from zentity_spark.model import Model
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import incremental_resolve, read_turn_stream

    n_corpus = 80
    corpus = [
        (f"big{i}", 0, "user", f"key={i}", None, "2024-01-01 00:00:00")
        for i in range(n_corpus)
    ]
    small = [
        ("new1", 0, "user", "key=3", None, "2024-01-02 00:00:00"),
        ("new2", 0, "user", "key=999", None, "2024-01-02 00:00:00"),
    ]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts string")
    in_dir = str(tmp_path / "in")
    df_a = spark.createDataFrame(corpus, schema).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    df_b = spark.createDataFrame(small, schema).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    df_a.coalesce(1).write.parquet(in_dir, mode="overwrite")
    df_b.coalesce(1).write.mode("append").parquet(in_dir)

    stream = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    out_root = str(tmp_path / "inc")
    q = incremental_resolve(spark, stream, Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(240)

    store = SnapshotStore(out_root)
    metrics = {
        r["batch_id"]: r
        for r in store.read_all(spark, "stream_metrics").collect()
    }
    assert len(metrics) == 2
    big_id, small_id = sorted(
        metrics, key=lambda b: metrics[b]["batch_turn_rows"], reverse=True
    )
    big, sm = metrics[big_id], metrics[small_id]
    assert big["batch_turn_rows"] == n_corpus and sm["batch_turn_rows"] == 2
    # the small batch's pruned scans must touch a small fraction of the
    # committed corpus (2 records → ≤2 of 64 hash buckets each)
    assert sm["values_scan_rows"] <= n_corpus * 0.25, sm
    assert sm["keys_scan_rows"] <= n_corpus * 0.25, sm
    # correctness of the incremental result: new1 linked into big3's
    # cluster via key=3; new2 is a singleton
    clusters = store.read(spark, "clusters")
    by_id = {r["record_id"]: r["cluster_id"] for r in clusters.collect()}
    assert by_id["new1"] == by_id["big3"]
    assert sum(1 for v in by_id.values() if v == by_id["new2"]) == 1
    assert len(by_id) == n_corpus + 2


def test_incremental_resolve_valueless_batch(spark, tmp_path):
    """A micro-batch whose turns yield no extractable values (no
    FIELD=VALUE text) must not crash the incremental path and must not
    add records: clusters stay exactly the valued corpus."""
    from zentity_spark.model import Model
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import incremental_resolve, read_turn_stream

    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts string")
    valued = [("v1", 0, "user", "key=1", None, "2024-01-01 00:00:00"),
              ("v2", 0, "user", "key=1", None, "2024-01-01 00:00:00")]
    filler = [("f1", 0, "assistant", "no attributes here", None,
               "2024-01-02 00:00:00")]
    in_dir = str(tmp_path / "in")
    df_a = spark.createDataFrame(valued, schema).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    df_b = spark.createDataFrame(filler, schema).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    df_a.coalesce(1).write.parquet(in_dir, mode="overwrite")
    df_b.coalesce(1).write.mode("append").parquet(in_dir)

    stream = read_turn_stream(spark, in_dir, max_files_per_trigger=1)
    out_root = str(tmp_path / "inc")
    q = incremental_resolve(spark, stream, Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(240)

    store = SnapshotStore(out_root)
    fps = {s["fingerprint"]
           for s in store.snapshots("clusters", include_replaced=True)}
    assert fps == {"batch-0", "batch-1"}  # overwrite keeps the history
    clusters = {r["record_id"]: r["cluster_id"]
                for r in store.read(spark, "clusters").collect()}
    assert set(clusters) == {"v1", "v2"}  # f1 is not a record
    assert clusters["v1"] == clusters["v2"]


def test_stream_store_layout_guard(spark, tmp_path):
    """The store's bucket layout is fixed for its lifetime: resuming
    with a different n_buckets (rows would be looked up in the WRONG
    rb=/kb= directory — silent missed merges) or clusters_mode is a
    hard error, and a store with committed tables but no layout meta
    (pre-guard layout) is rejected instead of mis-read."""
    from zentity_spark.model import Model
    from zentity_spark.streaming import (
        _STREAM_META,
        _check_stream_meta,
        incremental_resolve,
        read_turn_stream,
    )

    path = _write_turn_files(spark, str(tmp_path), split=4)
    out_root = str(tmp_path / "inc")
    q = incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"), n_buckets=64)
    q.awaitTermination(240)

    # same layout params + same model: resume is allowed
    import hashlib
    import json as _json

    fp = hashlib.sha256(
        _json.dumps(Model(MODEL).spec, sort_keys=True,
                    separators=(",", ":")).encode()
    ).hexdigest()
    _check_stream_meta(out_root, 64, "full", fp)
    # changed n_buckets / clusters_mode: rejected before any commit
    with pytest.raises(ValueError, match="created with"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"), n_buckets=32)
    with pytest.raises(ValueError, match="created with"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"),
                            clusters_mode="delta")
    # changed entity model: committed values/blkeys were computed under
    # the original matchers, so resuming with an edited model would join
    # new keys against stale committed keys — hard error, not silence
    edited = _json.loads(_json.dumps(MODEL))
    edited["matchers"]["exact"]["clause"] = {
        "match": {"{{ field }}": "{{ value }}"}
    }
    with pytest.raises(ValueError, match="created with"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(edited), out_root,
                            checkpoint_dir=str(tmp_path / "ck"))
    # legacy store: committed tables but no meta file
    os.remove(os.path.join(out_root, _STREAM_META))
    with pytest.raises(ValueError, match="layout guard"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck"))


WEIGHTED_MODEL = {
    "attributes": {"k": {}, "m": {}},
    "resolvers": {
        "rlo": {"attributes": ["k"], "weight": 1},
        "rhi": {"attributes": ["m"], "weight": 5},
    },
    "matchers": {"exact": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
    "indices": {"default": {"fields": {
        "key": {"attribute": "k", "matcher": "exact"},
        "m": {"attribute": "m", "matcher": "exact"},
    }}},
}


def test_incremental_weight_gate_uses_committed_field_presence(spark, tmp_path):
    """Weight-tier exists-gates must read an OLD pair partner's
    attribute-named-field presence from the store (committed at its
    ingest batch), not the current batch's turns. q (batch 0) and p
    (batch 1) share k=7 (low weight) but disagree on m (high weight),
    and both carry a physical field named exactly 'm' — the reference's
    must_not(exists) gate therefore BLOCKS the edge. Rebuilding q's
    fields from batch 1's turns would find nothing, pass the gate
    vacuously, and merge what the batch path keeps apart."""
    from zentity_spark.model import Model
    from zentity_spark.streaming import (current_assignments,
                                         incremental_resolve,
                                         read_turn_stream)
    from zentity_spark.storage import SnapshotStore

    rows = [
        ("q", 0, "user", "key=7 m=AAA", None, "2024-01-01 00:00:00"),
        ("p", 0, "user", "key=7 m=BBB", None, "2024-01-01 01:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    base = str(tmp_path / "in")
    df.where(F.col("conv_id") == "q").coalesce(1).write.parquet(base)
    df.where(F.col("conv_id") == "p").coalesce(1).write.mode("append").parquet(base)

    out_root = str(tmp_path / "inc")
    q = incremental_resolve(
        spark,
        read_turn_stream(spark, base, max_files_per_trigger=1),
        Model(WEIGHTED_MODEL), out_root,
        checkpoint_dir=str(tmp_path / "ck"), n_buckets=8,
        clusters_mode="delta",
    )
    q.awaitTermination(300)
    store = SnapshotStore(out_root)
    cur = {r["record_id"]: r["cluster_id"]
           for r in current_assignments(spark, store).collect()}
    # the gate blocks the k-edge: p and q stay separate entities,
    # exactly like resolve_all on the combined corpus
    assert cur["p"] != cur["q"]

    # control: without the attribute-named field, the escape clause
    # applies and the same k-match IS an edge
    rows2 = [
        ("q", 0, "user", "key=7", None, "2024-01-01 00:00:00"),
        ("p", 0, "user", "key=7", None, "2024-01-01 01:00:00"),
    ]
    df2 = spark.createDataFrame(
        rows2,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    base2 = str(tmp_path / "in2")
    df2.where(F.col("conv_id") == "q").coalesce(1).write.parquet(base2)
    df2.where(F.col("conv_id") == "p").coalesce(1).write.mode("append").parquet(base2)
    out2 = str(tmp_path / "inc2")
    q2 = incremental_resolve(
        spark,
        read_turn_stream(spark, base2, max_files_per_trigger=1),
        Model(WEIGHTED_MODEL), out2,
        checkpoint_dir=str(tmp_path / "ck_b"), n_buckets=8,
        clusters_mode="delta",
    )
    q2.awaitTermination(300)
    cur2 = {r["record_id"]: r["cluster_id"]
            for r in current_assignments(spark, SnapshotStore(out2)).collect()}
    assert cur2["p"] == cur2["q"]


def test_stream_checkpoint_lineage_guard(spark, tmp_path):
    """Batch ids come from the checkpoint; a rerun against a committed
    store without the original checkpoint restarts them at 0 and every
    'new' batch is silently skipped as a replay. The lineage binding
    turns each silent-loss path into a hard error: no checkpoint on
    resume, a wiped/new checkpoint, or a checkpoint reused across
    stores. rebind_checkpoint sanctions a deliberate same-input replay."""
    from zentity_spark.model import Model
    from zentity_spark.streaming import (_CKPT_ID_FILE, incremental_resolve,
                                         read_turn_stream)

    path = _write_turn_files(spark, str(tmp_path), split=4)
    out_root = str(tmp_path / "inc")
    ck = str(tmp_path / "ck")
    q = incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root,
                            checkpoint_dir=ck, n_buckets=64)
    q.awaitTermination(240)
    assert os.path.exists(os.path.join(ck, _CKPT_ID_FILE))

    # resume without any checkpoint: batch ids would restart -> error
    with pytest.raises(ValueError, match="requires the ORIGINAL checkpoint"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root, n_buckets=64)
    # resume with a fresh (or wiped) checkpoint: lineage mismatch
    with pytest.raises(ValueError, match="bound to checkpoint lineage"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), out_root,
                            checkpoint_dir=str(tmp_path / "ck_other"),
                            n_buckets=64)
    # reusing this checkpoint for a DIFFERENT store: its processed-files
    # log would skip the new store's input -> error
    with pytest.raises(ValueError, match="belongs to another"):
        incremental_resolve(spark, read_turn_stream(spark, path),
                            Model(MODEL), str(tmp_path / "inc_fresh"),
                            checkpoint_dir=ck, n_buckets=64)
    # the original pairing still resumes cleanly (no new files: no-op)
    q2 = incremental_resolve(spark, read_turn_stream(spark, path),
                             Model(MODEL), out_root,
                             checkpoint_dir=ck, n_buckets=64)
    q2.awaitTermination(240)


# ----- incremental near-dup dedup (streaming twin of near_dup_dedup) -----

# Three dedup groups under (k=3, bands=8, t=0.3): {d01,d02,d03} chains
# across batches (d02 near-dups d01, d03 near-dups d02), {d10,d11},
# {d20} unique. 20-word docs differing in one middle word keep shingle
# Jaccard ~0.7 per link — banded-minhash collision is a near-certainty
# and deterministic given the fixed md5 hashes.
_BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango")
_DOCS = [
    ("3", _BASE),
    ("1", _BASE.replace("india", "xray")),
    ("2", _BASE.replace("india", "xray").replace("bravo", "yankee")),
    ("10", "one two three four five six seven eight nine ten "
           "eleven twelve thirteen fourteen fifteen sixteen"),
    ("11", "one two three four five six seven eight nine ten "
           "eleven twelve thirteen fourteen fifteen zulu"),
    ("20", "completely different content about spark incremental "
           "deduplication with no shared shingles at all whatsoever"),
]
# batch split: d03+d10 first, then d01+d11+d20, then d02 (merges the
# d03 group with d01's only transitively, through d02's arrival)
_DEDUP_BATCHES = [["3", "10"], ["1", "11", "20"], ["2"]]


def _write_doc_files(spark, base: str):
    in_dir = os.path.join(base, "docs_in")
    df = spark.createDataFrame(_DOCS, "doc_id string, text string")
    for i, ids in enumerate(_DEDUP_BATCHES):
        (df.where(F.col("doc_id").isin(ids)).coalesce(1)
         .write.mode("append").parquet(in_dir))
    return in_dir


def test_incremental_dedup_converges(spark, tmp_path):
    """Multi-micro-batch incremental dedup == batch near_dup_dedup on
    the full corpus: same groups, same min-id keepers — including a
    group merged only TRANSITIVELY by a later batch's doc."""
    from zentity_spark.extras import near_dup_dedup
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import current_keepers, incremental_dedup

    in_dir = _write_doc_files(spark, str(tmp_path))
    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out_root = str(tmp_path / "dd")
    q = incremental_dedup(spark, stream, out_root, k=3, bands=8,
                          jaccard_threshold=0.3,
                          checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(240)

    store = SnapshotStore(out_root)
    got = {
        (r["doc_id"], r["group_id"], r["kept"])
        for r in current_keepers(spark, store).collect()
    }
    batch_docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    expect = {
        (r["doc_id"], r["group_id"], r["kept"])
        for r in near_dup_dedup(batch_docs, k=3, bands=8,
                                jaccard_threshold=0.3).collect()
    }
    assert got == expect
    # the transitive merge happened: d03 (arrived first, alone) ends in
    # d01's group via d02, keeper = min id "1"
    by_id = {d: g for d, g, _ in got}
    assert by_id["3"] == by_id["1"] == by_id["2"] == "1"
    assert by_id["10"] == by_id["11"] == "10"
    assert by_id["20"] == "20"
    # ran as three micro-batches
    fps = {
        s["fingerprint"]
        for s in store.snapshots("batch_done", include_replaced=True)
        if s["fingerprint"].startswith("batch-")
    }
    assert len(fps) == 3


def test_incremental_dedup_scan_is_batch_proportional(spark, tmp_path):
    """O(batch) evidence: after a large first micro-batch commits the
    corpus, a small second batch's pruned scans of the committed
    sigkeys/shsets tables touch a small fraction of the corpus (only
    its hash-bucket partitions), recorded in stream_metrics."""
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import current_keepers, incremental_dedup

    n_corpus = 80
    # fully token-disjoint docs: no shared shingle anywhere, so the only
    # LSH collision in the stream is the planted exact dup
    corpus = [
        (f"{i}", " ".join(f"w{i}x{j}" for j in range(14)))
        for i in range(100, 100 + n_corpus)
    ]
    small = [
        ("900", corpus[3][1]),  # exact dup of doc 103
        ("901", " ".join(f"novel{j}" for j in range(14))),
    ]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(corpus, "doc_id string, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(small, "doc_id string, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out_root = str(tmp_path / "dd")
    q = incremental_dedup(spark, stream, out_root, k=3, bands=8,
                          jaccard_threshold=0.5,
                          checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(240)

    store = SnapshotStore(out_root)
    metrics = {
        r["batch_id"]: r
        for r in store.read_all(spark, "stream_metrics").collect()
    }
    assert len(metrics) == 2
    big_id, small_id = sorted(
        metrics, key=lambda b: metrics[b]["batch_docs"], reverse=True)
    big, sm = metrics[big_id], metrics[small_id]
    assert big["batch_docs"] == n_corpus and sm["batch_docs"] == 2
    # 2 docs × 8 bands = ≤16 of 64 key buckets; ≤1 old partner's shset
    # bucket — each a small fraction of the committed corpus rows
    assert sm["sigkeys_scan_rows"] <= n_corpus * 8 * 0.3, dict(sm.asDict())
    assert sm["shsets_scan_rows"] <= n_corpus * 0.25, dict(sm.asDict())
    keep = {r["doc_id"]: r for r in current_keepers(spark, store).collect()}
    assert keep["900"]["group_id"] == "103" and not keep["900"]["kept"]
    assert keep["901"]["kept"]
    assert len(keep) == n_corpus + 2


def test_incremental_dedup_null_text_and_bad_ids(spark, tmp_path):
    """NULL-text docs stay singleton keepers (the batch twin never
    pairs them: a NULL minhash never meets a join key) and never merge
    with EACH OTHER; ids that can collide under the zero-pad rule are
    a hard error, not a silent union."""
    from zentity_spark.extras import near_dup_dedup
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import current_keepers, incremental_dedup

    rows = [("5", None), ("6", None), ("7", _BASE)]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, "doc_id string, text string") \
        .coalesce(1).write.parquet(in_dir)
    stream = (spark.readStream.schema("doc_id string, text string")
              .parquet(in_dir))
    out_root = str(tmp_path / "dd")
    q = incremental_dedup(spark, stream, out_root, k=3, bands=4,
                          jaccard_threshold=0.2,
                          checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["group_id"], r["kept"])
        for r in current_keepers(spark, SnapshotStore(out_root)).collect()
    }
    batch = spark.createDataFrame(rows, "doc_id string, text string")
    expect = {
        (r["doc_id"], r["group_id"], r["kept"])
        for r in near_dup_dedup(batch, k=3, bands=4,
                                jaccard_threshold=0.2).collect()
    }
    assert got == expect == {("5", "5", True), ("6", "6", True),
                             ("7", "7", True)}

    # '03' pads equal to '3' — must raise, not silently merge ids
    bad_dir = str(tmp_path / "bad_in")
    spark.createDataFrame([("3", "a b c"), ("03", "a b c")],
                          "doc_id string, text string") \
        .coalesce(1).write.parquet(bad_dir)
    bad_stream = (spark.readStream.schema("doc_id string, text string")
                  .parquet(bad_dir))
    q2 = incremental_dedup(spark, bad_stream, str(tmp_path / "dd2"),
                           checkpoint_dir=str(tmp_path / "ck2"))
    with pytest.raises(Exception, match="leading|unsupported doc id"):
        q2.awaitTermination(120)
        if q2.exception():
            raise Exception(str(q2.exception()))


# ----- incremental ANN index (streaming twin of banded_lsh_buckets) -----

def _synth_embeddings(spark, n=60, dim=8):
    """Deterministic synthetic vectors: component j of vector i is a
    crc32-derived value in [-1, 1] — no RNG, engine-independent."""
    rows = spark.range(n).select(F.col("id").alias("vec_id"))
    comps = F.array(*[
        ((F.crc32(F.concat_ws("_", F.col("vec_id"), F.lit(j))) % 2001)
         - 1000).cast("double") / 1000.0
        for j in range(dim)
    ])
    return rows.select(
        "vec_id", F.concat(F.lit("v"), F.col("vec_id")).alias("label"),
        comps.alias("embedding"),
    )


def test_incremental_ann_index_parity(spark, tmp_path):
    """The committed incremental index equals batch banded_lsh_buckets
    row-for-row, and ann_index_query returns exactly
    ann_topk_bucketed's top-k (same geometry, same tie-break) — while
    scanning only pruned partitions (probe metrics ≪ corpus)."""
    from zentity_spark.extras import ann_topk_bucketed, banded_lsh_buckets
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.streaming import ann_index_query, incremental_ann_index

    dim, bands, r, n = 8, 4, 4, 60
    emb = _synth_embeddings(spark, n=n, dim=dim).localCheckpoint()
    in_dir = str(tmp_path / "in")
    emb.where(F.col("vec_id") < 40).coalesce(1).write.mode("append").parquet(in_dir)
    emb.where(F.col("vec_id") >= 40).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (spark.readStream
              .schema("vec_id long, label string, embedding array<double>")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out_root = str(tmp_path / "ann")
    q = incremental_ann_index(spark, stream, out_root, dim=dim, bands=bands,
                              planes_per_band=r,
                              checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(240)

    store = SnapshotStore(out_root)
    got_rows = {
        (row["vec_id"], row["band"], row["bucket"])
        for row in store.read_all(spark, "buckets").collect()
    }
    want_rows = {
        (row["vec_id"], row["band"], row["bucket"])
        for row in banded_lsh_buckets(emb, dim, bands, r).collect()
    }
    assert got_rows == want_rows and len(got_rows) == n * bands

    topk, pm = ann_index_query(spark, out_root, query_vec_id=7, k=5,
                               with_metrics=True)
    got_k = [(row["vec_id"], row["cosine"]) for row in topk.collect()]
    want_k = [
        (row["vec_id"], row["cosine"])
        for row in ann_topk_bucketed(emb, query_vec_id=7, k=5, dim=dim,
                                     bands=bands, planes_per_band=r).collect()
    ]
    assert got_k == want_k and len(got_k) == 5
    # pruned probe: the bucket scan reads only touched kb partitions
    assert 0 < pm["probe_ids"] < n
    assert pm["bucket_scan_rows"] < n * bands
    assert pm["vector_scan_rows"] < n

    # multiprobe expands the probe set monotonically
    _, pm1 = ann_index_query(spark, out_root, query_vec_id=7, k=5,
                             multiprobe=1, with_metrics=True)
    assert pm1["probe_ids"] >= pm["probe_ids"]

    # geometry is pinned: reopening with different planes is a hard error
    stream2 = (spark.readStream
               .schema("vec_id long, label string, embedding array<double>")
               .parquet(in_dir))
    with pytest.raises(Exception, match="was created with"):
        q2 = incremental_ann_index(
            spark, stream2, out_root, dim=dim, bands=bands,
            planes_per_band=r + 1, checkpoint_dir=str(tmp_path / "ck"))
        q2.awaitTermination(60)
        if q2.exception():
            raise Exception(str(q2.exception()))

    # unknown query id is a hard error, not an empty result
    with pytest.raises(ValueError, match="not found"):
        ann_index_query(spark, out_root, query_vec_id=10_000)
