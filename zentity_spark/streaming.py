"""Structured Streaming surface: incremental transcript ingestion.

The reference is a per-request Elasticsearch plugin; its "streaming"
story is reactive per-query hops. The Spark-native counterpart for a
continuously-arriving transcript corpus (input_hint shape) is:

  read_turn_stream          readStream over transcript files
  stream_values             turns → values table, streaming (the same
                            narrow ops + broadcast mapping join as the
                            batch path — stream-static joins are
                            natively supported)
  stream_sessionize         session_window + watermark gap sessionization
                            (the streaming counterpart of the batch
                            sessionize contract query)
  assemble_conversations_stateful
                            applyInPandasWithState per-conversation turn
                            accumulator (custom stateful operator:
                            arbitrary state, update-mode emissions)
  incremental_resolve       foreachBatch incremental record linkage:
                            per micro-batch, new records' values are
                            committed to the SnapshotStore, blocked
                            against the ACCUMULATED corpus, and the new
                            edges re-clustered — arriving data joins
                            existing entities without recomputing old
                            pairwise work (new×all blocking, not
                            all×all).
  incremental_dedup         foreachBatch incremental MinHash-LSH
                            near-dup dedup: the streaming twin of
                            extras.near_dup_dedup (same signatures,
                            verify, and min-id keeper rule), with
                            candidates generated new×accumulated and
                            group assignments maintained through the
                            same incremental union-find delta log as
                            incremental_resolve's delta mode.
  incremental_ann_index     foreachBatch incremental banded
                            hyperplane-LSH index: new vectors' bucket
                            rows committed per micro-batch (one Arrow
                            matmul), hash-bucketed by the (band,
                            bucket) probe key; ann_index_query answers
                            top-k against the COMMITTED index through
                            partition-pruned probes — O(batch) writes,
                            O(probe set) queries.

Scale notes: the streaming path reuses the batch operators' plan shapes
(skinny blocking rows, broadcast model mapping, capped blocks). State
in applyInPandasWithState is per-conversation and bounded by
conversation length. Incremental linkage is O(batch) per micro-batch:
values and blocking keys are committed as hash-bucketed append tables,
each batch computes keys for NEW records only and fetches touched
blocks / match material through partition-pruned bucket scans — no
per-batch recomputation or shuffle over the accumulated corpus
(per-batch scan rows are recorded in the stream_metrics table).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp"
)

# Physical layout of an incremental_resolve store. Bump when the table
# set / bucketing scheme changes incompatibly (a store written under an
# older layout must be rejected on resume, not silently mis-read).
# v2: adds the attrfields table (per-record attribute-named-field
# presence committed at ingest — weight-tier gates read it instead of
# the current batch's turns) and the checkpoint lineage binding.
STREAM_LAYOUT_VERSION = 2
_STREAM_META = "stream_meta.json"
_STREAM_LINEAGE = "stream_lineage"
_CKPT_ID_FILE = "zentity_stream_id"

# Skinny blocking-key row shape — shared by the two empty-frame
# fallbacks in process_batch so they cannot silently diverge.
_KEYS_SCHEMA = "resolver string, ckey long, record_id string"


def _check_stream_meta(output_root: str, n_buckets: int,
                       clusters_mode: str, model_fingerprint: str) -> None:
    """Persist / validate the store's physical layout parameters.

    n_buckets decides which rb=/kb=/cb= partition directory every
    committed row lands in, and clusters_mode decides which tables
    exist — resuming with a different value would look records up in
    the WRONG bucket (a directory that exists, full of other records'
    rows), so bucket-pruned scans silently miss their values and
    merges are lost with no error. The entity MODEL is pinned for the
    same reason one level up: committed values/blkeys rows carry
    eq_keys/blocking keys computed under the model's matchers and
    resolvers, so resuming with an edited model would join new batches'
    keys against stale committed keys — missed or spurious candidate
    blocks with no error. Hence all three are fixed for a store's
    lifetime and a mismatch is a hard error. A store with committed
    tables but no meta file predates this guard (or lost the file) and
    cannot be safely resumed either."""
    meta_path = os.path.join(output_root, _STREAM_META)
    want = {"layout_version": STREAM_LAYOUT_VERSION, "n_buckets": n_buckets,
            "clusters_mode": clusters_mode,
            "model_fingerprint": model_fingerprint}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            have = json.load(fh)
        if have != want:
            hint = ""
            if (have.get("model_fingerprint") != want["model_fingerprint"]
                    and {k: v for k, v in have.items()
                         if k != "model_fingerprint"}
                    == {k: v for k, v in want.items()
                        if k != "model_fingerprint"}):
                # only the fingerprint differs — for dedup stores that
                # can mean the PINNED PARAMETER SET changed between
                # versions (e.g. max_block_size joined it in session
                # 15), so identical user parameters still mismatch
                hint = (
                    " NOTE: only the parameter fingerprint differs. If "
                    "you passed the same parameters, the set of pinned "
                    "parameters grew in a newer version (fingerprints "
                    "are not comparable across that change) — rebuild "
                    "the store by re-streaming the inputs (stores are "
                    "derived state)."
                )
            raise ValueError(
                f"stream store at {output_root} was created with {have}; "
                f"cannot resume with {want} — bucket layout, clusters "
                "mode, and the entity model are fixed for a store's "
                "lifetime (committed keys were computed under them)."
                + hint
            )
        return
    has_tables = os.path.isdir(output_root) and any(
        os.path.isdir(os.path.join(output_root, d, "snapshots"))
        for d in os.listdir(output_root)
    )
    if has_tables:
        raise ValueError(
            f"stream store at {output_root} has committed tables but no "
            f"{_STREAM_META}: it predates the layout guard (or the meta "
            "file was lost), so its bucket layout cannot be verified — "
            "recreate the store or restore the meta file"
        )
    os.makedirs(output_root, exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(want, fh)
    os.replace(tmp, meta_path)


def _bind_checkpoint_lineage(output_root: str, checkpoint_dir: str | None,
                             has_batches: bool, rebind: bool = False) -> None:
    """Bind the store to ONE streaming-checkpoint lineage.

    Batch fingerprints are 'batch-<id>', and batch ids are assigned by
    the checkpoint: a rerun against the same store WITHOUT the original
    checkpoint restarts ids at 0, so every new batch collides with a
    committed fingerprint and is silently skipped — the store stops
    ingesting with rc=0. Hence: (a) resuming a store with committed
    batches requires a checkpoint_dir; (b) the checkpoint carries an id
    file and the store records it, and any mismatch (wiped checkpoint,
    checkpoint reused across stores) is a hard error instead of silent
    data loss."""
    lineage_path = os.path.join(output_root, _STREAM_LINEAGE)
    store_id = None
    if os.path.exists(lineage_path):
        with open(lineage_path) as fh:
            store_id = fh.read().strip()
    if checkpoint_dir is None:
        if has_batches or store_id is not None:
            raise ValueError(
                f"stream store at {output_root} has committed batches; "
                "resuming requires the ORIGINAL checkpoint_dir — without "
                "it batch ids restart at 0, collide with committed "
                "batch fingerprints, and new data is silently skipped"
            )
        return  # single ephemeral run against a fresh store
    os.makedirs(checkpoint_dir, exist_ok=True)
    ckpt_path = os.path.join(checkpoint_dir, _CKPT_ID_FILE)
    ckpt_id = None
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as fh:
            ckpt_id = fh.read().strip()
    if rebind:
        # operator-sanctioned rebind (deliberate replay of the SAME
        # input through a new checkpoint — e.g. checkpoint lost but the
        # source is replayable from the start): adopt the new lineage.
        # Per-table fingerprint checks make the replayed commits no-ops.
        import uuid

        new_id = ckpt_id or uuid.uuid4().hex
        with open(ckpt_path, "w") as fh:
            fh.write(new_id)
        with open(lineage_path, "w") as fh:
            fh.write(new_id)
        return
    if store_id is None and ckpt_id is None:
        import uuid

        new_id = uuid.uuid4().hex
        # checkpoint first: a crash between the two writes leaves a
        # bound checkpoint + unbound store, which the branch below
        # rejects loudly (recreate either) — never a silent mismatch
        with open(ckpt_path, "w") as fh:
            fh.write(new_id)
        with open(lineage_path, "w") as fh:
            fh.write(new_id)
        return
    if store_id is None:
        raise ValueError(
            f"checkpoint {checkpoint_dir} already belongs to another "
            "stream (or a bind crashed mid-write): its processed-files "
            "log would silently skip this store's input — use a fresh "
            "checkpoint_dir for a fresh store"
        )
    if ckpt_id != store_id:
        raise ValueError(
            f"stream store at {output_root} is bound to checkpoint "
            f"lineage {store_id}, but {checkpoint_dir} has "
            f"{ckpt_id or 'no id (wiped or new)'} — batch ids from a "
            "different checkpoint collide with committed fingerprints; "
            "restore the original checkpoint or recreate the store"
        )


# Scan-row metrics are taken as count() over a localCheckpoint()ed
# pruned scan: the checkpoint reads the pruned parquet ONCE and both the
# metric and the downstream join consume the materialized partitions.
# Deliberately NOT pyspark.sql.Observation: inside foreachBatch the
# batch DataFrame belongs to the stream's CLONED session, so a plan
# mixing it with an outer-session scan can execute under the clone while
# the observation listener sits on the outer session's listener bus —
# Observation.getRow then blocks (or yields the schemaless empty-row
# fallback, an assertion error in toPyRow). Reproduced on Spark 4.1;
# the checkpoint+count form is session-agnostic and deterministic.


def read_turn_stream(spark: SparkSession, path: str, fmt: str = "parquet",
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(TURNS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_values(spark: SparkSession, stream_turns: DataFrame, compiled,
                  physical_paths: dict) -> DataFrame:
    """Streaming values table. physical_paths must be explicit: the
    batch path's resolve_physical_paths probes the data with a collect,
    which a stream cannot do."""
    from zentity_spark.transcripts import values_from_parsed, parse_turns

    return values_from_parsed(spark, parse_turns(stream_turns), compiled,
                              physical_paths)


def stream_sessionize(stream_turns: DataFrame, gap_seconds: int = 600,
                      watermark: str = "30 minutes") -> DataFrame:
    """Gap-based session aggregation with late-data handling:
    session_window merges events within `gap_seconds`, the watermark
    bounds state. Emits one row per (conv_id, session) with its turn
    count and bounds."""
    return (
        stream_turns.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_seconds} seconds").alias("w"),
            F.col("conv_id"),
        )
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
        )
    )


ASSEMBLY_STATE_SCHEMA = "turns array<struct<turn_idx:int,text:string>>"
ASSEMBLY_OUT_SCHEMA = "conv_id string, conv_text string, n_turns long"


def assemble_conversations_stateful(
        stream_turns: DataFrame, watermark: str | None = None,
        evict_gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): accumulate
    each conversation's turns in group state and emit the CURRENT
    assembly on every update — the streaming form of
    transcripts.assemble_conversations, preserving the per-turn text
    equality invariant under (conv_id, turn_idx) ordering (null-text
    turns are skipped, exactly like the batch path's concat_ws).
    Update-mode consumers keep the latest row per conv_id.

    State eviction: with `watermark` set (e.g. "30 minutes"), a
    conversation's state is dropped `evict_gap_seconds` after the
    watermark passes its last activity — the per-key size is bounded by
    conversation length either way, but without eviction the KEY COUNT
    grows with the whole corpus, which no long-running deployment can
    afford. watermark=None keeps everything (finite replays, tests)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed last activity + gap: the conversation is
            # closed; its final assembly was already emitted on its last
            # update (update-mode consumers hold it)
            state.remove()
            return
        turns: list = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            for ti, tx in zip(pdf["turn_idx"], pdf["text"]):
                if tx is None or (isinstance(tx, float) and tx != tx):
                    continue  # batch parity: concat_ws skips null text
                turns.append((int(ti), str(tx)))
        turns.sort()
        state.update((turns,))
        if watermark is not None:
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + evict_gap_seconds * 1000
            )
        import pandas as pd

        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "conv_text": ["\n".join(t for _, t in turns)],
                "n_turns": [len(turns)],
            }
        )

    src = stream_turns
    timeout = GroupStateTimeout.NoTimeout
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return (
        src.groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=ASSEMBLY_OUT_SCHEMA,
            stateStructType=ASSEMBLY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def _read_bucket_dirs(spark: SparkSession, store, table: str,
                      bucket_col: str, buckets: list[int]):
    """Read ONLY the named hash-bucket partitions across every committed
    snapshot of `table` (committed with partition_by=[bucket_col]) —
    the local-parquet analog of Iceberg's bucket-transform partition
    pruning. Returns None when no snapshot has any touched bucket."""
    import os

    paths = [
        p
        for s in store.snapshots(table)
        for b in buckets
        if os.path.isdir(p := os.path.join(s["data_path"], f"{bucket_col}={b}"))
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _commit_once(store, df: DataFrame, table: str, stage: str, fp: str,
                 partition_by: list[str] | None = None,
                 overwrite: bool = False) -> None:
    """Idempotent commit: a replayed micro-batch (crash between this
    table's commit and a later one) must not commit a second snapshot
    with the same fingerprint — read_all unions snapshots, so a double
    commit would duplicate rows. contains_fingerprint (not latest):
    a batch whose snapshot was compacted away is still committed.
    overwrite=True uses replace semantics (latest-view tables, e.g. the
    full-mode clusters snapshot) under the same fingerprint guard."""
    if store.contains_fingerprint(table, fp):
        return
    if overwrite:
        store.commit_overwrite(df, table, stage, fingerprint=fp)
    else:
        store.commit(df, table, stage=stage, fingerprint=fp,
                     partition_by=partition_by)


def _bucket_of(col: str, n_buckets: int) -> F.Column:
    """Hash bucket of `col` — the store's physical partition key (the
    local-parquet analog of Iceberg's bucket(N, col) transform)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _touched_buckets(df: DataFrame, col: str, n_buckets: int) -> list[int]:
    """Distinct hash buckets of `col` — the partition-prune driver list
    (bounded by n_buckets, a model-sized collect)."""
    return [
        r[0]
        for r in df.select(_bucket_of(col, n_buckets).alias("b"))
        .distinct().collect()
    ]


def _last_wins(log: DataFrame) -> DataFrame:
    """Current (record_id, cluster_id) per record from assign-log rows:
    max-seq wins. THE single definition of delta-log read semantics —
    shared by the full-view materializer and the per-batch pruned read,
    so writer and readers cannot diverge."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("record_id").orderBy(F.col("seq").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).select("record_id", "cluster_id")
    )


def _assign_current_for(spark: SparkSession, store, ids: DataFrame,
                        n_buckets: int, metrics: bool):
    """CURRENT cluster id per requested record (delta mode):
    bucket-pruned last-wins read of the assign log; a record with
    no row yet is its own singleton. Returns (assignments, scan-row
    count) — the pruned scan is checkpointed so the metric and the
    join share ONE parquet read."""
    scan = _read_bucket_dirs(spark, store, "assign", "rb",
                             _touched_buckets(ids, "record_id", n_buckets))
    if scan is None:
        return ids.withColumn("cluster_id", F.col("record_id")), None
    scan_rows = None
    if metrics:
        scan = scan.localCheckpoint()
        scan_rows = scan.count()
    cur = _last_wins(scan.join(ids, "record_id", "left_semi"))
    return (
        ids.join(cur, "record_id", "left")
        .withColumn("cluster_id",
                    F.coalesce("cluster_id", F.col("record_id")))
    ), scan_rows


def _delta_assignments(spark: SparkSession, store, edges_new: DataFrame,
                       new_ids: DataFrame, batch_id: int, fp: str,
                       n_buckets: int, metrics: bool,
                       cc_max_iterations: int):
    """Incremental union-find over the assign/cmembers delta logs —
    shared by incremental_resolve (record linkage) and
    incremental_dedup (near-dup keeper marking). Invariants that make
    the reverse lookup verification-free:
    (a) every record's FIRST delta row lands under its initial
    cluster id, so live clusters always have complete cmembers
    rows; (b) when components merge, every member of each losing
    cluster is re-pointed at the root, so the losing id is dead
    forever — rows filed under a dead id can never be matched
    again (remap keys are CURRENT ids only). Hence no stale row is
    ever read back as current."""
    from zentity_spark.clustering import connected_components

    def bucket_of(col: str) -> F.Column:
        return _bucket_of(col, n_buckets)

    touched = (
        edges_new.select(F.col("id_l").alias("record_id"))
        .unionByName(edges_new.select(F.col("id_r").alias("record_id")))
        .unionByName(new_ids).distinct().localCheckpoint()
    )
    cur, assign_scan_rows = _assign_current_for(spark, store, touched,
                                                n_buckets, metrics)
    cur = cur.localCheckpoint()  # consumed by cid_l/cid_r/fresh below
    cid_l = cur.select(F.col("record_id").alias("id_l"),
                       F.col("cluster_id").alias("src"))
    cid_r = cur.select(F.col("record_id").alias("id_r"),
                       F.col("cluster_id").alias("dst"))
    cid_edges = (
        edges_new.join(cid_l, "id_l").join(cid_r, "id_r")
        .select("src", "dst").where(F.col("src") != F.col("dst"))
    )
    # batch-sized CC on the contracted component graph: min of the
    # merged minima == min record id of the merged component, so
    # ids stay exactly the batch path's convention
    comp = connected_components(cid_edges, cc_max_iterations)
    remap = (
        comp.where(F.col("record_id") != F.col("cluster_id"))
        .select(F.col("record_id").alias("old_cid"),
                F.col("cluster_id").alias("new_cid")).localCheckpoint()
    )
    members = _read_bucket_dirs(spark, store, "cmembers", "cb",
                                _touched_buckets(remap, "old_cid", n_buckets))
    if members is None:
        moved = spark.createDataFrame([], "record_id string, cluster_id string")
    else:
        moved = (
            members.select(F.col("cluster_id").alias("old_cid"), "record_id")
            .join(F.broadcast(remap), "old_cid")
            .select("record_id", F.col("new_cid").alias("cluster_id"))
        )
    # every NEW record gets its first row (root if its component
    # merged, else its current/singleton id)
    fresh = (
        cur.join(new_ids, "record_id", "left_semi")
        .select("record_id", F.col("cluster_id").alias("old_cid"))
        .join(F.broadcast(remap), "old_cid", "left")
        .select("record_id",
                F.coalesce("new_cid", "old_cid").alias("cluster_id"))
    )
    delta = (
        moved.unionByName(fresh).dropDuplicates(["record_id"])
        .withColumn("seq", F.lit(int(batch_id)).cast("long"))
        .localCheckpoint()
    )
    # COMMIT ORDER MATTERS: cmembers BEFORE assign. A crash between
    # the two replays the batch; with assign still pre-batch the
    # replay recomputes the identical delta (remap derives from the
    # unmerged view), and the extra cmembers rows sit under WINNING
    # ids, which this batch never reverse-looks-up. The opposite
    # order would replay with the merge already visible in assign →
    # remap empty → the moved members' cmembers rows silently never
    # written, breaking invariant (a) for future merges.
    _commit_once(store, delta.withColumn("cb", bucket_of("cluster_id")),
                 "cmembers", "cmembers", fp, partition_by=["cb"])
    # assign_metrics BETWEEN cmembers and assign: once assign is
    # committed, a crash-replay recomputes delta with the merge
    # already visible (remap empty → moved empty), so a metrics row
    # written after assign would under-count delta_rows for exactly
    # the crash-window batches it exists to audit. Before assign,
    # every replay recomputes the identical delta, so the committed
    # count is exact in every crash window.
    if metrics:
        am = spark.createDataFrame(
            [(int(batch_id), int(delta.count()),
              int(assign_scan_rows or 0))],
            "batch_id long, delta_rows long, assign_scan_rows long",
        )
        _commit_once(store, am, "assign_metrics", "assign_metrics", fp)
    _commit_once(store, delta.withColumn("rb", bucket_of("record_id")),
                 "assign", "assign", fp, partition_by=["rb"])
    return delta


def current_assignments(spark: SparkSession, store) -> DataFrame | None:
    """Materialize the full (record_id, cluster_id) view from a
    delta-mode assign log: last-wins per record by seq (batch id).
    This is the consumer-side O(corpus) materialization, run ON DEMAND —
    the point of delta mode is that no per-batch work is corpus-sized."""
    log = store.read_all(spark, "assign")
    if log is None:
        return None
    return _last_wins(log)


def incremental_resolve(spark: SparkSession, stream_turns: DataFrame, model,
                        output_root: str, config=None,
                        checkpoint_dir: str | None = None,
                        n_buckets: int = 64, metrics: bool = True,
                        maintain_every: int | None = 1,
                        clusters_mode: str = "full",
                        rebind_checkpoint: bool = False):
    """Incremental record linkage via foreachBatch — O(batch) per
    micro-batch, not O(corpus). Committed tables (append snapshots):

      values      long values rows, hash-bucketed by record_id (`rb`)
      blkeys      per-record blocking keys (resolver, ckey, record_id),
                  hash-bucketed by ckey (`kb`)
      record_ids  skinny distinct record ids (for singleton clusters)
      edges       verified match edges
      clusters    full assignment snapshot per batch
      stream_metrics  per-batch observability incl. pruned-scan rows

    Per micro-batch:

      1. batch turns → values (batch path only — O(batch) compute) →
         committed bucketed by rb;
      2. the batch's records are rebuilt from THEIR OWN values only
         (bucket-pruned scan + semi-join on the new ids — a record
         whose conversation spans micro-batches merges its old+new
         values here), their blocking keys computed and committed
         bucketed by kb;
      3. the new keys' (resolver, ckey) blocks are fetched from the
         committed keys table by PARTITION-PRUNED scan (only touched kb
         buckets are read) + broadcast semi-join → candidate pairs with
         ≥1 new side → match material fetched by id for TOUCHED pair
         ids only (bucket-pruned values scan) → verified → edges
         appended;
      4. clusters_mode="full" (default): connected components recomputed
         over the accumulated edge set (CC input is edges — orders of
         magnitude smaller than the corpus) → corpus-sized `clusters`
         snapshot per batch.
         clusters_mode="delta": incremental union-find instead — the
         batch's new edges are contracted to CLUSTER-id edges (current
         ids fetched by bucket-pruned last-wins read of the `assign`
         delta log), a batch-sized CC merges components, and only the
         members of LOSING components (reverse-looked-up through the
         cid-bucketed `cmembers` index) plus the batch's new records
         get delta rows appended. Per-batch write ∝ |touched
         components|, never corpus-sized; consumers materialize the
         full view on demand via current_assignments(). Cluster ids
         stay min-record-id (min of merged minima = global min), exact
         id parity with the batch path. A store must be run in ONE mode
         for its lifetime.

    Nothing in steps 1-3 scans, shuffles, or recomputes the accumulated
    corpus: per-batch work ∝ |batch| × blocking fan-out. In full mode
    the committed clusters output (step 4) is corpus-sized by
    definition (its CC input is the edge set); delta mode removes that
    last corpus-proportional per-batch cost too. On a real cluster the three bucketed tables map to
    Iceberg bucket-transform partitioning (bucket(N, record_id) /
    bucket(N, ckey)) with the same pruning; n_buckets=64 suits local
    tests — size it so bucket ≫ executor count at production scale.

    Returns the StreamingQuery; callers await termination. Resume: every
    table is snapshot-committed with the batch id as fingerprint, so a
    restarted stream (same checkpoint dir) replays the uncommitted tail
    and per-table fingerprint checks make re-commits idempotent even
    mid-batch (crash between commits). Every `maintain_every` batches
    the append tables get logarithmic merge maintenance (Bentley–Saxe:
    merge snapshots until each holds ≥ the rows of everything committed
    after it), bounding live snapshots at O(log corpus) with O(log)
    amortized rewrites per row; replaced manifests remain as fingerprint
    history so replay idempotence survives compaction."""
    from zentity_spark.blocking import blocking_keys, candidate_pairs
    from zentity_spark.clustering import connected_components
    from zentity_spark.compiler import compile_model
    from zentity_spark.model import Model
    from zentity_spark.pairs import gate_edges, verify_pairs
    from zentity_spark.pipeline import ResolutionConfig, _cluster_assignments
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.transcripts import (attr_name_field_presence,
                                           build_records, build_values,
                                           parse_turns)

    if clusters_mode not in ("full", "delta"):
        raise ValueError(f"clusters_mode must be full|delta: {clusters_mode}")
    config = config or ResolutionConfig()
    if config.max_value_frequency is not None:
        raise ValueError(
            "max_value_frequency is not supported on the streaming path: "
            "value frequencies are corpus-global, and recomputing them "
            "per micro-batch would break the O(batch) contract — filter "
            "junk values upstream or use resolve_all (which applies the "
            "filter); silently ignoring the config would let junk values "
            "chain exactly the false merges it exists to prevent"
        )
    compiled = model if not isinstance(model, Model) else compile_model(model)
    fingerprint = hashlib.sha256(
        json.dumps(compiled.model.spec, sort_keys=True,
                   separators=(",", ":")).encode()
    ).hexdigest()
    _check_stream_meta(output_root, n_buckets, clusters_mode, fingerprint)
    store = SnapshotStore(output_root)
    marker_for_bind = "clusters" if clusters_mode == "full" else "batch_done"
    _bind_checkpoint_lineage(
        output_root, checkpoint_dir,
        has_batches=bool(store.snapshots(marker_for_bind)),
        rebind=rebind_checkpoint,
    )
    def bucket_of(col: str) -> F.Column:
        return _bucket_of(col, n_buckets)

    def touched_buckets(df: DataFrame, col: str) -> list[int]:
        return _touched_buckets(df, col, n_buckets)

    def rebuild_records(ids: DataFrame, want_metrics=True):
        """Match material for exactly `ids`: bucket-pruned values scan +
        semi-join, then the batch-path record aggregation — O(|ids|'
        values), never O(corpus). Returns (records, scan-row count):
        the pruned scan is checkpointed so the metric and the join share
        ONE parquet read. attr_name_fields (the weight-tier exists-gate
        input) comes from the COMMITTED attrfields table, never the
        current batch's turns: an old pair partner's field presence
        lives in the batch that ingested it, and rebuilding it from the
        current batch would make must_not(exists) gates pass vacuously —
        spurious edges the batch path rejects."""
        bks = touched_buckets(ids, "record_id")
        vals = _read_bucket_dirs(spark, store, "values", "rb", bks)
        if vals is None:  # ids was empty (e.g. zero candidate pairs)
            return None, None
        scan_rows = None
        if metrics and want_metrics:
            vals = vals.localCheckpoint()
            scan_rows = vals.count()
        vals = vals.join(ids, "record_id", "left_semi")
        recs = build_records(vals, compiled, None).drop("attr_name_fields")
        empty_af = F.array().cast("array<string>")
        af = _read_bucket_dirs(spark, store, "attrfields", "rb", bks)
        if af is None:
            return recs.withColumn("attr_name_fields", empty_af), scan_rows
        agg = (
            af.join(ids, "record_id", "left_semi")
            .groupBy("record_id")
            .agg(F.sort_array(F.collect_set("field")).alias("attr_name_fields"))
        )
        recs = recs.join(agg, "record_id", "left").withColumn(
            "attr_name_fields", F.coalesce("attr_name_fields", empty_af)
        )
        return recs, scan_rows

    marker_table = "clusters" if clusters_mode == "full" else "batch_done"

    def process_batch(batch_turns, batch_id: int):
        fp = f"batch-{batch_id}"
        if store.contains_fingerprint(marker_table, fp):
            return  # replayed batch after restart: fully committed
        batch_turns = batch_turns.localCheckpoint()
        parsed_batch = parse_turns(batch_turns)
        # materialize ONCE: the commit executes the full parse/mapping
        # plan, and new_ids below would otherwise re-execute it
        values_new = build_values(spark, batch_turns, compiled).withColumn(
            "rb", bucket_of("record_id")
        ).localCheckpoint()
        _commit_once(store, values_new, "values", "values", fp,
                     partition_by=["rb"])
        # per-record attribute-named-field presence, committed at ingest
        # (NOT pruned to valued records: a spanning conversation can
        # show the field in one batch and produce values in a later one)
        # — rebuild_records reads this table for weight-tier gates
        af_new = attr_name_field_presence(parsed_batch, compiled).select(
            "record_id", F.explode("attr_name_fields").alias("field")
        )
        _commit_once(store, af_new.withColumn("rb", bucket_of("record_id")),
                     "attrfields", "attrfields", fp, partition_by=["rb"])
        # only records that PRODUCE values enter the corpus — batch
        # parity: resolve_all's clusters cover build_records(values)
        # output, and a turns-only conversation with no extractable
        # values is not a record
        new_ids = values_new.select("record_id").distinct().localCheckpoint()
        _commit_once(store, new_ids, "record_ids", "record_ids", fp)

        # records for the NEW ids only (old+new values merged for a
        # conversation spanning batches)
        records_new, values_scan_rows = rebuild_records(new_ids)
        if records_new is None:  # batch produced no valued records
            keys_new = spark.createDataFrame([], _KEYS_SCHEMA)
        else:
            # materialized once: consumed by blocking keys here and
            # reused as pair match material below (avoids a second
            # bucket scan + aggregation over the same new ids)
            records_new = records_new.localCheckpoint()
            keys_new = blocking_keys(
                records_new, compiled,
                max_keys_per_record=config.max_keys_per_record,
            ).localCheckpoint()
        _commit_once(store, keys_new.withColumn("kb", bucket_of("ckey")),
                     "blkeys", "blkeys", fp, partition_by=["kb"])

        # new × all: only blocks containing a NEW record can produce new
        # pairs. Fetch those blocks' members by partition-pruned scan of
        # the committed keys (touched kb buckets only) + broadcast
        # semi-join on (resolver, ckey).
        touched = keys_new.select("resolver", "ckey").distinct()
        keys_scan = _read_bucket_dirs(spark, store, "blkeys", "kb",
                                      touched_buckets(keys_new, "ckey"))
        if keys_scan is None:  # batch produced no blocking keys at all
            keys_scan = spark.createDataFrame([], _KEYS_SCHEMA)
        # materialize the pruned scan ONCE: candidate_pairs self-joins
        # its input (sizes + left + right = three plan references), so
        # without this the pruned parquet is read three times per batch
        # — and the metrics count on the materialized blocks is free
        keys_scan = keys_scan.localCheckpoint()
        keys_scan_rows = keys_scan.count() if metrics else None
        block_rows = keys_scan.join(
            F.broadcast(touched), ["resolver", "ckey"], "left_semi"
        ).dropDuplicates(["resolver", "ckey", "record_id"])
        cand, dropped = candidate_pairs(block_rows,
                                        max_block_size=config.max_block_size)
        # over-cap blocks are a PERMANENT recall boundary for every
        # record carrying that key — observable per batch, same as the
        # batch path's blocking.dropped_blocks metric
        dropped_blocks = dropped.count() if metrics else None
        # keep only pairs with ≥1 new side (old×old pairs already exist)
        cand = cand.join(
            new_ids.withColumnRenamed("record_id", "id_l"), "id_l", "left_semi"
        ).unionByName(
            cand.join(
                new_ids.withColumnRenamed("record_id", "id_r"), "id_r", "left_semi"
            )
        ).dropDuplicates(["resolver", "id_l", "id_r"]).localCheckpoint()

        # match material by id for TOUCHED pair ids only — new ids reuse
        # the records already built above; only OLD partners hit the
        # bucket-pruned values scan
        pair_ids = (
            cand.select(F.col("id_l").alias("record_id"))
            .unionByName(cand.select(F.col("id_r").alias("record_id")))
            .distinct()
        )
        old_pair_ids = pair_ids.join(new_ids, "record_id", "left_anti")
        records_old, _ = rebuild_records(old_pair_ids, want_metrics=False)
        parts = [r for r in (records_new, records_old) if r is not None]
        if not parts:
            edges_new = spark.createDataFrame([], "id_l string, id_r string")
        else:
            records_pairs = parts[0] if len(parts) == 1 else (
                parts[0].unionByName(parts[1]))
            pairs = verify_pairs(cand, compiled, records_pairs)
            # materialize: the commit executes the verify/gate plan and
            # delta mode's touched-set union would re-execute it
            edges_new = gate_edges(pairs, compiled).select(
                "id_l", "id_r").localCheckpoint()
        _commit_once(store, edges_new, "edges", "edges", fp)

        if clusters_mode == "delta":
            _delta_assignments(spark, store, edges_new, new_ids, batch_id,
                               fp, n_buckets, metrics,
                               config.cc_max_iterations)
        else:
            edges_all = store.read_all(spark, "edges").dropDuplicates(
                ["id_l", "id_r"])
            all_ids = store.read_all(spark, "record_ids").distinct()
            clusters = _cluster_assignments(all_ids, edges_all,
                                            config.cc_max_iterations)
        if metrics:
            batch_rows = batch_turns.count()
            m = spark.createDataFrame(
                [(
                    int(batch_id), batch_rows,
                    int(values_scan_rows or 0), int(keys_scan_rows or 0),
                    int(dropped_blocks or 0),
                )],
                "batch_id long, batch_turn_rows long,"
                " values_scan_rows long, keys_scan_rows long,"
                " dropped_blocks long",
            )
            _commit_once(store, m, "stream_metrics", "stream_metrics", fp)
        # completion marker LAST: full mode's corpus snapshot, or delta
        # mode's tiny batch_done row. Full mode commits clusters as an
        # OVERWRITE (each batch's view supersedes the last — without
        # this, a long stream accumulates one corpus-sized snapshot per
        # micro-batch, O(batches x corpus) storage)
        if clusters_mode == "full":
            _commit_once(store, clusters, "clusters", "clusters", fp,
                         overwrite=True)
        else:
            done = spark.createDataFrame([(int(batch_id),)], "batch_id long")
            _commit_once(store, done, "batch_done", "batch_done", fp)
        # Table maintenance (Iceberg rewrite_data_files analog): without
        # it, a long-running stream's append tables accumulate one
        # snapshot per micro-batch and per-batch reads degrade with
        # STREAM AGE, not batch size. Logarithmic merging keeps live
        # snapshots O(log corpus) at O(log) amortized rewrites per row
        # (PLANS.md rule 15). Runs after the completion marker: it moves
        # bytes, never rows, so a crash mid-maintenance replays as a
        # no-op batch and a later trigger restores the invariant.
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            tables = [("values", ["rb"]), ("attrfields", ["rb"]),
                      ("blkeys", ["kb"]),
                      ("edges", None), ("record_ids", None),
                      ("stream_metrics", None)]
            if clusters_mode == "delta":
                tables += [("assign", ["rb"]), ("cmembers", ["cb"]),
                           ("assign_metrics", None), ("batch_done", None)]
            for tbl, pb in tables:
                store.maintain(spark, tbl, partition_by=pb)

    writer = stream_turns.writeStream.foreachBatch(process_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


# ----------------------------------------------------------------------
# Incremental near-duplicate deduplication: the streaming twin of
# extras.near_dup_dedup. Same LSH family as the batch operator
# (banded MinHash candidates, exact-Jaccard verify on xxhash64-hashed
# shingle sets) and the same keeper rule (group id = min member id,
# via zero-padded ids), maintained incrementally: per micro-batch,
# NEW documents' signatures are committed to bucketed append tables,
# candidates are generated new×accumulated through partition-pruned
# bucket scans, and group assignments evolve through the same
# incremental union-find delta log as incremental_resolve. Per-batch
# work ∝ |batch| × LSH fan-out — never O(corpus).

_DEDUP_PAD = 32  # near_dup_dedup's id pad width: lexicographic min == numeric min


def _check_dedup_meta(output_root: str, n_buckets: int, k: int, bands: int,
                      jaccard_threshold: float, text_col: str,
                      id_col: str, max_block_size: int | None) -> None:
    """Pin the dedup store's physical + algorithmic parameters, same
    contract as _check_stream_meta: committed signatures were computed
    under (k, bands) and live in pmod(xxhash64, n_buckets) partition
    dirs, so resuming with different values would join new batches'
    signatures against incomparable committed ones (or scan the wrong
    bucket dirs) with no error; the threshold decides which edges were
    committed, so changing it mid-store silently mixes regimes — and so
    does max_block_size (it decides which candidate BLOCKS contributed
    edges: resuming with a higher cap would mix two candidate-
    generation regimes with no record of the change). The column names
    are pinned too: resuming with a different text_col would join
    signatures computed over DIFFERENT source columns.

    Fingerprint schema history: max_block_size joined the pinned set in
    session 15 — a store created before that carries the old hash and
    refuses to resume even with identical parameters; rebuild it
    (stores are derived state: re-stream the inputs). Deliberate trade:
    silently resuming across a cap change mixes candidate-generation
    regimes, which is worse than an explicit rebuild."""
    fp = hashlib.sha256(
        json.dumps({"k": k, "bands": bands, "jaccard": jaccard_threshold,
                    "text_col": text_col, "id_col": id_col,
                    "max_block_size": max_block_size},
                   sort_keys=True).encode()
    ).hexdigest()
    _check_stream_meta(output_root, n_buckets, "dedup", fp)


def incremental_dedup(spark: SparkSession, stream_docs: DataFrame,
                      output_root: str, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3, bands: int = 8,
                      jaccard_threshold: float = 0.5,
                      checkpoint_dir: str | None = None,
                      n_buckets: int = 64, metrics: bool = True,
                      maintain_every: int | None = 1,
                      max_block_size: int | None = 10000,
                      cc_max_iterations: int = 30,
                      rebind_checkpoint: bool = False):
    """Incremental MinHash-LSH near-dup dedup via foreachBatch —
    O(batch) per micro-batch. Committed tables (append snapshots):

      sigkeys     skinny LSH keys (ckey=xxhash64(band|minhash),
                  record_id), hash-bucketed by ckey (`kb`)
      shsets      per-doc xxhash64 shingle sets, bucketed by id (`rb`)
      record_ids  (record_id, doc_id) pad↔original id map
      edges       verified near-dup edges (id_l, id_r, jaccard)
      assign/cmembers/assign_metrics/batch_done
                  the incremental union-find delta log (shared
                  machinery with incremental_resolve, delta mode)
      stream_metrics  per-batch observability incl. pruned-scan rows

    Per micro-batch:

      1. batch docs → banded MinHash signatures + hashed shingle sets
         (batch-only compute) → committed bucketed;
      2. the batch's LSH keys' buckets are fetched from the committed
         sigkeys table by PARTITION-PRUNED scan (touched kb dirs only)
         + broadcast semi-join → capped/salted self-join → candidate
         pairs with ≥1 new side;
      3. old partners' shingle sets fetched by rb-pruned scan, exact
         Jaccard ≥ threshold → edges appended;
      4. incremental union-find merges the touched groups (per-batch
         delta rows ∝ touched components — see _delta_assignments).

    Keeper semantics match extras.near_dup_dedup exactly: ids enter
    the union-find zero-padded to width 32 so the min-id group rule is
    numeric for integral ids, and current_keepers() maps back through
    the committed (record_id, doc_id) table — (doc_id, group_id,
    kept). Ids longer than 32 chars (lpad would truncate) and
    multi-char ids with a leading '0' (the only possible pad
    collision) are rejected per batch. NULL-text docs are kept as
    singletons and never paired — batch parity.

    A doc is expected to arrive EXACTLY ONCE across the stream's
    lifetime (checkpoint replays are idempotent via per-table batch
    fingerprints); re-sending a doc_id in a later batch re-commits its
    signatures — pairs stay correct (dedup'd by id pair) but scan
    metrics double-count it. Same Iceberg mapping as
    incremental_resolve: the bucketed tables are bucket-transform
    partitioned tables, n_buckets sized ≫ executor count at scale."""
    from zentity_spark.blocking import candidate_pairs
    from zentity_spark.extras import shingles
    from zentity_spark.storage import SnapshotStore

    _check_dedup_meta(output_root, n_buckets, k, bands, jaccard_threshold,
                      text_col, id_col, max_block_size)
    store = SnapshotStore(output_root)
    _bind_checkpoint_lineage(
        output_root, checkpoint_dir,
        has_batches=bool(store.snapshots("batch_done")),
        rebind=rebind_checkpoint,
    )

    def bucket_of(col: str) -> F.Column:
        return _bucket_of(col, n_buckets)

    _SIG_SCHEMA = "record_id string, ckey long"

    def process_batch(batch_docs, batch_id: int):
        fp = f"batch-{batch_id}"
        if store.contains_fingerprint("batch_done", fp):
            return  # replayed batch after restart: fully committed
        docs = batch_docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(text_col).alias("text"),
        ).dropDuplicates(["doc_id"]).localCheckpoint()
        # two pad hazards, both hard errors: >32 chars would truncate;
        # a multi-char id STARTING with '0' is the only way two
        # distinct ids can zero-pad to the same key (pad(a)==pad(b),
        # a≠b ⇒ the longer one is '0'*n + the shorter ⇒ leading '0'),
        # and a collision would silently union-find two docs as one
        bad = docs.where(
            F.col("doc_id").isNull()  # NULL passes >/startswith as NULL
            | (F.length("doc_id") > _DEDUP_PAD)
            | ((F.length("doc_id") > 1) & F.col("doc_id").startswith("0"))
        ).limit(1).collect()
        if bad:
            raise ValueError(
                f"unsupported doc id {bad[0][0]!r}: NULL ids, ids longer "
                f"than {_DEDUP_PAD} chars, or multi-char ids with a "
                "leading '0' break the zero-pad min-id keeper rule "
                "(a NULL-keyed record silently drops from every join; "
                "truncation / pad collision)"
            )
        pad = F.lpad(F.col("doc_id"), _DEDUP_PAD, "0")
        ids_new = docs.select(pad.alias("record_id"), "doc_id").localCheckpoint()
        _commit_once(store, ids_new, "record_ids", "record_ids", fp)
        new_ids = ids_new.select("record_id")

        # one shingle pass feeds BOTH the signatures and the verify
        # sets (the expensive part is canonicalize+split+shingle).
        # NULL-text docs are excluded HERE, not at ingest: the batch
        # twin never pairs them (NULL minhash never meets a join key),
        # but they stay in record_ids so current_keepers still emits
        # their singleton row — exact batch-output parity
        sh = docs.where(F.col("text").isNotNull()).select(
            pad.alias("record_id"),
            shingles(F.col("text"), k).alias("shingle_arr"),
        ).localCheckpoint()
        sets_new = sh.select(
            "record_id",
            F.transform("shingle_arr", lambda s: F.xxhash64(s)).alias("sh"),
        ).localCheckpoint()
        _commit_once(store, sets_new.withColumn("rb", bucket_of("record_id")),
                     "shsets", "shsets", fp, partition_by=["rb"])
        exploded = sh.select("record_id",
                             F.explode("shingle_arr").alias("shingle"))
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle"))))
            .alias(f"_h{b}")
            for b in range(bands)
        ]
        # same banded-min plan shape as extras.minhash_signatures (all
        # bands as columns through ONE partial-aggregated groupBy), then
        # collapsed straight to the skinny int64 LSH key
        wide = exploded.groupBy("record_id").agg(*aggs)
        stack_args = ", ".join(f"'{b}', _h{b}" for b in range(bands))
        keys_new = wide.select(
            "record_id",
            F.expr(f"stack({bands}, {stack_args}) AS (band, minhash)"),
        ).select(
            "record_id",
            F.xxhash64(F.concat_ws("|", "band", "minhash")).alias("ckey"),
        ).localCheckpoint()
        _commit_once(store, keys_new.withColumn("kb", bucket_of("ckey")),
                     "sigkeys", "sigkeys", fp, partition_by=["kb"])

        # new × all: only LSH buckets containing a NEW doc can produce
        # new pairs — partition-pruned scan of committed keys (touched
        # kb dirs only) + broadcast semi-join, then the capped+salted
        # self-join (a degenerate shingle shared by a million docs is a
        # dropped-and-reported block, not an O(b²) task)
        touched = keys_new.select("ckey").distinct()
        keys_scan = _read_bucket_dirs(
            spark, store, "sigkeys", "kb",
            _touched_buckets(keys_new, "ckey", n_buckets))
        if keys_scan is None:  # empty batch
            keys_scan = spark.createDataFrame([], _SIG_SCHEMA)
        keys_scan = keys_scan.localCheckpoint()
        keys_scan_rows = keys_scan.count() if metrics else None
        block_rows = (
            keys_scan.join(F.broadcast(touched), "ckey", "left_semi")
            .select(F.lit("minhash").alias("resolver"), "ckey", "record_id")
            .dropDuplicates(["ckey", "record_id"])
        )
        cand, dropped = candidate_pairs(block_rows,
                                        max_block_size=max_block_size)
        dropped_blocks = (
            dropped.count() if (metrics and dropped is not None) else None
        )
        cand = cand.join(
            new_ids.withColumnRenamed("record_id", "id_l"), "id_l", "left_semi"
        ).unionByName(
            cand.join(
                new_ids.withColumnRenamed("record_id", "id_r"), "id_r",
                "left_semi")
        ).dropDuplicates(["id_l", "id_r"]).select("id_l", "id_r") \
         .localCheckpoint()

        # exact-Jaccard verify: new ids reuse this batch's sets; only
        # OLD partners hit the rb-pruned committed shsets scan
        pair_ids = (
            cand.select(F.col("id_l").alias("record_id"))
            .unionByName(cand.select(F.col("id_r").alias("record_id")))
            .distinct()
        )
        old_ids = pair_ids.join(new_ids, "record_id", "left_anti")
        sets_scan_rows = None
        sets_old = _read_bucket_dirs(
            spark, store, "shsets", "rb",
            _touched_buckets(old_ids, "record_id", n_buckets))
        if sets_old is None:
            sets = sets_new
        else:
            sets_old = sets_old.localCheckpoint()
            if metrics:
                sets_scan_rows = sets_old.count()
            sets = sets_new.unionByName(
                sets_old.select("record_id", "sh")
                .join(old_ids, "record_id", "left_semi")
            )
        edges_new = (
            cand.join(sets.select(F.col("record_id").alias("id_l"),
                                  F.col("sh").alias("sh_l")), "id_l")
            .join(sets.select(F.col("record_id").alias("id_r"),
                              F.col("sh").alias("sh_r")), "id_r")
            .withColumn(
                "jaccard",
                F.round(F.size(F.array_intersect("sh_l", "sh_r"))
                        / F.size(F.array_union("sh_l", "sh_r")), 6),
            )
            .where(F.col("jaccard") >= jaccard_threshold)
            .select("id_l", "id_r", "jaccard").localCheckpoint()
        )
        _commit_once(store, edges_new, "edges", "edges", fp)

        _delta_assignments(spark, store,
                           edges_new.select("id_l", "id_r"), new_ids,
                           batch_id, fp, n_buckets, metrics,
                           cc_max_iterations)
        if metrics:
            m = spark.createDataFrame(
                [(
                    int(batch_id), int(docs.count()),
                    int(keys_scan_rows or 0), int(sets_scan_rows or 0),
                    int(dropped_blocks or 0),
                )],
                "batch_id long, batch_docs long, sigkeys_scan_rows long,"
                " shsets_scan_rows long, dropped_blocks long",
            )
            _commit_once(store, m, "stream_metrics", "stream_metrics", fp)
        done = spark.createDataFrame([(int(batch_id),)], "batch_id long")
        _commit_once(store, done, "batch_done", "batch_done", fp)
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            for tbl, pb in [("sigkeys", ["kb"]), ("shsets", ["rb"]),
                            ("record_ids", None), ("edges", None),
                            ("assign", ["rb"]), ("cmembers", ["cb"]),
                            ("assign_metrics", None), ("batch_done", None),
                            ("stream_metrics", None)]:
                store.maintain(spark, tbl, partition_by=pb)

    writer = stream_docs.writeStream.foreachBatch(process_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def current_keepers(spark: SparkSession, store) -> DataFrame | None:
    """Materialize the dedup view from an incremental_dedup store:
    (doc_id, group_id, kept) with extras.near_dup_dedup's exact
    semantics — group id = min member id (numeric for integral ids via
    the zero-pad), kept = doc is its group's representative. On-demand
    O(corpus) materialization; no per-batch cost."""
    assigned = current_assignments(spark, store)
    if assigned is None:
        return None
    idmap = store.read_all(spark, "record_ids").dropDuplicates(["record_id"])
    return (
        assigned
        .join(idmap, "record_id")
        .join(idmap.select(F.col("record_id").alias("cluster_id"),
                           F.col("doc_id").alias("group_id")), "cluster_id")
        .select("doc_id", "group_id",
                (F.col("doc_id") == F.col("group_id")).alias("kept"))
    )


# ----------------------------------------------------------------------
# Incremental ANN index maintenance: the streaming twin of
# extras.banded_lsh_buckets + ann_topk_bucketed. New vectors' banded
# hyperplane-LSH bucket rows are committed per micro-batch to a
# hash-bucketed append table (the Iceberg bucket-transform analog), and
# queries probe the COMMITTED index through partition-pruned scans —
# index maintenance is O(batch), a query is O(probe set), and neither
# ever rebuilds or rescans the accumulated corpus.


def _ann_geometry_token(dim: int, bands: int, planes_per_band: int) -> str:
    """The index geometry, serialized VERBATIM into the store meta's
    fingerprint slot — pinning it (committed sign patterns are only
    comparable under the same planes) AND letting ann_index_query
    recover the exact values instead of trusting caller-supplied ones."""
    return json.dumps({"dim": dim, "bands": bands, "r": planes_per_band},
                      sort_keys=True, separators=(",", ":"))


def incremental_ann_index(spark: SparkSession, stream_embeddings: DataFrame,
                          output_root: str, dim: int = 64, bands: int = 16,
                          planes_per_band: int = 8,
                          checkpoint_dir: str | None = None,
                          n_buckets: int = 64, metrics: bool = True,
                          maintain_every: int | None = 1,
                          rebind_checkpoint: bool = False):
    """foreachBatch incremental banded hyperplane-LSH index. Committed
    tables (append snapshots):

      buckets   (vec_id, band, bucket, ckey) — one row per vector per
                band, exactly extras.banded_lsh_buckets' rows; hash-
                bucketed by the int64 (band, bucket) probe key (`kb`),
                so a query touching b band-buckets prunes to ≤ b
                partition dirs regardless of corpus size
      vectors   (vec_id, label, embedding, nrm) hash-bucketed by vec_id
                (`rb`) — probe-time match material fetched by id; norms
                precomputed once at ingest (extras.vec_norm)
      stream_metrics / batch_done

    Per micro-batch: ONE Arrow matmul computes every band's bucket for
    the NEW vectors only (extras._banded_buckets_udf — the plan shape
    PLANS.md rule 11 measured 57× over inlined expressions), both
    tables committed bucketed, done. No corpus-sized work exists on the
    write path; replays are fingerprint-idempotent; resume rules are
    _bind_checkpoint_lineage's; the geometry (dim/bands/r) is pinned in
    the store meta and recovered by ann_index_query. A vec_id is
    expected to arrive exactly once across the stream's lifetime.
    Queries: ann_index_query."""
    from zentity_spark.extras import _banded_buckets_udf, vec_norm
    from zentity_spark.storage import SnapshotStore

    _check_stream_meta(output_root, n_buckets, "ann",
                       _ann_geometry_token(dim, bands, planes_per_band))
    store = SnapshotStore(output_root)
    _bind_checkpoint_lineage(
        output_root, checkpoint_dir,
        has_batches=bool(store.snapshots("batch_done")),
        rebind=rebind_checkpoint,
    )
    udf = _banded_buckets_udf(dim, bands, planes_per_band)

    def process_batch(batch_emb, batch_id: int):
        fp = f"batch-{batch_id}"
        if store.contains_fingerprint("batch_done", fp):
            return  # replayed batch after restart: fully committed
        # ids normalized to LONG at ingest: xxhash64 is type-sensitive
        # (int 5 and long 5 land in different rb dirs), and
        # ann_index_query probes with a long. Under default (non-ANSI)
        # Spark a non-integral/string id casts to NULL silently, so
        # guard explicitly: a NULL-keyed vector row would be committed
        # but unqueryable (the probe joins on a long vec_id).
        vecs = batch_emb.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            "label", "embedding",
            vec_norm(F.col("embedding")).alias("nrm"),
        ).dropDuplicates(["vec_id"]).localCheckpoint()
        if vecs.where(F.col("vec_id").isNull()).limit(1).count():
            raise ValueError(
                "vec_id must be integral (castable to LONG): a NULL or "
                "non-integral id would commit a vector row no query can "
                "reach (ann_index_query probes by long vec_id)"
            )
        _commit_once(
            store,
            vecs.withColumn("rb", _bucket_of("vec_id", n_buckets)),
            "vectors", "vectors", fp, partition_by=["rb"])
        rows = vecs.select(
            "vec_id", udf(F.col("embedding")).alias("_buckets")
        ).select(
            "vec_id", F.posexplode("_buckets").alias("band", "bucket")
        ).select(
            "vec_id", F.col("band").cast("int").alias("band"), "bucket",
            F.xxhash64(F.concat_ws(
                "|", F.col("band").cast("int"), "bucket")).alias("ckey"),
        ).localCheckpoint()
        _commit_once(
            store,
            rows.withColumn("kb", _bucket_of("ckey", n_buckets)),
            "buckets", "buckets", fp, partition_by=["kb"])
        if metrics:
            m = spark.createDataFrame(
                [(int(batch_id), int(vecs.count()), int(rows.count()))],
                "batch_id long, batch_vectors long, bucket_rows long",
            )
            _commit_once(store, m, "stream_metrics", "stream_metrics", fp)
        done = spark.createDataFrame([(int(batch_id),)], "batch_id long")
        _commit_once(store, done, "batch_done", "batch_done", fp)
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            for tbl, pb in [("buckets", ["kb"]), ("vectors", ["rb"]),
                            ("stream_metrics", None), ("batch_done", None)]:
                store.maintain(spark, tbl, partition_by=pb)

    writer = stream_embeddings.writeStream.foreachBatch(process_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def ann_index_query(spark: SparkSession, output_root: str,
                    query_vec_id: int, k: int = 10,
                    multiprobe: int = 0, with_metrics: bool = False):
    """Top-k cosine query against a committed incremental_ann_index
    store WITHOUT rescanning the corpus:

      1. the query vector is fetched by rb-pruned scan of `vectors`
         (one partition dir);
      2. its per-band buckets are computed DRIVER-SIDE with the same
         numpy matmul + sign packing as the index writer (model-sized:
         one dim-vector against the cached plane matrix; geometry
         recovered from the store's pinned meta, so a query can't
         silently probe with the wrong planes); multiprobe=1 expands
         each band bucket to its Hamming-1 neighborhood
         (extras.multiprobe_bucket_variants semantics);
      3. the probe set is a PARTITION-PRUNED read of `buckets` over the
         ≤ bands·(r+1) touched kb dirs + a broadcast join on the
         (band, bucket) key;
      4. match material is fetched by rb-pruned scan of `vectors` for
         the probe ids; exact cosine from precomputed norms;
         deterministic top-k (desc cosine, asc vec_id); query excluded.

    Query cost ∝ probe-set size — the kb dirs touched are bounded by
    the query's bucket count, never the corpus. Returns the top-k
    DataFrame (vec_id, label, cosine), or (df, metrics_dict) with
    scanned-row counts when with_metrics=True."""
    import numpy as np

    from zentity_spark.extras import _plane_matrix, cosine_from_norms
    from zentity_spark.storage import SnapshotStore

    with open(os.path.join(output_root, _STREAM_META)) as fh:
        meta = json.load(fh)
    if meta.get("clusters_mode") != "ann":
        raise ValueError(
            f"{output_root} is not an incremental_ann_index store")
    geo = json.loads(meta["model_fingerprint"])
    dim, bands, r = geo["dim"], geo["bands"], geo["r"]
    n_buckets = meta["n_buckets"]
    store = SnapshotStore(output_root)

    qid = spark.createDataFrame([(int(query_vec_id),)], "vec_id long")
    qscan = _read_bucket_dirs(spark, store, "vectors", "rb",
                              _touched_buckets(qid, "vec_id", n_buckets))
    qrow = (qscan.where(F.col("vec_id") == query_vec_id)
            .select("embedding", "nrm").limit(1).collect()
            if qscan is not None else [])
    if not qrow:
        raise ValueError(f"vec_id {query_vec_id} not found in the index")
    qvec, qnrm = qrow[0][0], float(qrow[0][1])

    # driver-side buckets: identical math to the writer's Arrow pass
    x = np.asarray(qvec, dtype="float64")
    m = _plane_matrix(dim, bands * r)
    bits = (x @ m) > 0
    w = np.left_shift(np.int64(1), np.arange(r, dtype="int64"))
    probes = []
    for b in range(bands):
        bucket = int(bits[b * r:(b + 1) * r].astype("int64") @ w)
        probes.append((b, bucket))
        if multiprobe >= 1:
            probes.extend((b, bucket ^ (1 << i)) for i in range(r))
    probe_df = spark.createDataFrame(
        sorted(set(probes)), "band int, bucket long"
    ).withColumn(
        "ckey", F.xxhash64(F.concat_ws("|", "band", "bucket"))
    ).localCheckpoint()

    bscan = _read_bucket_dirs(spark, store, "buckets", "kb",
                              _touched_buckets(probe_df, "ckey", n_buckets))
    if bscan is None:
        empty = spark.createDataFrame(
            [], "vec_id long, label string, cosine double")
        return (empty, {"probe_ids": 0, "bucket_scan_rows": 0,
                        "vector_scan_rows": 0}) if with_metrics else empty
    bscan = bscan.localCheckpoint()
    bucket_scan_rows = bscan.count() if with_metrics else None
    probe_ids = (
        bscan.join(F.broadcast(probe_df.select("band", "bucket")),
                   ["band", "bucket"])
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id").distinct().localCheckpoint()
    )
    vscan = _read_bucket_dirs(spark, store, "vectors", "rb",
                              _touched_buckets(probe_ids, "vec_id",
                                               n_buckets))
    if vscan is None:
        empty = spark.createDataFrame(
            [], "vec_id long, label string, cosine double")
        return (empty, {"probe_ids": 0,
                        "bucket_scan_rows": int(bucket_scan_rows or 0),
                        "vector_scan_rows": 0}) if with_metrics else empty
    vscan = vscan.localCheckpoint()
    vector_scan_rows = vscan.count() if with_metrics else None
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    out = (
        vscan.join(probe_ids, "vec_id")
        .select(
            "vec_id", "label",
            F.round(
                cosine_from_norms(F.col("embedding"), qlit,
                                  F.col("nrm"), F.lit(qnrm)), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
    if with_metrics:
        return out, {
            "probe_ids": probe_ids.count(),
            "bucket_scan_rows": int(bucket_scan_rows or 0),
            "vector_scan_rows": int(vector_scan_rows or 0),
        }
    return out
