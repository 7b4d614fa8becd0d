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

Scale notes: the streaming path reuses the batch operators' plan shapes
(skinny blocking rows, broadcast model mapping, capped blocks). State
in applyInPandasWithState is per-conversation and bounded by
conversation length; the incremental join is new-batch × accumulated
keys, i.e. |batch| × fan-out, never |corpus|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp"
)


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


def assemble_conversations_stateful(stream_turns: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): accumulate
    each conversation's turns in group state and emit the CURRENT
    assembly on every update — the streaming form of
    transcripts.assemble_conversations, preserving the per-turn text
    equality invariant under (conv_id, turn_idx) ordering. Update-mode
    consumers keep the latest row per conv_id."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdfs, state: GroupState):
        turns: list = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            for ti, tx in zip(pdf["turn_idx"], pdf["text"]):
                turns.append((int(ti), str(tx)))
        turns.sort()
        state.update((turns,))
        import pandas as pd

        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "conv_text": ["\n".join(t for _, t in turns)],
                "n_turns": [len(turns)],
            }
        )

    return (
        stream_turns.groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=ASSEMBLY_OUT_SCHEMA,
            stateStructType=ASSEMBLY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def incremental_resolve(spark: SparkSession, stream_turns: DataFrame, model,
                        output_root: str, config=None,
                        checkpoint_dir: str | None = None):
    """Incremental record linkage via foreachBatch. Per micro-batch:

      1. batch turns → values (batch path) → committed to the store's
         `values` table (append snapshots = the accumulated corpus);
      2. the batch's records are blocked and joined against the
         ACCUMULATED corpus's blocking keys (new × all, including
         new × new) → verified pairs → edges appended to `edges`;
      3. connected components recomputed over the accumulated edge set
         (the CC input is edges — orders of magnitude smaller than the
         corpus) → `clusters` snapshot.

    Returns the StreamingQuery; callers await termination. Resume: all
    three tables are snapshot-committed, so a restarted stream (same
    checkpoint dir) continues from the last committed micro-batch —
    Structured Streaming replays the uncommitted tail and the commit
    fingerprints (batch id) make re-commits idempotent."""
    from zentity_spark.blocking import blocking_keys, candidate_pairs
    from zentity_spark.compiler import compile_model
    from zentity_spark.model import Model
    from zentity_spark.pairs import gate_edges, verify_pairs
    from zentity_spark.pipeline import ResolutionConfig, _cluster_assignments
    from zentity_spark.storage import SnapshotStore
    from zentity_spark.transcripts import build_records, build_values, parse_turns

    config = config or ResolutionConfig()
    compiled = model if not isinstance(model, Model) else compile_model(model)
    store = SnapshotStore(output_root)

    def process_batch(batch_turns, batch_id: int):
        fp = f"batch-{batch_id}"
        if store.latest("values", fingerprint=fp) is not None:
            return  # replayed batch after restart: already committed
        values_new = build_values(spark, batch_turns, compiled)
        store.commit(values_new, "values", stage="values", fingerprint=fp)

        # accumulated corpus = union of every committed values snapshot
        values_all = store.read_all(spark, "values")
        records_all = build_records(
            values_all, compiled, parse_turns(batch_turns)
        ).localCheckpoint()
        new_ids = batch_turns.select(
            F.col("conv_id").alias("record_id")
        ).distinct()

        blocks_all = blocking_keys(
            records_all, compiled, max_keys_per_record=config.max_keys_per_record
        )
        # new × all: only blocks containing a NEW record can produce new
        # pairs — prune the self-join input to those blocks
        new_blocks = blocks_all.join(new_ids, "record_id", "left_semi")
        touched = new_blocks.select("resolver", "ckey").distinct()
        pruned = blocks_all.join(touched, ["resolver", "ckey"], "left_semi")
        cand, _ = candidate_pairs(pruned, max_block_size=config.max_block_size)
        # keep only pairs with ≥1 new side (old×old pairs already exist)
        cand = cand.join(
            new_ids.withColumnRenamed("record_id", "id_l"), "id_l", "left_semi"
        ).unionByName(
            cand.join(
                new_ids.withColumnRenamed("record_id", "id_r"), "id_r", "left_semi"
            )
        ).dropDuplicates(["resolver", "id_l", "id_r"])
        pairs = verify_pairs(cand, compiled, records_all)
        edges_new = gate_edges(pairs, compiled).select("id_l", "id_r")
        store.commit(edges_new, "edges", stage="edges", fingerprint=fp)

        edges_all = store.read_all(spark, "edges").dropDuplicates(["id_l", "id_r"])
        clusters = _cluster_assignments(records_all, edges_all,
                                        config.cc_max_iterations)
        store.commit(clusters, "clusters", stage="clusters", fingerprint=fp)

    writer = stream_turns.writeStream.foreachBatch(process_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
