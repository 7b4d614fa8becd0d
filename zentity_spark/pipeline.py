"""Batch resolution pipeline: transcripts → clusters.

Stage flow (SURVEY.md §3.1 "Spark equivalent lifecycle"):

  1. scan + extract     transcripts → long values → wide records
  2. blocking           per-resolver composite keys → candidate pairs
  3. verification       vectorized matcher predicates → matched pairs
  4. weight gating      → edges
  5. clustering         large-star/small-star CC → clusters
  6. (optional) entity closure — see below

Entity closure: the reference matches documents against the ACCUMULATED
value set of the growing entity (Job.java:1096-1113), so a document can
join via a combination of values that no single prior document holds
(e.g. resolver_b with attribute_b from doc X and attribute_c from doc Y).
Pairwise edges can't see such cross-document combinations; the closure
loop re-blocks CLUSTERS as super-records (their unioned value sets),
finds inter-cluster matches, adds them as edges between cluster
representatives (cluster id = min record id = a real record), re-runs CC,
and repeats to fixpoint — exactly the accumulate-and-query semantics,
amortized over all entities at once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zentity_spark.blocking import blocking_keys, candidate_pairs
from zentity_spark.clustering import connected_components
from zentity_spark.compiler import CompiledModel, compile_model
from zentity_spark.model import Model
from zentity_spark.pairs import gate_edges, verify_pairs
from zentity_spark.transcripts import build_records, build_values, parse_turns


@dataclass
class ResolutionConfig:
    max_block_size: int | None = 10_000
    max_keys_per_record: int = 256
    entity_closure: bool = True
    closure_max_rounds: int = 10
    cc_max_iterations: int = 50
    # junk-value suppression: drop attribute values held by more than
    # this many records (None = off). The scale analog of the
    # reference's blank-value skipping (Query.java:206-208): a value
    # shared by thousands of records (support@..., 000-000-0000, empty
    # defaults) carries no identity signal and otherwise chains false
    # merges through connected components.
    max_value_frequency: int | None = None
    # compute the scored-pairs artifact (JW/Lev/Soundex/Jaccard features
    # per candidate pair over assembled conversation text — the
    # _explanation/_score analog, Arrow-batched pandas UDF)
    score_candidate_pairs: bool = False
    # last run's (record_id, entity_id) assignment: when set, the result
    # carries `entity_ids` — this run's clusters keyed by PERSISTENT
    # entity ids via clustering.stable_entity_ids (greedy max-overlap
    # crosswalk; splits keep the id on the bigger half, new clusters
    # mint `new:<cluster_id>#<membership-digest>`). The reference never
    # needs this because
    # it resolves one entity per request — the request is the key; a
    # batch engine re-deriving CC labels each run must carry them.
    prev_assignments: DataFrame | None = None


@dataclass
class ResolutionResult:
    records: DataFrame
    pairs: DataFrame      # matched pairs + matched_resolvers (pre-gating)
    edges: DataFrame      # post weight-gating (id_l, id_r)
    clusters: DataFrame   # (record_id, cluster_id)
    metrics: list = field(default_factory=list)
    scored_pairs: DataFrame | None = None  # similarity features per candidate pair
    # (record_id, entity_id) under run-over-run-stable ids; None unless
    # config.prev_assignments was provided
    entity_ids: DataFrame | None = None


def _build_filtered_values(spark, turns, compiled, config) -> DataFrame:
    """Long values table with the hot-value (junk-value) filter applied."""
    values = build_values(spark, turns, compiled)
    if config.max_value_frequency is not None:
        # rule 18 (two consumers): the frequency aggregate AND the
        # anti-join's left side both read the full values derivation
        # (scan + regex extraction + key hashing); uncheckpointed, the
        # whole thing runs twice. Neutral at bench scale (the input is
        # memory-resident; interleaved A/B within window noise) but
        # decisive at corpus scale, where the doubled work is two full
        # scans of the raw input vs one scan plus a write+read of the
        # much smaller values table.
        values = values.localCheckpoint()
        hot = (
            values.groupBy("attribute", "raw")
            .agg(F.count_distinct("record_id").alias("freq"))
            .where(F.col("freq") > config.max_value_frequency)
            .select("attribute", "raw")
        )
        values = values.join(F.broadcast(hot), ["attribute", "raw"], "left_anti")
    return values


def _cluster_assignments(records: DataFrame, edges: DataFrame,
                         cc_max_iterations: int) -> DataFrame:
    assignments = connected_components(
        edges.select(F.col("id_l").alias("src"), F.col("id_r").alias("dst")),
        max_iterations=cc_max_iterations,
    )
    return (
        records.select("record_id")
        .join(assignments, "record_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "record_id"))
    )


def resolve_all(
    spark: SparkSession,
    turns: DataFrame,
    model: Model | CompiledModel,
    config: ResolutionConfig | None = None,
) -> ResolutionResult:
    """Resolve ALL entities in one batch."""
    config = config or ResolutionConfig()
    compiled = model if isinstance(model, CompiledModel) else compile_model(model)

    parsed = parse_turns(turns)
    values = _build_filtered_values(spark, turns, compiled, config)
    records = build_records(values, compiled, parsed).localCheckpoint()

    blocks, key_capped = blocking_keys(
        records, compiled, max_keys_per_record=config.max_keys_per_record,
        return_key_capped=True,
    )
    cand, dropped = candidate_pairs(blocks, max_block_size=config.max_block_size)
    if config.score_candidate_pairs:
        # the candidate set feeds TWO consumers (verify→edges and the
        # scored-pairs artifact); without this the scored collect
        # re-runs the whole blocking + self-join lineage a second time
        cand = cand.localCheckpoint()
    pairs = verify_pairs(cand, compiled, records)
    edges = gate_edges(pairs, compiled).localCheckpoint()
    clusters = _cluster_assignments(records, edges, config.cc_max_iterations)

    metrics = [("blocking.key_capped_records", key_capped)]
    if dropped is not None:
        metrics.append(("blocking.dropped_blocks", dropped))

    if config.entity_closure:
        clusters = _entity_closure(
            spark, values, records, edges, clusters, compiled, config
        )

    scored = None
    if config.score_candidate_pairs:
        from zentity_spark.scoring import score_pairs
        from zentity_spark.transcripts import assemble_conversations

        conv_texts = assemble_conversations(turns).select(
            F.col("conv_id").alias("record_id"), "conv_text"
        )
        scored = score_pairs(
            cand.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"]), conv_texts
        )

    entity_ids = None
    if config.prev_assignments is not None:
        from zentity_spark.clustering import stable_entity_ids

        # clusters feeds BOTH the crosswalk's overlap join and the
        # member expansion below — one materialization (rule 18)
        clusters = clusters.localCheckpoint()
        xwalk = stable_entity_ids(config.prev_assignments, clusters)
        entity_ids = clusters.join(
            xwalk.select("cluster_id", "entity_id"), "cluster_id"
        ).select("record_id", "entity_id")

    return ResolutionResult(records=records, pairs=pairs, edges=edges,
                            clusters=clusters, metrics=metrics,
                            scored_pairs=scored, entity_ids=entity_ids)


def _entity_closure(spark, values, records, edges, clusters, compiled, config) -> DataFrame:
    """Iterate: re-block clusters as super-records until no merges."""
    edges = edges.select("id_l", "id_r")
    # every round re-reads values (and round 0's lineage reaches back to
    # the raw turns) — materialize once, not once per round
    values = values.localCheckpoint()
    for _ in range(config.closure_max_rounds):
        clusters = clusters.localCheckpoint()
        n_clusters = clusters.select("cluster_id").distinct().count()
        if n_clusters <= 1:
            break

        # cluster-level wide records: the union of member value material
        # ACROSS sources — build_records groups by (record_id, source),
        # so the member docs' sources must collapse or a cluster spanning
        # indices gets one PARTIAL record per index and a resolver whose
        # attributes are spread across indices never sees the
        # accumulated set (the exact Job.java:1096-1113 semantics this
        # loop exists for)
        cvalues = (
            values.join(clusters, "record_id").drop("record_id")
            .withColumnRenamed("cluster_id", "record_id")
            .withColumn("source", F.lit("__cluster__"))
        )
        crecords = build_records(cvalues, compiled, parsed=None)
        if not compiled.weights_all_equal:
            # weight-tier exists-gates need the cluster's field presence:
            # the union of member records' attr_name_fields. parsed=None
            # above leaves them empty, which would make must_not(exists)
            # pass vacuously and re-admit edges round 0 suppressed.
            cfields = (
                records.select("record_id",
                               F.explode("attr_name_fields").alias("f"))
                .join(clusters, "record_id")
                .groupBy("cluster_id")
                .agg(F.sort_array(F.collect_set("f")).alias("_af"))
                .withColumnRenamed("cluster_id", "record_id")
            )
            crecords = (
                crecords.drop("attr_name_fields")
                .join(cfields, "record_id", "left")
                .withColumn(
                    "attr_name_fields",
                    F.coalesce(F.col("_af"), F.array().cast("array<string>")),
                )
                .drop("_af")
            )
        cblocks = blocking_keys(
            crecords, compiled, max_keys_per_record=config.max_keys_per_record
        )
        ccand, _ = candidate_pairs(cblocks, max_block_size=config.max_block_size)
        cpairs = verify_pairs(ccand, compiled, crecords)
        cedges = gate_edges(cpairs, compiled).select("id_l", "id_r")
        if cedges.isEmpty():
            break
        # cluster ids are real record ids (component minimum) — new
        # inter-cluster edges are just more record edges.
        edges = edges.union(cedges).distinct().localCheckpoint()
        clusters = _cluster_assignments(
            records, edges.select(F.col("id_l"), F.col("id_r")), config.cc_max_iterations
        )
    return clusters


# ----------------------------------------------------------------------
# Snapshot-committed, resumable pipeline (north_rule: every stage writes
# per-partition lineage metrics and resumes from the last committed
# snapshot/checkpoint)

def _fingerprint(model_spec: dict, config: ResolutionConfig, input_token: str) -> str:
    import hashlib
    import json as _json

    blob = _json.dumps(
        {
            # bump when a stage's committed schema changes (v2: candidates
            # stage added; pairs stage now keeps the gate columns) so
            # resume never reads an old-shape snapshot
            "stage_schema_version": 2,
            "model": model_spec,
            "config": {
                "max_block_size": config.max_block_size,
                "max_keys_per_record": config.max_keys_per_record,
                "entity_closure": config.entity_closure,
                # iteration caps change the RESULT (a run capped short
                # of fixpoint must not be resumed as if it converged)
                "closure_max_rounds": config.closure_max_rounds,
                "cc_max_iterations": config.cc_max_iterations,
                "max_value_frequency": config.max_value_frequency,
            },
            "input": input_token,
        },
        sort_keys=True,
    )
    return hashlib.md5(blob.encode()).hexdigest()


def resolve_all_checkpointed(
    spark: SparkSession,
    turns: DataFrame,
    model,
    output_root: str,
    input_token: str = "",
    config: ResolutionConfig | None = None,
    run_id: str | None = None,
) -> dict:
    """Stage-committed resolution: records → pairs → edges → clusters,
    each stage committed as a snapshot (storage.SnapshotStore) and served
    from its last snapshot on rerun with an unchanged fingerprint. Every
    stage also commits per-partition lineage counters to the `metrics`
    table. Returns {stage: manifest} for the run."""
    import json as _json
    import uuid as _uuid

    from zentity_spark.storage import SnapshotStore, partition_metrics

    config = config or ResolutionConfig()
    compiled = model if isinstance(model, CompiledModel) else compile_model(model)
    # the FULL canonical spec: matcher clauses, params (fuzziness!), and
    # resolver weights all change the result, so they must change the
    # fingerprint — a derived summary (attr types + resolver attrs)
    # would serve stale snapshots after a matcher edit
    model_spec = compiled.model.spec
    fp = _fingerprint(model_spec, config, input_token)
    run_id = run_id or _uuid.uuid4().hex[:8]
    store = SnapshotStore(output_root)
    manifests = {}

    def stage(name, build):
        """Resume-or-compute one stage."""
        snap = store.latest(name, fingerprint=fp)
        if snap is not None:
            manifests[name] = {**snap, "resumed": True}
            return store.read(spark, name, fingerprint=fp)
        df = build()
        manifests[name] = store.commit(df, name, stage=name, fingerprint=fp)
        out = store.read(spark, name, fingerprint=fp)
        store.commit(partition_metrics(out, name, run_id), "metrics", stage=name,
                     fingerprint="")  # metrics are append-only observability
        return out

    parsed = parse_turns(turns)

    records = stage(
        "records",
        lambda: build_records(
            _build_filtered_values(spark, turns, compiled, config), compiled, parsed
        ),
    )

    _capbox = {}

    def build_cand():
        blocks, key_capped = blocking_keys(
            records, compiled, max_keys_per_record=config.max_keys_per_record,
            return_key_capped=True,
        )
        _capbox["key_capped"] = key_capped
        cand, _ = candidate_pairs(blocks, max_block_size=config.max_block_size)
        return cand

    # candidates are a first-class committed stage: blocking runs ONCE
    # per run, both the verify and scored-pairs stages derive from the
    # same committed pair set, and the candidate counts get lineage rows
    cand = stage("candidates", build_cand)
    if "key_capped" in _capbox:
        # lineage for the max_keys_per_record truncation (recall loss
        # must be observable, same as the dropped-blocks cap)
        store.commit(
            partition_metrics(_capbox["key_capped"], "blocking.key_capped", run_id),
            "metrics", stage="blocking.key_capped", fingerprint="",
        )

    # the pairs stage keeps the weight-gate columns (app_*/fields_*) so
    # the edges stage never re-runs blocking+verify for weighted models
    pairs_full = stage("pairs", lambda: verify_pairs(cand, compiled, records))

    if compiled.weights_all_equal:
        edges = stage(
            "edges", lambda: pairs_full.select("id_l", "id_r", "matched_resolvers")
        )
    else:
        edges = stage("edges", lambda: gate_edges(pairs_full, compiled))

    clusters = stage(
        "clusters",
        lambda: _cluster_assignments(records, edges, config.cc_max_iterations),
    )

    if config.entity_closure:
        # same accumulate-and-requery closure as resolve_all (clusters
        # re-blocked as super-records until fixpoint), committed as its
        # own stage so reruns resume past it
        def build_closed():
            values = _build_filtered_values(spark, turns, compiled, config)
            return _entity_closure(
                spark, values, records,
                edges.select("id_l", "id_r"), clusters, compiled, config,
            )

        clusters = stage("clusters_closed", build_closed)

    if config.score_candidate_pairs:
        from zentity_spark.scoring import score_pairs
        from zentity_spark.transcripts import assemble_conversations

        def build_scored():
            # score ALL candidate pairs (pre-verification) — the same
            # artifact resolve_all produces, so both entry points agree
            # on which pairs carry similarity features
            conv_texts = assemble_conversations(turns).select(
                F.col("conv_id").alias("record_id"), "conv_text"
            )
            return score_pairs(
                cand.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"]),
                conv_texts,
            )

        stage("scored_pairs", build_scored)

    return {"run_id": run_id, "fingerprint": fp, "stages": manifests,
            "clusters": clusters}
