"""spark-submit entrypoint.

Usage (north_rule launch shape):

    zip -r zentity_spark.zip zentity_spark
    spark-submit --py-files zentity_spark.zip -m zentity_spark.cli ... \
        batch  --model model.json --input /path/transcripts \
               --output /path/warehouse [--input-format parquet]
    ... resolve --model model.json --input /path/transcripts \
               --attributes '{"name": ["alice jones"]}' [--max-hops 5]

`batch` runs the snapshot-committed resolve-all pipeline (resumable);
`resolve` runs a seeded single-entity traversal and prints hits as JSON;
`bulk` runs the NDJSON bulk-resolution body; `stream` runs incremental
record linkage over arriving transcript files (processes everything
available then stops; rerun with the same --checkpoint/--output to pick
up new arrivals exactly once); `dedup-stream` runs incremental
MinHash-LSH near-dup dedup over arriving document files (same
exactly-once/resume semantics); `ann-stream` incrementally maintains a
banded-LSH ANN index over arriving embedding files and `ann-query` runs
a partition-pruned top-k cosine query against the committed store;
`models` manages the entity-model store
(get/list/create/update/delete/bulk/setup, ModelsAction.java:86-99 +
SetupAction.java:43-91); `home` prints the engine metadata body.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    import os

    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # shuffle bytes are the scarce resource at cluster scale; zstd beat
    # lz4 1.44x end-to-end in a pinned fresh-JVM A/B on the headline
    # pipeline (tools/ab_codec.py). Default only — an explicit
    # spark-submit --conf spark.io.compression.codec wins.
    if not SparkConf().contains("spark.io.compression.codec"):
        builder = builder.config("spark.io.compression.codec", "zstd")
    # zstd shrinks compressed shuffle sizes ~3×, and AQE sizes
    # post-shuffle parallelism by COMPRESSED bytes — at the default
    # minPartitionSize (1m), compute-dense verify stages behind small
    # shuffles coalesce to a fraction of the cores (measured 2× wall
    # on the n-gram Jaccard verify). Keep such stages wide by default;
    # an explicit --conf wins as above.
    if not SparkConf().contains(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize"):
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    # spark-submit provides the master; direct `python -m` runs fall back
    # to local mode (overridable via SPARK_MASTER)
    if not SparkConf().contains("spark.master"):
        builder = builder.master(os.environ.get("SPARK_MASTER", "local[*]"))
    return builder.getOrCreate()


def _models_cmd(args) -> int:
    """Models CRUD/bulk/setup over ModelStore, mirroring the reference's
    routes (ModelsAction.java:86-99, SetupAction.java:43-91): GET one /
    GET all / POST create (fails if exists) / PUT update / DELETE /
    POST _bulk (strictly serial, per-item envelopes) / POST _setup.
    Returns the process exit code (0 ok; 1 with the request error
    envelope on a failed non-bulk op — bulk reports per-item errors in
    the body and exits 0, like the reference's 200-with-item-errors)."""
    from zentity_spark.envelope import request_error_json
    from zentity_spark.errors import ValidationException
    from zentity_spark.models_store import ModelStore

    store = ModelStore(args.models_dir)
    indent = 2 if args.pretty else None

    def need(attr: str, flag: str):
        if getattr(args, attr) is None:
            raise ValidationException(
                f"--{flag} is required for 'models {args.verb}'"
            )

    try:
        if args.verb == "setup":
            out = store.setup(exist_ok=not args.no_exist_ok)
        elif args.verb == "get":
            need("entity_type", "entity-type")
            out = store.get(args.entity_type).spec
        elif args.verb == "list":
            out = {name: model.spec for name, model in store.get_all().items()}
        elif args.verb in ("create", "update"):
            need("entity_type", "entity-type")
            need("spec", "spec")
            with open(args.spec) as fh:
                spec = json.load(fh)
            getattr(store, args.verb)(args.entity_type, spec)
            out = {"entity_type": args.entity_type, "result": args.verb + "d"}
        elif args.verb == "delete":
            need("entity_type", "entity-type")
            store.delete(args.entity_type)
            out = {"entity_type": args.entity_type, "result": "deleted"}
        else:  # bulk
            need("body", "body")
            with open(args.body) as fh:
                body = fh.read()
            default = (
                {"entity_type": args.entity_type} if args.entity_type else None
            )
            out = {"items": store.bulk_ndjson(body, default_params=default)}
    except Exception as e:  # noqa: BLE001 — request-level error envelope
        print(request_error_json(e))
        return 1
    print(json.dumps(out, indent=indent))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="zentity-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("batch", help="resolve all entities (checkpointed)")
    b.add_argument("--model", required=True)
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--input-format", default="parquet")
    b.add_argument("--max-block-size", type=int, default=10_000)
    b.add_argument("--entity-closure", action="store_true")
    b.add_argument("--max-value-frequency", type=int, default=None,
                   help="drop attribute values held by more than this many records")
    b.add_argument("--score-pairs", action="store_true",
                   help="also commit the scored-pairs similarity-feature stage")

    h = sub.add_parser("home", help="engine metadata (the GET _zentity body)")
    h.add_argument("--pretty", action="store_true")

    r = sub.add_parser("resolve", help="seeded single-entity resolution")
    r.add_argument("--model", required=True)
    r.add_argument("--input", required=True)
    r.add_argument("--input-format", default="parquet")
    r.add_argument("--attributes", default="{}")
    r.add_argument("--terms", default="[]")
    r.add_argument("--ids", default="{}")
    r.add_argument("--scope", default="null")
    r.add_argument("--max-hops", type=int, default=100)
    r.add_argument("--max-docs-per-query", type=int, default=1000)
    r.add_argument("--max-time-per-query", default=None,
                   help="ES TimeValue per-query budget, e.g. '10s' (the "
                        "reference's default; unset = no budget, since a "
                        "batch query silently dropping docs on a slow "
                        "host is data loss — opt in for ES parity)")
    # reference URL-param analogs (ResolutionAction.java params)
    r.add_argument("--score", action="store_true", help="_score=true")
    r.add_argument("--explanation", action="store_true", help="_explanation=true")
    r.add_argument("--no-attributes", action="store_true", help="_attributes=false")
    r.add_argument("--queries", action="store_true", help="queries=true")
    r.add_argument("--no-error-trace", action="store_true", help="error_trace=false")
    r.add_argument("--pretty", action="store_true")

    bk = sub.add_parser(
        "bulk",
        help="bulk seeded resolution (the POST _zentity/resolution/_bulk NDJSON body)",
    )
    bk.add_argument("--input", required=True)
    bk.add_argument("--input-format", default="parquet")
    bk.add_argument("--body", required=True,
                    help="path to the NDJSON (params line, payload line) file")
    bk.add_argument("--models-dir", default=None,
                    help="ModelStore root for entity_type lookups")
    bk.add_argument("--entity-type", default=None,
                    help="URL-path default entity type")
    bk.add_argument("--explanation", action="store_true", help="_explanation=true")
    bk.add_argument("--no-source", action="store_true", help="_source=false")
    bk.add_argument("--max-hops", type=int, default=100)
    bk.add_argument("--max-docs-per-query", type=int, default=1000)

    s = sub.add_parser(
        "stream",
        help="incremental record linkage over arriving transcript files "
             "(foreachBatch; processes everything available, then stops — "
             "rerun to pick up new arrivals, resume is per-batch exact)",
    )
    s.add_argument("--model", required=True)
    s.add_argument("--input", required=True,
                   help="directory watched for transcript files")
    s.add_argument("--input-format", default="parquet")
    s.add_argument("--output", required=True, help="SnapshotStore root")
    s.add_argument("--checkpoint", default=None,
                   help="streaming checkpoint dir (required for resume)")
    s.add_argument("--clusters-mode", choices=["full", "delta"], default="full")
    s.add_argument("--n-buckets", type=int, default=64)
    s.add_argument("--max-files-per-trigger", type=int, default=None)
    s.add_argument("--rebind-checkpoint", action="store_true",
                   help="sanction replaying the SAME input through a "
                        "new checkpoint (e.g. checkpoint lost, source "
                        "replayable): adopts the new lineage; committed "
                        "batches replay as fingerprint no-ops")
    s.add_argument("--assignments-output", default=None,
                   help="also write the materialized (record_id, "
                        "cluster_id) view as parquet to this path")

    d = sub.add_parser(
        "dedup-stream",
        help="incremental MinHash-LSH near-dup dedup over arriving "
             "document files (foreachBatch; processes everything "
             "available, then stops — rerun with the same "
             "--checkpoint/--output to pick up new arrivals exactly "
             "once; keeper rule = min id per transitive group, batch "
             "near_dup_dedup parity)",
    )
    d.add_argument("--input", required=True,
                   help="directory watched for document files")
    d.add_argument("--input-format", default="parquet")
    d.add_argument("--schema", default="doc_id long, text string",
                   help="input stream DDL schema (streaming reads "
                        "require an explicit schema)")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--output", required=True, help="SnapshotStore root")
    d.add_argument("--checkpoint", default=None,
                   help="streaming checkpoint dir (required for resume)")
    d.add_argument("--shingle-k", type=int, default=3)
    d.add_argument("--bands", type=int, default=8)
    d.add_argument("--jaccard-threshold", type=float, default=0.5)
    d.add_argument("--n-buckets", type=int, default=64)
    d.add_argument("--max-block-size", type=int, default=10_000)
    d.add_argument("--max-files-per-trigger", type=int, default=None)
    d.add_argument("--rebind-checkpoint", action="store_true",
                   help="see 'stream --rebind-checkpoint'")
    d.add_argument("--keepers-output", default=None,
                   help="also write the materialized (doc_id, group_id,"
                        " kept) view as parquet to this path")

    an = sub.add_parser(
        "ann-stream",
        help="incrementally maintain a banded hyperplane-LSH ANN index "
             "over arriving embedding files (foreachBatch; O(batch) "
             "writes to a bucketed SnapshotStore; processes everything "
             "available then stops — rerun with the same "
             "--checkpoint/--output to pick up new arrivals exactly "
             "once; query with 'ann-query')",
    )
    an.add_argument("--input", required=True,
                    help="directory watched for embedding files")
    an.add_argument("--input-format", default="parquet")
    an.add_argument("--schema",
                    default="vec_id long, label string, "
                            "embedding array<double>",
                    help="input stream DDL schema (streaming reads "
                         "require an explicit schema)")
    an.add_argument("--output", required=True, help="SnapshotStore root")
    an.add_argument("--checkpoint", default=None,
                    help="streaming checkpoint dir (required for resume)")
    an.add_argument("--dim", type=int, default=64)
    an.add_argument("--bands", type=int, default=16)
    an.add_argument("--planes-per-band", type=int, default=8)
    an.add_argument("--n-buckets", type=int, default=64)
    an.add_argument("--max-files-per-trigger", type=int, default=None)
    an.add_argument("--rebind-checkpoint", action="store_true",
                    help="see 'stream --rebind-checkpoint'")

    aq = sub.add_parser(
        "ann-query",
        help="top-k cosine query against a committed ann-stream store "
             "(partition-pruned probe — no corpus rescan; the index "
             "geometry comes from the store's pinned meta)",
    )
    aq.add_argument("--store", required=True, help="SnapshotStore root")
    aq.add_argument("--vec-id", type=int, required=True)
    aq.add_argument("--k", type=int, default=10)
    aq.add_argument("--multiprobe", type=int, default=0,
                    help="1 = also probe each band bucket's Hamming-1 "
                         "neighborhood")

    m = sub.add_parser(
        "models",
        help="entity-model management (the _zentity/models routes, "
             "ModelsAction.java:86-99 + SetupAction.java:43-91)",
    )
    m.add_argument("verb", choices=["get", "list", "create", "update",
                                    "delete", "bulk", "setup"])
    m.add_argument("--models-dir", required=True,
                   help="ModelStore root directory")
    m.add_argument("--entity-type", default=None)
    m.add_argument("--spec", default=None,
                   help="path to the entity-model JSON (create/update)")
    m.add_argument("--body", default=None,
                   help="path to the NDJSON action/payload pairs (bulk)")
    m.add_argument("--no-exist-ok", action="store_true",
                   help="setup: fail if the store already exists "
                        "(resource_already_exists, SetupActionIT)")
    m.add_argument("--pretty", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "models":
        # no Spark session needed — model documents are driver-side
        # config, exactly like the reference's hidden .zentity-models
        # index ops run on the coordinating node
        sys.exit(_models_cmd(args))

    if args.cmd == "home":
        # no Spark session needed — pure metadata (HomeAction.java:50-67)
        from zentity_spark import plugin_info

        print(json.dumps(plugin_info(), indent=2 if args.pretty else None))
        return

    from zentity_spark.model import load_model

    spark = _spark(f"zentity-spark-{args.cmd}")

    # The batch read is deferred to the subcommands that consume it:
    # the stream path supplies its own explicit schema via
    # read_turn_stream and must not fail (or pay schema inference) on a
    # watch directory the producer has not populated yet.
    def _read_turns():
        return spark.read.format(args.input_format).load(args.input)

    if args.cmd == "bulk":
        from zentity_spark.bulk import bulk_resolve_response
        from zentity_spark.models_store import ModelStore

        with open(args.body) as fh:
            ndjson = fh.read()
        print(
            bulk_resolve_response(
                spark,
                _read_turns(),
                ndjson,
                model_store=ModelStore(args.models_dir) if args.models_dir else None,
                default_entity_type=args.entity_type,
                request_params={
                    "_explanation": args.explanation,
                    "_source": not args.no_source,
                    "max_hops": args.max_hops,
                    "max_docs_per_query": args.max_docs_per_query,
                },
            )
        )
        spark.stop()
        return

    if args.cmd == "dedup-stream":
        # no entity model — the dedup stream's parameters are its own
        # pinned store meta (k/bands/threshold/columns)
        from zentity_spark.storage import SnapshotStore
        from zentity_spark.streaming import current_keepers, incremental_dedup

        reader = spark.readStream.schema(args.schema).format(args.input_format)
        if args.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger",
                                   args.max_files_per_trigger)
        q = incremental_dedup(
            spark, reader.load(args.input), args.output,
            text_col=args.text_col, id_col=args.id_col,
            k=args.shingle_k, bands=args.bands,
            jaccard_threshold=args.jaccard_threshold,
            checkpoint_dir=args.checkpoint, n_buckets=args.n_buckets,
            max_block_size=args.max_block_size,
            rebind_checkpoint=args.rebind_checkpoint,
        )
        q.awaitTermination()
        store = SnapshotStore(args.output)
        sm = store.read_all(spark, "stream_metrics")
        batches = ([r.asDict() for r in sm.orderBy("batch_id").collect()]
                   if sm is not None else [])
        keep = current_keepers(spark, store)
        if keep is not None:
            keep = keep.localCheckpoint()  # one materialization, 3 consumers
        n_docs = keep.count() if keep is not None else 0
        n_groups = (keep.select("group_id").distinct().count()
                    if keep is not None else 0)
        if args.keepers_output and keep is not None:
            keep.write.mode("overwrite").parquet(args.keepers_output)
        print(json.dumps({
            "batches": batches,  # cumulative across runs (append table)
            "docs": n_docs,
            "groups": n_groups,
            "duplicates": n_docs - n_groups,
            "keepers_output": args.keepers_output,
        }, indent=2))
        spark.stop()
        return

    if args.cmd == "ann-stream":
        # no entity model — the index geometry is its own pinned meta
        from zentity_spark.storage import SnapshotStore
        from zentity_spark.streaming import incremental_ann_index

        reader = spark.readStream.schema(args.schema).format(args.input_format)
        if args.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger",
                                   args.max_files_per_trigger)
        q = incremental_ann_index(
            spark, reader.load(args.input), args.output,
            dim=args.dim, bands=args.bands,
            planes_per_band=args.planes_per_band,
            checkpoint_dir=args.checkpoint, n_buckets=args.n_buckets,
            rebind_checkpoint=args.rebind_checkpoint,
        )
        q.awaitTermination()
        store = SnapshotStore(args.output)
        sm = store.read_all(spark, "stream_metrics")
        batches = ([r.asDict() for r in sm.orderBy("batch_id").collect()]
                   if sm is not None else [])
        vecs = store.read_all(spark, "vectors")
        print(json.dumps({
            "batches": batches,  # cumulative across runs (append table)
            "vectors": vecs.count() if vecs is not None else 0,
            "bands": args.bands,
            "planes_per_band": args.planes_per_band,
            "store": args.output,
        }, indent=2))
        spark.stop()
        return

    if args.cmd == "ann-query":
        from zentity_spark.streaming import ann_index_query

        df, m = ann_index_query(
            spark, args.store, args.vec_id, k=args.k,
            multiprobe=args.multiprobe, with_metrics=True,
        )
        rows = [r.asDict() for r in df.collect()]
        print(json.dumps({
            "query_vec_id": args.vec_id,
            "k": args.k,
            "multiprobe": args.multiprobe,
            "results": rows,
            "metrics": m,
        }, indent=2))
        spark.stop()
        return

    try:
        model = load_model(args.model)
    except Exception as e:  # noqa: BLE001 — request-level error envelope
        # a job that cannot even be built gets the ES RestResponse-style
        # body with an HTTP status (testInvalidJob* semantics), not the
        # job envelope
        from zentity_spark.envelope import request_error_json

        print(request_error_json(e))
        spark.stop()
        sys.exit(1)

    if args.cmd == "stream":
        from zentity_spark.storage import SnapshotStore
        from zentity_spark.streaming import (current_assignments,
                                             incremental_resolve,
                                             read_turn_stream)

        stream = read_turn_stream(
            spark, args.input, fmt=args.input_format,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        q = incremental_resolve(
            spark, stream, model, args.output,
            checkpoint_dir=args.checkpoint, n_buckets=args.n_buckets,
            clusters_mode=args.clusters_mode,
            rebind_checkpoint=args.rebind_checkpoint,
        )
        q.awaitTermination()
        store = SnapshotStore(args.output)
        sm = store.read_all(spark, "stream_metrics")
        batches = ([r.asDict() for r in
                    sm.orderBy("batch_id").collect()] if sm is not None else [])
        if args.clusters_mode == "delta":
            cur = current_assignments(spark, store)
        else:
            cur = store.read(spark, "clusters")
        # three consumers (count, distinct count, optional write) — one
        # materialization (PLANS.md rule 18), not three replays of the
        # O(corpus) assign-log window
        if cur is not None:
            cur = cur.localCheckpoint()
        n_records = cur.count() if cur is not None else 0
        n_clusters = (cur.select("cluster_id").distinct().count()
                      if cur is not None else 0)
        if args.assignments_output and cur is not None:
            cur.write.mode("overwrite").parquet(args.assignments_output)
        print(json.dumps({
            "clusters_mode": args.clusters_mode,
            "batches": batches,  # cumulative across runs (append table)
            "records": n_records,
            "clusters": n_clusters,
            "assignments_output": args.assignments_output,
        }, indent=2))
        spark.stop()
        return

    if args.cmd == "batch":
        from zentity_spark.pipeline import ResolutionConfig, resolve_all_checkpointed

        res = resolve_all_checkpointed(
            spark,
            _read_turns(),
            model,
            output_root=args.output,
            input_token=args.input,
            config=ResolutionConfig(
                max_block_size=args.max_block_size,
                entity_closure=args.entity_closure,
                max_value_frequency=args.max_value_frequency,
                score_candidate_pairs=args.score_pairs,
            ),
        )
        out = {
            "run_id": res["run_id"],
            "fingerprint": res["fingerprint"],
            "stages": {
                k: {"rows": v.get("rows"), "resumed": bool(v.get("resumed"))}
                for k, v in res["stages"].items()
            },
        }
        print(json.dumps(out, indent=2))
    else:
        from zentity_spark.envelope import resolve_response, serialize_exception
        from zentity_spark.resolve import Input, SeededConfig

        try:
            input_ = Input(
                attributes=json.loads(args.attributes),
                terms=json.loads(args.terms),
                ids=json.loads(args.ids),
                scope=json.loads(args.scope),
            )
        except Exception as e:  # noqa: BLE001 — 400-style error envelope
            print("{\"error\":{" + serialize_exception(e, not args.no_error_trace) + "}}")
            spark.stop()
            sys.exit(1)
        print(
            resolve_response(
                spark,
                _read_turns(),
                model,
                input_,
                SeededConfig(
                    max_hops=args.max_hops,
                    max_docs_per_query=args.max_docs_per_query,
                    max_time_per_query=args.max_time_per_query,
                ),
                include_attributes=not args.no_attributes,
                include_explanation=args.explanation or args.score,
                include_score=args.score,
                include_queries=args.queries,
                include_error_trace=not args.no_error_trace,
                pretty=args.pretty,
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
