"""spark-submit entrypoint.

Usage (north_rule launch shape):

    zip -r zentity_spark.zip zentity_spark
    spark-submit --py-files zentity_spark.zip -m zentity_spark.cli ... \
        batch  --model model.json --input /path/transcripts \
               --output /path/warehouse [--input-format parquet]
    ... resolve --model model.json --input /path/transcripts \
               --attributes '{"name": ["alice jones"]}' [--max-hops 5]

`batch` runs the snapshot-committed resolve-all pipeline (resumable);
`resolve` runs a seeded single-entity traversal and prints hits as JSON.
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
    # spark-submit provides the master; direct `python -m` runs fall back
    # to local mode (overridable via SPARK_MASTER)
    if not SparkConf().contains("spark.master"):
        builder = builder.master(os.environ.get("SPARK_MASTER", "local[*]"))
    return builder.getOrCreate()


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

    args = p.parse_args(argv)

    if args.cmd == "home":
        # no Spark session needed — pure metadata (HomeAction.java:50-67)
        from zentity_spark import plugin_info

        print(json.dumps(plugin_info(), indent=2 if args.pretty else None))
        return

    from zentity_spark.model import load_model

    spark = _spark(f"zentity-spark-{args.cmd}")
    turns = spark.read.format(args.input_format).load(args.input)

    if args.cmd == "bulk":
        from zentity_spark.bulk import bulk_resolve_response
        from zentity_spark.models_store import ModelStore

        with open(args.body) as fh:
            ndjson = fh.read()
        print(
            bulk_resolve_response(
                spark,
                turns,
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

    if args.cmd == "batch":
        from zentity_spark.pipeline import ResolutionConfig, resolve_all_checkpointed

        res = resolve_all_checkpointed(
            spark,
            turns,
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
                turns,
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
