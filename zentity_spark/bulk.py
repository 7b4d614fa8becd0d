"""Bulk resolution: many seeded jobs in one request.

The reference's `POST _zentity/resolution/_bulk` takes NDJSON
(params-line, payload-line) pairs and runs up to 100 jobs concurrently
(BulkAction.java:32-61, splitBulkEntries :40-47; executeBulk
ResolutionAction.java:264-345), collecting per-item results or error
envelopes without failing the batch.

Spark note: concurrent seeded jobs are plain concurrent actions on one
SparkSession (the scheduler interleaves them); a driver-side thread pool
is the direct analog of the reference's AsyncCollectionRunner
(AsyncCollectionRunner.java:34-126) — results return in input order.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor

from zentity_spark.errors import ValidationException, ZentityError
from zentity_spark.model import Model
from zentity_spark.resolve import Input, SeededConfig, resolve

MAX_CONCURRENT_JOBS = 100  # BulkAction.java:32


def split_bulk_entries(ndjson: str) -> list[tuple[dict, dict]]:
    """NDJSON body → (params, payload) tuples; an odd line count is an
    error (BulkAction.java:40-47, StreamUtil.java:30-50)."""
    lines = [ln for ln in ndjson.splitlines() if ln.strip()]
    if len(lines) % 2 != 0:
        raise ValidationException(
            "Bulk request must have repeating pairs of params and payload lines."
        )
    return [
        (json.loads(lines[i]), json.loads(lines[i + 1]))
        for i in range(0, len(lines), 2)
    ]


def bulk_resolve(
    spark,
    turns,
    ndjson: str,
    model_store=None,
    default_model: Model | None = None,
    max_concurrency: int = MAX_CONCURRENT_JOBS,
) -> dict:
    """Run each (params, payload) pair as a seeded job. params may carry
    `entity_type` (resolved via model_store — per-item override,
    ResolutionAction.java:264-304) plus max_hops / max_docs_per_query.
    Returns {errors: bool, items: [...]} in input order."""
    entries = split_bulk_entries(ndjson)

    def one(entry):
        params, payload = entry
        try:
            if params.get("entity_type") and model_store is not None:
                model = model_store.get(params["entity_type"])
            elif "model" in payload:
                model = Model(payload["model"])
            elif default_model is not None:
                model = Model(
                    {
                        "attributes": {
                            n: {"type": a.type, "score": a.score}
                            for n, a in default_model.attributes.items()
                        },
                        "resolvers": {
                            n: {"attributes": r.attributes, "weight": r.weight}
                            for n, r in default_model.resolvers.items()
                        },
                        "matchers": {
                            n: {"clause": m.clause, "params": m.params, "quality": m.quality}
                            for n, m in default_model.matchers.items()
                        },
                        "indices": {
                            n: {"fields": {
                                fn: {"attribute": f.attribute, "matcher": f.matcher,
                                     "quality": f.quality}
                                for fn, f in idx.fields.items()
                            }}
                            for n, idx in default_model.indices.items()
                        },
                    }
                )
            else:
                raise ValidationException(
                    "You must specify either an entity type or an entity model."
                )
            hits = resolve(
                spark,
                turns,
                model,
                Input(
                    attributes=payload.get("attributes", {}),
                    terms=payload.get("terms", []),
                    ids=payload.get("ids", {}),
                    scope=payload.get("scope"),
                ),
                SeededConfig(
                    max_hops=int(params.get("max_hops", 100)),
                    max_docs_per_query=int(params.get("max_docs_per_query", 1000)),
                ),
            )
            return {
                "hits": {
                    "total": len(hits),
                    "hits": [
                        {"_id": h.doc_id, "_index": h.index, "_hop": h.hop}
                        for h in hits
                    ],
                }
            }
        except (ValidationException, ZentityError) as e:
            return {"error": {"by": getattr(e, "by", "zentity"),
                              "type": type(e).__name__, "reason": str(e)}}

    with ThreadPoolExecutor(max_workers=min(max_concurrency, max(len(entries), 1))) as ex:
        items = list(ex.map(one, entries))
    return {"errors": any("error" in i for i in items), "items": items}
