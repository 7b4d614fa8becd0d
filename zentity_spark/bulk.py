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


class _AuditCapture:
    """Per-item query-log capture shared by both bulk paths — ONE
    definition of the audit contract (per-item `_capture` dict, logs
    collected in input order, flushed as {"item": i, "query_log": [...]}
    rows for storage.query_log_metrics), so the two paths cannot
    silently diverge."""

    def __init__(self, n_items: int):
        self._captures: list[dict] = [{} for _ in range(n_items)]
        self._logs: list[list] = [[] for _ in range(n_items)]

    def capture(self, i: int) -> dict:
        """The `_capture` dict to pass into resolve/resolve_response."""
        return self._captures[i]

    def record(self, i: int) -> None:
        """Call in the item's `finally`: keeps the log even when the
        item errored mid-resolve (partial hops still audited)."""
        self._logs[i] = self._captures[i].get("query_log", [])

    def flush(self, audit: list | None) -> None:
        if audit is not None:
            audit.extend(
                {"item": i, "query_log": ql} for i, ql in enumerate(self._logs)
            )


def split_bulk_lines(ndjson: str) -> list[tuple[str, str]]:
    """NDJSON body → RAW (params_line, payload_line) string pairs; an odd
    line count fails the whole request (BulkAction.java:40-47,
    StreamUtil.java:30-50). Interior empty lines are PRESERVED — the
    reference's `Patterns.NEWLINE.split` keeps them (an empty payload
    line becomes a per-item parse failure, asserted by
    testBulkResolutionWithMalformed) and, like Java's `split`, drops
    only trailing empties."""
    lines = ndjson.split("\n")
    lines = [ln.rstrip("\r") for ln in lines]
    while lines and lines[-1] == "":
        lines.pop()
    if len(lines) % 2 != 0:
        raise ValidationException(
            "Bulk request must have repeating pairs of params and payloads"
            " on separate lines."
        )
    return [(lines[i], lines[i + 1]) for i in range(0, len(lines), 2)]


def split_bulk_entries(ndjson: str) -> list[tuple[dict, dict]]:
    """Parsed form of split_bulk_lines — raises on the first malformed
    line (callers that want per-item error capture parse the raw pairs
    themselves, as bulk_resolve does)."""
    return [
        (json.loads(p), json.loads(b)) for p, b in split_bulk_lines(ndjson)
    ]


def bulk_resolve(
    spark,
    turns,
    ndjson: str,
    model_store=None,
    default_model: Model | None = None,
    max_concurrency: int = MAX_CONCURRENT_JOBS,
    audit: list | None = None,
) -> dict:
    """Run each (params, payload) pair as a seeded job. params may carry
    `entity_type` (resolved via model_store — per-item override,
    ResolutionAction.java:264-304) plus max_hops / max_docs_per_query.
    Returns {errors: bool, items: [...]} in input order. Malformed
    params/payload lines become per-item error envelopes — the batch
    never fails on one bad entry (delegateJobFailure,
    ResolutionAction.java:240-249).

    audit: optional list; filled (input order) with one
    {"item": i, "query_log": [...]} per entry — the per-hop audit rows
    incl. timed_out (S7), ready for storage.query_log_metrics."""
    entries = split_bulk_lines(ndjson)
    alog = _AuditCapture(len(entries))

    def one(ientry):
        i, entry = ientry
        raw_params, raw_payload = entry
        capture = alog.capture(i)
        try:
            params = json.loads(raw_params) if raw_params.strip() else {}
            payload = json.loads(raw_payload)
            if not isinstance(params, dict) or not isinstance(payload, dict):
                raise ValidationException("Bulk entry must be a JSON object.")
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
                    max_time_per_query=params.get("max_time_per_query"),
                ),
                _capture=capture,
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
        except (ValidationException, ZentityError, ValueError) as e:
            return {"error": {"by": getattr(e, "by", "zentity"),
                              "type": type(e).__name__, "reason": str(e)},
                    "hits": {"total": 0, "hits": []}}
        finally:
            alog.record(i)

    with ThreadPoolExecutor(max_workers=min(max_concurrency, max(len(entries), 1))) as ex:
        items = list(ex.map(one, enumerate(entries)))
    alog.flush(audit)
    return {"errors": any("error" in i for i in items), "items": items}


def _param_bool(params: dict, key: str, default: bool) -> bool:
    """Reference params arrive as query-string/JSON values — accept
    bool, "true"/"false" strings (ConversionUtil booleans)."""
    v = params.get(key, default)
    if isinstance(v, bool):
        return v
    return str(v).lower() == "true"


def bulk_resolve_response(
    spark,
    turns,
    ndjson: str,
    model_store=None,
    default_entity_type: str | None = None,
    request_params: dict | None = None,
    source_docs=None,
    max_concurrency: int = MAX_CONCURRENT_JOBS,
    audit: list | None = None,
) -> str:
    """Reference-envelope bulk resolution: returns the exact
    `{"took":N,"errors":bool,"items":[...]}` JSON body of
    `POST _zentity/resolution[/{entity_type}]/_bulk`
    (BulkAction.java:55-63 bulkResultToJson).

    - `default_entity_type` is the URL-path entity type; a per-item
      params line may override it (`entity_type`), including to an
      unknown type, which fails only that item
      (testBulkResolutionOverrideEntityType).
    - `request_params` are the query-string defaults (`_source`,
      `_explanation`, `_score`, `_attributes`, `max_hops`,
      `max_docs_per_query`, `error_trace`); each item's params line
      overrides them (executeBulk, ResolutionAction.java:264-345).
    - Each successful item is a full single-resolution envelope
      (took/hits[/queries]); each failure is the Job error envelope
      `{"took":N,"error":{...},"hits":{"total":0,"hits":[]}}`
      (Job.java:1179-1191 response()).
    """
    import time as _time

    from zentity_spark.envelope import resolve_response, serialize_exception
    from zentity_spark.model import Model
    from zentity_spark.resolve import Input, SeededConfig

    req = dict(request_params or {})
    t0 = _time.time()
    entries = split_bulk_lines(ndjson)
    failed = [False]
    alog = _AuditCapture(len(entries))

    def one(ientry):
        i, entry = ientry
        raw_params, raw_payload = entry
        it0 = _time.time()
        merged = dict(req)
        trace = _param_bool(merged, "error_trace", True)
        capture = alog.capture(i)
        try:
            params = json.loads(raw_params) if raw_params.strip() else {}
            if not isinstance(params, dict):
                raise ValidationException("Bulk params line must be a JSON object.")
            merged.update(params)
            trace = _param_bool(merged, "error_trace", True)
            payload = json.loads(raw_payload)
            if not isinstance(payload, dict):
                raise ValidationException("Bulk payload line must be a JSON object.")

            entity_type = merged.get("entity_type") or default_entity_type
            if "model" in payload:
                model = Model(payload["model"])
            elif entity_type:
                if model_store is None:
                    from zentity_spark.errors import NotFoundException

                    raise NotFoundException(
                        f"Entity type '{entity_type}' not found."
                    )
                model = model_store.get(entity_type)
            else:
                raise ValidationException(
                    "You must specify either an entity type or an entity model."
                )
            item = resolve_response(
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
                    max_hops=int(merged.get("max_hops", 100)),
                    max_docs_per_query=int(merged.get("max_docs_per_query", 1000)),
                    # per-item override of the request-level budget, like
                    # max_hops (ResolutionAction.java:134 optString walk)
                    max_time_per_query=merged.get("max_time_per_query"),
                ),
                include_attributes=_param_bool(merged, "_attributes", True),
                include_explanation=_param_bool(merged, "_explanation", False),
                include_score=_param_bool(merged, "_score", False),
                include_source=_param_bool(merged, "_source", True),
                include_queries=_param_bool(merged, "queries", False),
                source_docs=source_docs,
                include_error_trace=trace,
                _capture=capture,
            )
            # resolve_response handles job-execution errors itself and
            # returns the reference's error envelope — the bulk `errors`
            # flag must still reflect them (SingleResult carries
            # job.failed(), ResolutionAction.java:216-219)
            if json.loads(item).get("error") is not None:
                failed[0] = True
            return item
        except Exception as e:  # noqa: BLE001 — per-item error envelope is the contract
            failed[0] = True
            took = int((_time.time() - it0) * 1000)
            return (
                "{" + f"\"took\":{took},"
                f"\"error\":{{{serialize_exception(e, trace)}}},"
                "\"hits\":{\"total\":0,\"hits\":[]}" + "}"
            )
        finally:
            # per-item audit rows (incl. timed_out) survive the envelope:
            # S7 parity for the bulk path, not just single resolve
            alog.record(i)

    with ThreadPoolExecutor(
        max_workers=min(max_concurrency, max(len(entries), 1))
    ) as ex:
        items = list(ex.map(one, enumerate(entries)))
    alog.flush(audit)
    took = int((_time.time() - t0) * 1000)
    return (
        "{" + f"\"took\":{took},\"errors\":{str(failed[0]).lower()},"
        "\"items\":[" + ",".join(items) + "]}"
    )
