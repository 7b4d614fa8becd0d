"""Response-envelope parity with the reference.

Builds the resolution response exactly as Job.java does — by string
assembly, because the golden integration tests assert byte-equality of
the serialized JSON (ResolutionActionIT.java:779-793 _explanation,
:1499-1514 _attributes + _explanation):

  {"took":N, ["error":{...},] "hits":{"total":T,"hits":[DOC,...]}
   [,"queries":[...]]}                         (Job.java:1179-1194)

Per-doc shape and key order (Job.java:865-1004 mutation order):
  {"_index":...,"_id":...,"_hop":H,"_query":Q[,"_score":S]
   [,"_attributes":{...}][,"_explanation":{...}][,"_source":{...}]}

- _attributes: nested re-projection of the doc's extracted attribute
  values — dotted attribute names nest by their name fields, the leaf
  holds the TreeSet-ordered value array (Job.java:871-900).
- _explanation: {"resolvers":{...},"matches":[...]} where matches are
  deduped and ordered by the reference's TreeSet of
  "attribute:field:matcher:base64(value)" filter names
  (Job.java:908-921), and resolvers summarizes every model resolver
  whose attributes all matched (Job.java:975-983).
- error: {"by":...,"type":...,"reason":...[,"stack_trace":...]}
  (Job.java serializeException:139-153).

Values render TYPED by the model attribute's type (number/boolean as
raw JSON literals in their canonical Java serialization, string/date
quoted) — matching the reference, which re-reads the base64-decoded
serialized value as a JsonNode of the attribute's type.

NON-FEATURES — ES-internal knobs with no snapshot-table analog,
deliberately unimplemented (documented here so the coverage boundary
vs ResolutionAction.java:122-161 is explicit):

- `_seq_no`/`_primary_term` (include_seq_no_primary_term,
  ResolutionAction.java:130) and `_version` (include_version,
  ResolutionAction.java:132): ES per-document concurrency-control
  internals. A parquet/Iceberg snapshot has no per-doc version cell;
  the committed-snapshot lineage (storage.SnapshotStore manifests,
  one immutable snapshot id per commit) is the engine-appropriate
  substitute for "which version of the data did this read see".
- `profile` (ResolutionAction.java:136): ES search-profiling dump.
  Spark's substitute is the query plan itself — df.explain() and the
  Spark UI SQL tab, which profile the ACTUAL distributed execution.
- `search.preference` / `search.request_cache` /
  `search.allow_partial_search_results` (+ batched_reduce_size,
  max_concurrent_shard_requests, pre_filter_shard_size;
  ResolutionAction.java:138-144, assembled Query.java:406-430):
  shard-routing and shard-cache hints. Spark has no shard affinity to
  steer; partial-results semantics are carried by the O9 per-query
  timeout (resolve._collect_with_budget — a timed-out query
  contributes zero hits and flags timed_out in the audit, the closest
  analog to a fully timed-out shard set).
"""

from __future__ import annotations

import base64
import json
import time
import traceback

from zentity_spark.values import _java_double_to_string


def typed_json(serialized: str, attr_type: str) -> str:
    """Render a canonical serialized value as a JSON literal of the
    attribute's type (Job.java:925-928: string/date re-quote, others
    pass through as raw JSON)."""
    if attr_type in ("number", "boolean"):
        return serialized
    return json.dumps(serialized, ensure_ascii=False)


def attributes_json(doc_attr_values: dict[str, list[str]], model) -> str:
    """The `_attributes` object: sorted attribute names, dotted names
    nested by name fields, leaf arrays in TreeSet (serialized) order."""

    def render(node) -> str:
        if isinstance(node, dict):
            inner = ",".join(
                f"{json.dumps(k, ensure_ascii=False)}:{render(v)}" for k, v in node.items()
            )
            return "{" + inner + "}"
        return "[" + ",".join(node) + "]"  # pre-rendered value literals

    root: dict = {}
    for attr in sorted(doc_attr_values):
        atype = model.attributes[attr].type if attr in model.attributes else "string"
        vals = [typed_json(v, atype) for v in sorted(set(doc_attr_values[attr]))]
        name_fields = attr.split(".")
        node = root
        for nf in name_fields[:-1]:
            node = node.setdefault(nf, {})
        node[name_fields[-1]] = vals
    return render(root)


def _params_json(params: dict) -> str:
    inner = ",".join(
        f"{json.dumps(k, ensure_ascii=False)}:{json.dumps(str(v), ensure_ascii=False)}"
        for k, v in sorted(params.items())
    )
    return "{" + inner + "}"


def explanation_json(detail: list[dict], doc_fields: dict[str, list[str]],
                     model, input, index: str, include_score: bool = False,
                     scores: dict | None = None) -> str:
    """The `_explanation` object for one hit.

    detail: raw match rows (attribute, field, matcher, input_val) from
    the traversal; doc_fields: field → doc values at that field in
    document order (the docIndexFields analog, Job.java:756-854)."""
    field_attr = {
        fname: f.attribute for fname, f in model.indices[index].fields.items()
    }
    input_params = input.attr_params() if input is not None else {}
    input_attrs = set(input.attributes) if input is not None else set()

    # dedup + order exactly like the reference: TreeSet over the joined
    # filter name "attribute:field:matcher:base64(serialized value)"
    named = {}
    for d in detail:
        b64 = base64.b64encode(str(d["input_val"]).encode()).decode()
        named[f"{d['attribute']}:{d['field']}:{d['matcher']}:{b64}"] = d

    matches = []
    exp_attributes = set()
    best_scores: dict[str, float] = {}
    for name in sorted(named):
        d = named[name]
        attr = d["attribute"]
        atype = model.attributes[attr].type if attr in model.attributes else "string"
        exp_attributes.add(attr)

        fvals = doc_fields.get(d["field"], [d.get("raw", "")])
        if len(fvals) == 1:
            target = typed_json(fvals[0], atype)
        else:
            target = "[" + ",".join(typed_json(v, atype) for v in fvals) + "]"

        if attr in input_attrs:
            params = input_params.get(attr, {})
        elif d["matcher"] in model.matchers:
            params = model.matchers[d["matcher"]].params
        else:
            params = {}

        parts = [
            f"\"attribute\":{json.dumps(attr, ensure_ascii=False)}",
            f"\"target_field\":{json.dumps(d['field'], ensure_ascii=False)}",
            f"\"target_value\":{target}",
            f"\"input_value\":{typed_json(str(d['input_val']), atype)}",
            f"\"input_matcher\":{json.dumps(d['matcher'], ensure_ascii=False)}",
            f"\"input_matcher_params\":{_params_json(params)}",
        ]
        if include_score:
            s = (scores or {}).get((attr, d["matcher"], index, d["field"]))
            parts.append(f"\"score\":{render_double(s)}")
            if s is not None:
                best_scores[attr] = max(best_scores.get(attr, 0.0), s)
        matches.append("{" + ",".join(parts) + "}")

    resolvers = []
    for rname in sorted(model.resolvers):
        rattrs = model.resolvers[rname].attributes
        if set(rattrs) <= exp_attributes:
            attrs_arr = ",".join(json.dumps(a, ensure_ascii=False) for a in rattrs)
            resolvers.append(
                f"{json.dumps(rname, ensure_ascii=False)}:{{\"attributes\":[{attrs_arr}]}}"
            )
    return (
        "{\"resolvers\":{" + ",".join(resolvers) + "},"
        "\"matches\":[" + ",".join(matches) + "]}"
    )


def render_double(x: float | None) -> str:
    if x is None:
        return "null"
    return _java_double_to_string(float(x))


def serialize_exception(e: Exception, include_trace: bool = True) -> str:
    """Inner error fields (Job.java:139-153 serializeException). by =
    'zentity' for engine-raised errors (ZentityError taxonomy), else
    'elasticsearch' — the execution-engine slot, held by Spark here."""
    from zentity_spark.errors import (
        NotFoundException,
        ValidationException,
        ZentityError,
    )

    if isinstance(e, ValidationException):
        jtype = "io.zentity.model.ValidationException"
        by = "zentity"
    elif isinstance(e, NotFoundException):
        jtype = "org.elasticsearch.plugin.zentity.NotFoundException"
        by = "zentity"
    elif isinstance(e, ZentityError):
        jtype = f"zentity_spark.errors.{type(e).__name__}"
        by = "zentity"
    else:
        jtype = f"{type(e).__module__}.{type(e).__name__}"
        by = "elasticsearch"
    parts = [
        f"\"by\":{json.dumps(by)}",
        f"\"type\":{json.dumps(jtype)}",
        f"\"reason\":{json.dumps(str(e), ensure_ascii=False)}",
    ]
    if include_trace:
        tb = f"{jtype}: {e}\n" + "".join(traceback.format_exception(e))
        parts.append(f"\"stack_trace\":{json.dumps(tb, ensure_ascii=False)}")
    return ",".join(parts)


def es_error_type(e: Exception) -> str:
    """Elasticsearch's exception-name convention
    (ElasticsearchException.getExceptionName): CamelCase class name →
    snake_case, keeping a trailing 'Exception' as '_exception' (e.g.
    ValidationException → validation_exception)."""
    name = type(e).__name__
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def request_error_json(e: Exception, status: int | None = None) -> str:
    """REQUEST-level error body — what the reference returns when a job
    could not even be built (invalid model, unknown entity type):
    Elasticsearch's RestResponse serialization,
    `{"error":{"root_cause":[...],"type":"validation_exception",
    "reason":"..."},"status":400}` — asserted by the testInvalidJob*
    cases (ResolutionActionIT.java:1636-1784). Distinct from the
    JOB-level envelope (serialize_exception), which uses canonical Java
    class names and carries took/hits."""
    etype = es_error_type(e)
    if status is None:
        status = getattr(e, "status", 500)
    reason = json.dumps(str(e), ensure_ascii=False)
    cause = f"{{\"type\":{json.dumps(etype)},\"reason\":{reason}}}"
    return (
        "{" + f"\"error\":{{\"root_cause\":[{cause}],"
        f"\"type\":{json.dumps(etype)},\"reason\":{reason}}},"
        f"\"status\":{status}" + "}"
    )


def _query_json(entry: dict, model) -> str:
    """One `queries` audit row (serializeLoggedQuery analog,
    Job.java:166-197). The reference embeds the raw ES request/response
    under `search`; this engine runs DataFrame plans, so `search` is
    null and the resolver summaries + hit count carry the audit value."""

    def resolver_summary(names):
        if not names:
            return "null"
        inner = ",".join(
            f"{json.dumps(r)}:{{\"attributes\":["
            + ",".join(json.dumps(a) for a in model.resolvers[r].attributes)
            + "]}"
            for r in names
        )
        return "{\"resolvers\":{" + inner + "}}"

    return (
        "{" + f"\"_hop\":{entry['hop']},\"_query\":{entry['query']},"
        f"\"_index\":{json.dumps(entry['index'])},"
        "\"filters\":{"
        f"\"attributes\":{resolver_summary(entry['resolvers'])},"
        f"\"terms\":{resolver_summary(entry['term_resolvers'])}"
        "},\"search\":null,"
        f"\"_hits\":{entry['hits']}" + "}"
    )


def resolve_response(
    spark,
    turns,
    model,
    input,
    config=None,
    include_hits: bool = True,
    include_attributes: bool = True,
    include_explanation: bool = False,
    include_score: bool = False,
    include_source: bool = False,
    include_queries: bool = False,
    source_docs=None,
    include_error_trace: bool = True,
    pretty: bool = False,
    _capture: dict | None = None,
) -> str:
    """Run a seeded resolution and serialize the reference-shaped
    response. source_docs: optional (record_id → _source JSON) DataFrame
    for corpora ingested from raw documents — transcripts have no
    original `_source` to echo. _capture: optional dict the caller can
    pass to receive the resolve() internals (notably query_log — the
    per-hop audit rows incl. timed_out), e.g. for committing bulk-item
    audit rows to the metrics table."""
    from pyspark.sql import functions as F

    from zentity_spark.resolve import SeededConfig, resolve

    config = config or SeededConfig()
    config.include_explanation = config.include_explanation or include_explanation or include_score
    config.include_score = config.include_score or include_score

    t0 = time.time()
    capture: dict = _capture if _capture is not None else {}
    try:
        hits = resolve(spark, turns, model, input, config, _capture=capture)
    except Exception as e:  # noqa: BLE001 — error envelope is the contract
        took = int((time.time() - t0) * 1000)
        # Job.response() emits `hits` even on failure when includeHits
        # (Job.java:1179-1191): took, error, then the empty hits object
        hits_part = ",\"hits\":{\"total\":0,\"hits\":[]}" if include_hits else ""
        return (
            "{" + f"\"took\":{took},"
            f"\"error\":{{{serialize_exception(e, include_error_trace)}}}"
            + hits_part + "}"
        )
    compiled = capture["compiled"]
    values_df = capture["values_df"]

    # one entity-sized fetch of the hit docs' extracted values — the
    # analog of the reference reading each fetched doc's _source.
    # Date fields render through the script_fields reformat
    # (Query.java:77-130): the doc instant re-printed through the
    # input > model-attribute > matcher format chain.
    from zentity_spark.java_dates import format_java_date, resolve_format_chain

    date_fmts: dict[tuple[str, str], str | None] = {}
    for fs in compiled.field_specs:
        if compiled.attr_types.get(fs.attribute) == "date":
            date_fmts[(fs.index, fs.field)] = resolve_format_chain(
                fs.attribute, compiled, input.attr_params(),
                index=fs.index, field=fs.field,
            )

    doc_attrs: dict[str, dict[str, list[str]]] = {}
    doc_fields: dict[str, dict[str, list[tuple[int, str]]]] = {}
    if hits and (include_attributes or config.include_explanation):
        hit_ids = sorted({h.record_id for h in hits})
        rows = (
            values_df.where(F.col("record_id").isin(hit_ids))
            .select("record_id", "source", "attribute", "field", "raw", "ts", "pos")
            .collect()
        )
        for r in rows:
            val = r["raw"]
            fmt = date_fmts.get((r["source"], r["field"]))
            if fmt is not None and r["ts"] is not None:
                try:
                    val = format_java_date(r["ts"], fmt)
                except ValueError:
                    val = r["raw"]
            doc_attrs.setdefault(r["record_id"], {}).setdefault(
                r["attribute"], []
            ).append(val)
            doc_fields.setdefault(r["record_id"], {}).setdefault(
                r["field"], []
            ).append((r["pos"] if r["pos"] is not None else 0, val))

    sources: dict[str, str] = {}
    if include_source and source_docs is not None and hits:
        hit_ids = sorted({h.record_id for h in hits})
        for r in source_docs.where(F.col("record_id").isin(hit_ids)).collect():
            sources[r["record_id"]] = r["_source"]

    docs = []
    for h in hits:
        parts = [
            f"\"_index\":{json.dumps(h.index)}",
            f"\"_id\":{json.dumps(h.doc_id)}",
            f"\"_hop\":{h.hop}",
            f"\"_query\":{h.query}",
        ]
        if config.include_score:
            parts.append(f"\"_score\":{render_double(h.score)}")
        if include_attributes:
            attr_vals = doc_attrs.get(h.record_id, {})
            # _attributes covers model attributes only (docAttributes is
            # keyed by attribute name, Job.java:758-771)
            parts.append(
                f"\"_attributes\":{attributes_json(attr_vals, compiled.model)}"
            )
        if include_explanation and h.explanation:
            fields_ordered = {
                f: [v for _, v in sorted(vals)]
                for f, vals in doc_fields.get(h.record_id, {}).items()
            }
            detail = [
                {
                    "attribute": m["attribute"],
                    "field": m["target_field"],
                    "matcher": m["input_matcher"],
                    "input_val": m["input_value"],
                    "raw": m["target_value"],
                }
                for m in h.explanation
            ]
            parts.append(
                "\"_explanation\":"
                + explanation_json(
                    detail, fields_ordered, compiled.model, input,
                    h.index, include_score=config.include_score,
                    scores=compiled.scores,
                )
            )
        if include_source:
            parts.append(f"\"_source\":{sources.get(h.record_id, 'null')}")
        docs.append("{" + ",".join(parts) + "}")

    took = int((time.time() - t0) * 1000)
    resp_parts = [f"\"took\":{took}"]
    if include_hits:
        resp_parts.append(
            f"\"hits\":{{\"total\":{len(docs)},\"hits\":[" + ",".join(docs) + "]}"
        )
    if include_queries:
        qs = ",".join(_query_json(q, compiled.model) for q in capture["query_log"])
        resp_parts.append(f"\"queries\":[{qs}]")
    out = "{" + ",".join(resp_parts) + "}"
    if pretty:
        out = json.dumps(json.loads(out), indent=2, ensure_ascii=False)
    return out
