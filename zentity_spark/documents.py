"""Generic nested-JSON document ingestion.

The reference extracts attribute values from arbitrary nested `_source`
documents — objects, arrays, object arrays, and keys that themselves
contain periods (Job.java:199-286 extractValues, with the dotted-path
walk trying progressively longer key joins). This module is the batch
analog over a DataFrame of raw JSON documents:

  flatten_json_docs   (record_id, source, _source json) →
                      (record_id, source, path, raw, vtype, pos)

The flattener emits every scalar leaf under its DOT-JOINED path. That
reproduces extractValues exactly: the reference's progressive key-join
walk exists because JSON keys may contain dots — but however the dots
split across nesting levels, the flattened dotted path is the same
string, so matching the model field's dotted path against flattened
paths is equivalent to the recursive walk. Arrays flatten through their
elements in DOCUMENT ORDER (pos), like the reference's array iteration;
null leaves are skipped (Job.java vNode.isNull() guards).

Multi-field suffixes that don't exist in the data (`field_a.clean` →
`field_a`) fall back by stripping trailing path parts — handled
downstream by transcripts.resolve_physical_paths (Job.java:825-853).

Why mapInPandas: arbitrary nesting has no static schema, so
`from_json` (schema-bound) and the variant accessors (fixed-depth
paths) cannot express the recursive flatten; this is a linear
Arrow-batched pass, partition-parallel, with no driver involvement —
the legitimate UDF tier. Values are serialized to the same canonical
strings as zentity_spark.values (Java String.valueOf parity for
numbers), so flattened docs and FIELD=VALUE transcripts land in one
value space.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zentity_spark.values import _java_double_to_string

FLAT_SCHEMA = (
    "record_id string, source string, path string, raw string, vtype string, pos int"
)


def _flatten(node, path, out):
    """Job.java:199-286 semantics: dict → descend with dot-joined keys
    (sorted for deterministic path ordering, like the reference's
    TreeMap-ordered _source handling); list → iterate elements in
    document order under the same path; scalar → emit."""
    if isinstance(node, dict):
        for k in sorted(node):
            _flatten(node[k], f"{path}.{k}" if path else str(k), out)
    elif isinstance(node, list):
        for v in node:
            _flatten(v, path, out)
    elif node is None:
        return
    else:
        if isinstance(node, bool):
            out.append((path, "true" if node else "false", "boolean"))
        elif isinstance(node, int):
            out.append((path, str(node), "number"))
        elif isinstance(node, float):
            out.append((path, _java_double_to_string(node), "number"))
        else:
            out.append((path, str(node), "string"))


def flatten_json_leaves(doc_json: str) -> list[tuple[str, str, str, int]]:
    """Driver/worker-side flatten of ONE document: [(path, raw, vtype,
    pos)] with pos = 0-based document order within (path)."""
    out: list[tuple[str, str, str]] = []
    _flatten(json.loads(doc_json), "", out)
    seen: dict[str, int] = {}
    rows = []
    for path, raw, vtype in out:
        pos = seen.get(path, 0)
        seen[path] = pos + 1
        rows.append((path, raw, vtype, pos))
    return rows


def flatten_json_docs(docs: DataFrame, id_col: str = "record_id",
                      source_col: str = "source",
                      json_col: str = "_source") -> DataFrame:
    """DataFrame of raw JSON documents → long leaves table
    (record_id, source, path, raw, vtype, pos)."""

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            recs, srcs, paths, raws, vtypes, poss = [], [], [], [], [], []
            for rid, src, dj in zip(pdf[id_col], pdf[source_col], pdf[json_col]):
                if dj is None:
                    continue
                for path, raw, vtype, pos in flatten_json_leaves(dj):
                    recs.append(rid)
                    srcs.append(src)
                    paths.append(path)
                    raws.append(raw)
                    vtypes.append(vtype)
                    poss.append(pos)
            yield pd.DataFrame(
                {
                    "record_id": recs,
                    "source": srcs,
                    "path": paths,
                    "raw": raws,
                    "vtype": vtypes,
                    "pos": poss,
                }
            )

    return docs.mapInPandas(run, FLAT_SCHEMA)


def documents_to_turns(docs: DataFrame, id_col: str = "record_id",
                       source_col: str = "source",
                       json_col: str = "_source",
                       ts_col: str | None = None) -> DataFrame:
    """Raw JSON documents → the transcript encoding (input_hint shape):
    one turn per leaf, text `PATH=VALUE`, conv_id = `<source>/<id>`,
    turn_idx in (path, pos) order. The bridge from the reference's
    document world into the transcript-native pipeline."""
    flat = flatten_json_docs(docs, id_col, source_col, json_col)
    if ts_col is not None:
        ts = docs.select(
            F.concat_ws("/", source_col, id_col).alias("conv_id"),
            F.col(ts_col).alias("_ts"),
        )
    else:
        ts = None
    w = F.array_sort(
        F.collect_list(F.struct("path", "pos", "raw", "vtype"))
    )
    per_doc = (
        flat.groupBy("record_id", "source")
        .agg(w.alias("_leaves"))
        .select(
            F.concat_ws("/", "source", "record_id").alias("conv_id"),
            F.posexplode(
                F.transform(
                    F.col("_leaves"),
                    lambda s: F.concat(s.getField("path"), F.lit("="), s.getField("raw")),
                )
            ).alias("turn_idx", "text"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.lit("user").alias("role"),
            "text",
            F.lit(None).cast("string").alias("tool"),
        )
    )
    if ts is not None:
        per_doc = per_doc.join(ts, "conv_id", "left").withColumn(
            "ts", F.col("_ts").cast("timestamp")
        ).drop("_ts")
    else:
        per_doc = per_doc.withColumn(
            "ts", F.lit("1970-01-01 00:00:00").cast("timestamp")
        )
    return per_doc.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def values_from_docs(spark, docs: DataFrame, compiled,
                     id_col: str = "record_id", source_col: str = "source",
                     json_col: str = "_source",
                     physical_paths: dict | None = None) -> DataFrame:
    """Raw JSON documents → the long values table (same shape as
    transcripts.build_values), skipping the transcript encoding: the
    direct path for users whose corpus is JSON documents rather than
    conversation turns."""
    from zentity_spark.transcripts import values_from_parsed

    flat = flatten_json_docs(docs, id_col, source_col, json_col)
    parsed = flat.select("record_id", "source", "path", "raw", "pos")
    return values_from_parsed(spark, parsed, compiled, physical_paths)
