"""Generic nested-JSON ingestion parity with Job.java:199-286
extractValues — including the exact docstring example from the
reference (object keys, value arrays, object arrays, dotted key names)
and the multi-field suffix fallback (Job.java:825-853)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

# the example document from the Job.java extractValues javadoc
JOB_JAVA_EXAMPLE = {
    "a0": {"b0": {"c0": 0, "d0": 9}},
    "a1": {"b1": {"c1": [1, 2], "d1": [9, 9]}},
    "a2": {"b2": [{"c2": 3, "d2": 9}, {"c2": 4, "d2": 9}]},
    "a.3": {"b.3": [{"c.3": 5, "d.3": 9}, {"c.3": 6, "d.3": 9}]},
}


def test_flatten_job_java_example():
    from zentity_spark.documents import flatten_json_leaves

    rows = flatten_json_leaves(json.dumps(JOB_JAVA_EXAMPLE))
    by_path = {}
    for path, raw, vtype, pos in rows:
        by_path.setdefault(path, []).append(raw)
        assert vtype == "number"
    # the javadoc's expected path → values table
    assert by_path["a0.b0.c0"] == ["0"]
    assert by_path["a1.b1.c1"] == ["1", "2"]
    assert by_path["a2.b2.c2"] == ["3", "4"]
    assert by_path["a.3.b.3.c.3"] == ["5", "6"]
    # arrays keep document order and duplicates
    assert by_path["a1.b1.d1"] == ["9", "9"]


def test_flatten_types_and_nulls():
    from zentity_spark.documents import flatten_json_leaves

    doc = {"s": "x", "n": 3, "f": 1.0, "b": True, "z": None,
           "arr": ["a", None, "b"], "big": 922337203685477,
           "pi": 3.141592653589793}
    got = {(p, r, t) for p, r, t, _ in flatten_json_leaves(json.dumps(doc))}
    assert ("s", "x", "string") in got
    assert ("n", "3", "number") in got
    assert ("f", "1.0", "number") in got          # Java String.valueOf(double)
    assert ("b", "true", "boolean") in got
    assert ("big", "922337203685477", "number") in got
    assert ("pi", "3.141592653589793", "number") in got
    assert not any(p == "z" for p, _, _ in got)   # nulls skipped
    assert [r for p, r, t, _ in flatten_json_leaves(json.dumps(doc)) if p == "arr"] == ["a", "b"]


MODEL = {
    "attributes": {"c0": {"type": "number"}, "c1": {"type": "number"},
                   "c2": {"type": "number"}, "c3": {"type": "number"}},
    "resolvers": {"r": {"attributes": ["c0"]}},
    "matchers": {"exact": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
    "indices": {
        "idx": {
            "fields": {
                "a0.b0.c0": {"attribute": "c0", "matcher": "exact"},
                # multi-field suffix that does not exist in the data:
                # falls back to a1.b1.c1 (Job.java:825-853)
                "a1.b1.c1.keyword": {"attribute": "c1", "matcher": "exact"},
                "a2.b2.c2": {"attribute": "c2", "matcher": "exact"},
                "a.3.b.3.c.3": {"attribute": "c3", "matcher": "exact"},
            }
        }
    },
}


def test_values_from_docs_extraction(spark):
    from zentity_spark.compiler import compile_model
    from zentity_spark.documents import values_from_docs
    from zentity_spark.model import Model

    docs = spark.createDataFrame(
        [("d1", "idx", json.dumps(JOB_JAVA_EXAMPLE))],
        "record_id string, source string, _source string",
    )
    values = values_from_docs(spark, docs, compile_model(Model(MODEL)))
    got = {
        (r["attribute"], r["raw"]) for r in values.collect()
    }
    assert got == {("c0", "0"), ("c1", "1"), ("c1", "2"),
                   ("c2", "3"), ("c2", "4"), ("c3", "5"), ("c3", "6")}


def test_documents_to_turns_roundtrip(spark):
    """documents_to_turns → parse_turns recovers every leaf."""
    from zentity_spark.documents import documents_to_turns
    from zentity_spark.transcripts import parse_turns

    docs = spark.createDataFrame(
        [("d1", "idx", json.dumps(JOB_JAVA_EXAMPLE))],
        "record_id string, source string, _source string",
    )
    turns = documents_to_turns(docs)
    assert turns.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    parsed = parse_turns(turns)
    rows = parsed.collect()
    assert all(r["record_id"] == "idx/d1" and r["source"] == "idx" for r in rows)
    got = {(r["path"], r["raw"]) for r in rows}
    assert ("a.3.b.3.c.3", "5") in got
    assert ("a2.b2.d2", "9") in got
    # every non-null leaf, duplicates kept: 2 (a0.b0) + 4 (a1.b1 arrays)
    # + 4 (a2.b2 object array) + 4 (a.3.b.3 object array)
    assert len(rows) == 14
