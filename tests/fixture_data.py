"""Load the reference's integration-test documents as transcripts —
through the ENGINE's generic JSON ingestion path.

FIXTURES.md §2: each reference test doc (44 total: TestData.txt,
TestDataArrays.txt, TestDataObjectArrays.txt) becomes one conversation.
The raw `_source` JSON is flattened by
zentity_spark.documents.documents_to_turns (the batch analog of
Job.java:199-286 extractValues — dotted paths, arrays, object arrays,
dotted key names), NOT by a test-side pre-flattener, so the golden
cluster tests exercise the real ingestion surface end to end.
conv_id = `<index>/<doc_id>`; ts = the doc's type_date where present
else epoch (used only by conversation assembly, not by matching).
"""

from __future__ import annotations

import datetime
import json

REFERENCE_RESOURCES = "/root/reference/src/test/resources"

_TS_EPOCH = datetime.datetime(1970, 1, 1)


def load_reference_docs(filenames=("TestData.txt",)) -> list[dict]:
    """Parse NDJSON bulk files → [{index, id, doc}]."""
    docs = []
    for fn in filenames:
        with open(f"{REFERENCE_RESOURCES}/{fn}") as fh:
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        for meta_line, doc_line in zip(lines[0::2], lines[1::2]):
            meta = json.loads(meta_line)["index"]
            docs.append(
                {"index": meta["_index"], "id": meta["_id"], "doc": json.loads(doc_line)}
            )
    return docs


def fixture_docs_df(spark, filenames=("TestData.txt",)):
    """Raw-document DataFrame (record_id, source, _source) — the input
    shape of the generic JSON ingestion path."""
    docs = load_reference_docs(filenames)
    rows = [(d["id"], d["index"], json.dumps(d["doc"])) for d in docs]
    return spark.createDataFrame(
        rows, "record_id string, source string, _source string"
    )


def fixture_transcripts(spark, filenames=("TestData.txt",)):
    from pyspark.sql import functions as F

    from zentity_spark.documents import documents_to_turns

    docs = load_reference_docs(filenames)
    turns = documents_to_turns(fixture_docs_df(spark, filenames))

    # per-doc ts: type_date where present (old fixture behavior; matching
    # never reads it — date semantics ride in the turn text)
    ts_rows = []
    for d in docs:
        ts = _TS_EPOCH
        raw_date = d["doc"].get("type_date")
        if raw_date:
            ts = datetime.datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%S.%f")
        ts_rows.append((f"{d['index']}/{d['id']}", ts))
    ts_df = spark.createDataFrame(ts_rows, "conv_id string, _doc_ts timestamp")
    return (
        turns.drop("ts")
        .join(ts_df, "conv_id", "left")
        .withColumn("ts", F.coalesce("_doc_ts", F.lit("1970-01-01").cast("timestamp")))
        .drop("_doc_ts")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def golden_clusters(case: str) -> dict[str, int]:
    """Expected (record short id → hop) sets from ResolutionActionIT."""
    cases = {
        # testJobAttributes (:726-742): attribute_a=a_00, indices a/b/c,
        # resolvers a/b
        "attributes": {"a0": 0, "b0": 0, "c0": 1, "a1": 2, "b1": 3, "c1": 4},
        # testJobIds (:832-846)
        "ids": {"a0": 0, "b0": 1, "c0": 2, "a1": 3, "b1": 4, "c1": 5},
        # testJobResolverWeight (:1384-1397): model B, index a only
        "weight": {"a2": 0, "a3": 0, "a4": 1, "a5": 1},
        # testJobArrays (:1485-1515)
        "arrays": {"1": 0, "2": 1},
    }
    return cases[case]
