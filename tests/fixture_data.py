"""Encode the reference's integration-test documents as transcripts.

FIXTURES.md §2: each reference test doc (44 total: TestData.txt,
TestDataArrays.txt, TestDataObjectArrays.txt) becomes one conversation;
conv_id = `<index>/<doc_id>`; each indexed leaf field becomes one turn
with text `PATH=VALUE` (canonical serialization), turn_idx follows
sorted field order; role='user', tool=None, ts = the doc's type_date
where present else epoch. This exercises the full
transcripts→records→blocking→scoring→clustering path against the golden
clusters of ResolutionActionIT.
"""

from __future__ import annotations

import datetime
import json

REFERENCE_RESOURCES = "/root/reference/src/test/resources"

_TS_EPOCH = datetime.datetime(1970, 1, 1)


def _serialize(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _leaves(obj, path=""):
    """Flatten nested dicts/arrays to (dotted path, serialized scalar)."""
    if isinstance(obj, dict):
        for k, v in sorted(obj.items()):
            yield from _leaves(v, f"{path}.{k}" if path else k)
    elif isinstance(obj, list):
        for v in obj:
            yield from _leaves(v, path)
    else:
        yield (path, _serialize(obj))


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


def docs_to_turn_rows(docs) -> list[tuple]:
    """→ rows (conv_id, turn_idx, role, text, tool, ts)."""
    rows = []
    for d in docs:
        conv_id = f"{d['index']}/{d['id']}"
        leaves = sorted(_leaves(d["doc"]))
        ts = _TS_EPOCH
        raw_date = d["doc"].get("type_date")
        if raw_date:
            ts = datetime.datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%S.%f")
        for i, (path, val) in enumerate(leaves):
            rows.append((conv_id, i, "user", f"{path}={val}", None, ts))
    return rows


def fixture_transcripts(spark, filenames=("TestData.txt",)):
    rows = docs_to_turn_rows(load_reference_docs(filenames))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
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
