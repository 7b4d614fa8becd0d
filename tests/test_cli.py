"""spark-submit entrypoint end-to-end: batch and resolve subcommands
produce their JSON contracts (run in-process against the shared test
session; SparkSession.stop is stubbed so the session survives)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import SparkSession

from tests.fixture_data import fixture_transcripts
from zentity_spark import cli

MODEL = {
    "attributes": {"string": {}, "array": {}},
    "resolvers": {"string": {"attributes": ["string"]},
                  "array": {"attributes": ["array"]}},
    "matchers": {"exact": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
    "indices": {
        "zentity_test_index_arrays": {
            "fields": {
                "string": {"attribute": "string", "matcher": "exact"},
                "array_1": {"attribute": "array", "matcher": "exact"},
                "array_2": {"attribute": "array", "matcher": "exact"},
                "array_3": {"attribute": "array", "matcher": "exact"},
                "array_4": {"attribute": "array", "matcher": "exact"},
            }
        }
    },
}


@pytest.fixture()
def setup(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    turns_path = str(tmp_path / "turns")
    fixture_transcripts(spark, filenames=("TestDataArrays.txt",)).write.parquet(
        turns_path
    )
    model_path = str(tmp_path / "model.json")
    with open(model_path, "w") as fh:
        json.dump(MODEL, fh)
    return turns_path, model_path


def test_cli_resolve_envelope(setup, capsys):
    turns_path, model_path = setup
    cli.main([
        "resolve", "--model", model_path, "--input", turns_path,
        "--attributes", '{"string": ["abc"], "array": ["222"]}',
        "--explanation",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(out)
    assert set(obj) == {"took", "hits"}
    assert obj["hits"]["total"] == 2
    doc = {h["_id"]: h for h in obj["hits"]["hits"]}["1"]
    assert doc["_hop"] == 0 and "_explanation" in doc and "_attributes" in doc


def test_cli_resolve_error_envelope(setup, capsys):
    turns_path, model_path = setup
    cli.main([
        "resolve", "--model", model_path, "--input", turns_path,
        "--attributes", '{"no_such": ["x"]}',
    ])
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["error"]["by"] == "zentity"
    assert obj["error"]["type"] == "io.zentity.model.ValidationException"


def test_cli_batch(setup, tmp_path, capsys):
    turns_path, model_path = setup
    out_root = str(tmp_path / "warehouse")
    cli.main([
        "batch", "--model", model_path, "--input", turns_path,
        "--output", out_root,
    ])
    obj = json.loads(capsys.readouterr().out.strip())
    assert obj["stages"]["clusters"]["rows"] > 0
    assert os.path.isdir(os.path.join(out_root, "clusters"))


def test_cli_home(capsys):
    """`home` prints the HomeAction metadata body (HomeActionIT.java:34-56
    field assertions) without starting a Spark session."""
    cli.main(["home"])
    obj = json.loads(capsys.readouterr().out)
    assert obj["name"] == "zentity_spark"
    assert obj["description"]
    assert obj["website"]
    assert set(obj["version"]) == {"zentity_spark", "spark"}


def test_cli_bulk(setup, tmp_path, capsys):
    """`bulk` runs the NDJSON batch against a ModelStore and prints the
    reference {took,errors,items} body with per-item error isolation."""
    from zentity_spark.models_store import ModelStore

    turns_path, model_path = setup
    store_root = str(tmp_path / "models")
    store = ModelStore(store_root)
    store.setup()
    store.create("arrays", MODEL)
    body_path = str(tmp_path / "bulk.ndjson")
    with open(body_path, "w") as fh:
        fh.write("\n".join([
            json.dumps({"entity_type": "arrays"}),
            json.dumps({"attributes": {"string": ["abc"], "array": ["222"]}}),
            json.dumps({"entity_type": "missing_type"}),
            json.dumps({"attributes": {"string": ["abc"]}}),
        ]))
    cli.main([
        "bulk", "--input", turns_path, "--body", body_path,
        "--models-dir", store_root, "--no-source",
    ])
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["errors"] is True
    ok, bad = obj["items"]
    assert ok["hits"]["total"] == 2
    assert bad["error"]["reason"] == "Entity type 'missing_type' not found."
    assert bad["hits"] == {"total": 0, "hits": []}
