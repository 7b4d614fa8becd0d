"""Spark soundex() vs the DuckDB SQL_SOUNDEX oracle on adversarial
tokens — H/W-leading (the lastCode-seed edge), H/W-transparent repeats,
vowel-leading, non-letter-leading (Spark returns the input unchanged),
single chars, and classic textbook codes (Robert/Rupert R163,
Ashcraft A261 under the H/W rule, Tymczak T522, Pfister P236)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

TOKENS = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Harris", "HR", "Hw", "BHB", "Adams", "a", "I", "H", "W",
    "123abc", "_foo", "key", "the", "O'Brien", "McDonald", "Washington",
    "Jackson", "zzz", "aeiou", "bhhb", "bwwb", "bab",
]


@pytest.fixture(scope="module")
def pairs(spark):
    from zentity_spark.entry_queries import SQL_SOUNDEX

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TOKENS)], "doc_id long, text string"
    )
    got_spark = {
        r["doc_id"]: r["sx"]
        for r in sdf.select(
            "doc_id", F.soundex(F.substring_index("text", " ", 1)).alias("sx")
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(TOKENS)), "text": TOKENS})
    )
    got_duck = {r[0]: r[1] for r in con.execute(SQL_SOUNDEX).fetchall()}
    return got_spark, got_duck


def test_soundex_oracle_parity(pairs):
    got_spark, got_duck = pairs
    for i, tok in enumerate(TOKENS):
        assert got_spark[i] == got_duck[i], f"{tok}: {got_spark[i]} != {got_duck[i]}"


def test_soundex_known_codes(pairs):
    got_spark, _ = pairs
    expect = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
              "Tymczak": "T522", "Pfister": "P236"}
    by_tok = {TOKENS[i]: c for i, c in got_spark.items()}
    for tok, code in expect.items():
        assert by_tok[tok] == code, f"{tok}: {by_tok[tok]} != {code}"


def test_spark_soundex_py_parity(spark):
    """matchers.spark_soundex_py must equal Spark's soundex() byte for
    byte (it builds the seeded-mode input keys for soundex matchers)."""
    from zentity_spark.matchers import spark_soundex_py

    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(TOKENS)],
                                "i long, t string")
    jvm = {r["i"]: r["sx"] for r in
           sdf.select("i", F.soundex("t").alias("sx")).collect()}
    for i, tok in enumerate(TOKENS):
        assert spark_soundex_py(tok) == jvm[i], tok


def test_seeded_soundex_matching(spark):
    """A soundex similarity matcher matches phonetically-alike values in
    seeded mode (extension matcher surface, SURVEY §2.10)."""
    from zentity_spark.model import Model
    from zentity_spark.resolve import Input, resolve

    model = Model({
        "attributes": {"name": {}},
        "resolvers": {"r": {"attributes": ["name"]}},
        "matchers": {"sx": {"clause": {"similarity": {"method": "soundex"}}}},
        "indices": {"idx": {"fields": {"name": {"attribute": "name", "matcher": "sx"}}}},
    })
    rows = [
        ("idx/1", 0, "user", "name=Robert", None, None),
        ("idx/2", 0, "user", "name=Rupert", None, None),
        ("idx/3", 0, "user", "name=Smith", None, None),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    hits = resolve(spark, turns, model, Input(attributes={"name": ["Robert"]}))
    assert {h.doc_id for h in hits} == {"1", "2"}  # R163 phonetic pair
