"""Scored-pairs stage: similarity features per candidate pair
(Jaro-Winkler / Levenshtein / Soundex / token-Jaccard over assembled
conversation text)."""

import math

from zentity_spark.scoring import _lev_py, _soundex_py, score_pairs


def test_lev_py():
    assert _lev_py("kitten", "sitting") == 3
    assert _lev_py("", "abc") == 3
    assert _lev_py("abc", "abc") == 0
    assert _lev_py("abc", "axc") == 1


def test_soundex_py():
    # classic vectors (same as Spark's soundex / standard algorithm)
    assert _soundex_py("Robert") == "R163"
    assert _soundex_py("Rupert") == "R163"
    assert _soundex_py("Tymczak") == "T522"
    assert _soundex_py("Honeyman") == "H555"
    assert _soundex_py("") == ""


def test_score_pairs_features(spark):
    texts = spark.createDataFrame(
        [
            ("a", "hello world foo"),
            ("b", "hello world bar"),
            ("c", "completely different text"),
        ],
        "record_id string, conv_text string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "id_l string, id_r string"
    )
    rows = {
        (r["id_l"], r["id_r"]): r
        for r in score_pairs(pairs, texts).collect()
    }
    ab = rows[("a", "b")]
    # token sets {hello,world,foo} vs {hello,world,bar}: |∩|=2, |∪|=4
    assert math.isclose(ab["token_jaccard"], 0.5)
    assert ab["soundex_eq"] is True  # same first token
    assert ab["lev_prefix"] == 3  # foo -> bar
    assert ab["jw_text"] > 0.9
    ac = rows[("a", "c")]
    assert ac["token_jaccard"] == 0.0
    assert ac["soundex_eq"] is False
    assert ac["jw_text"] < 0.8


def test_score_pairs_empty_and_whitespace_text(spark):
    """Regression: under Spark 4's default ANSI mode, element_at on the
    empty token array of empty/whitespace-only text threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT and aborted the stage. Empty text
    must score, with '' as its first token (Python str.split parity)."""
    texts = spark.createDataFrame(
        [("a", ""), ("b", "   \t  "), ("c", "hello"), ("d", None)],
        "record_id string, conv_text string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], "id_l string, id_r string"
    )
    rows = {
        (r["id_l"], r["id_r"]): r
        for r in score_pairs(pairs, texts).collect()
    }
    ab = rows[("a", "b")]  # both token sets empty
    assert ab["soundex_eq"] is True  # '' == ''
    assert ab["token_jaccard"] == 1.0  # both-empty convention
    ac = rows[("a", "c")]
    assert ac["soundex_eq"] is False
    assert ac["token_jaccard"] == 0.0
    assert ("a", "d") in rows  # NULL text scores like empty


def test_score_pairs_matches_spark_builtins(spark):
    """Cross-check the Python soundex and levenshtein against the JVM
    built-ins on a sample of generated strings."""
    from pyspark.sql import functions as F

    df = spark.range(50).select(
        F.concat(F.lit("w"), F.md5(F.col("id").cast("string"))).alias("a"),
        F.concat(F.lit("w"), F.md5((F.col("id") + 1).cast("string"))).alias("b"),
    )
    rows = df.select(
        "a", "b",
        F.soundex("a").alias("sx_a"), F.soundex("b").alias("sx_b"),
        F.levenshtein(F.substring("a", 1, 32), F.substring("b", 1, 32)).alias("lev"),
    ).collect()
    for r in rows:
        assert _soundex_py(r["a"]) == r["sx_a"]
        assert _soundex_py(r["b"]) == r["sx_b"]
        assert _lev_py(r["a"][:32], r["b"][:32]) == r["lev"]
