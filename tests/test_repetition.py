"""Hand-computed vectors for the Gopher-style repetition metrics
(extras.repetition_metrics) — the within-doc duplicate-line and
top-bigram pretraining quality filters."""

import pytest

from zentity_spark.extras import repetition_metrics


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}


def test_repetition_vectors(spark):
    out = _run(spark, [
        # doc 1: 4 non-empty lines, "dup" twice (3 chars each),
        # "solo x" + "other y" unique → dup_line_frac = (4-3)/4,
        # dup chars = 2*3 of line chars 3+3+6+7=19
        (1, "dup\ndup\nsolo x\n\n  other y  "),
        # doc 2: bigram "a b" occurs 3x in "a b a b a b" (words
        # a,b,a,b,a,b → bigrams: 'a b','b a','a b','b a','a b' → top
        # 'a b' 3× × 3 chars = 9 of 11 canonical chars); one line
        (2, "a b a b a b"),
        # doc 3: no repetition at all
        (3, "unique line one\nunique line two"),
        # doc 4: single word, no bigrams, one line
        (4, "word"),
    ])

    d1 = out[1]
    assert d1["n_lines"] == 4
    assert d1["dup_line_frac"] == pytest.approx(0.25)
    assert d1["dup_line_char_frac"] == pytest.approx(round(6 / 19, 6))

    d2 = out[2]
    assert d2["n_lines"] == 1
    assert d2["dup_line_frac"] == 0.0
    assert d2["top_bigram_char_frac"] == pytest.approx(round(9 / 11, 6))

    d3 = out[3]
    assert d3["dup_line_frac"] == 0.0
    assert d3["dup_line_char_frac"] == 0.0
    # "unique line" bigram repeats across LINES but inside one doc:
    # words = unique,line,one,unique,line,two → 'unique line' 2× ×
    # 11 chars = 22 of 31 canonical chars
    assert d3["top_bigram_char_frac"] == pytest.approx(round(22 / 31, 6))

    d4 = out[4]
    assert d4["n_lines"] == 1
    assert d4["top_bigram_char_frac"] == 0.0
    assert d4["dup_line_char_frac"] == 0.0


def test_paragraph_dedup_vectors(spark):
    from zentity_spark.extras import paragraph_dedup

    df = spark.createDataFrame([
        (1, "shared para\n\nunique one"),
        (2, "shared   PARA\n\n\nunique two"),   # canonicalizes equal
        (3, "unique three"),
    ], "doc_id long, text string")
    rows = {(r["doc_id"], r["para_idx"]): r.asDict()
            for r in paragraph_dedup(df).collect()}
    assert rows[(1, 0)]["keep"] is True and rows[(1, 0)]["n_copies"] == 2
    assert rows[(2, 0)]["keep"] is False and rows[(2, 0)]["n_copies"] == 2
    assert rows[(1, 0)]["para_hash"] == rows[(2, 0)]["para_hash"]
    assert all(rows[k]["keep"] for k in [(1, 1), (2, 1), (3, 0)])
