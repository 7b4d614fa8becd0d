"""Exact substring dedup (Lee et al. 2021 windowed-hash formulation):
hand-computed removal spans and applied cleaning on a fixture corpus.

Conventions under test (extras.substring_dup_spans / substring_dedup):
- a window is min_tokens consecutive tokens; duplicated iff its text
  occurs at any OTHER (doc_id, position) in the corpus;
- each duplicate group keeps its minimum (doc_id, win_idx) occurrence;
- non-keeper windows merge into maximal per-doc token spans;
- the applied form removes span tokens and space-joins the rest.
"""

import pytest
from pyspark.sql import Row

from zentity_spark.extras import substring_dedup, substring_dup_spans

DOCS = [
    Row(doc_id=0, text=""),                            # empty
    Row(doc_id=1, text="a b c d e f"),                 # keeper side
    Row(doc_id=2, text="x y a b c d z"),               # shares "a b c d"
    Row(doc_id=3, text="p q r p q r p q r"),           # self-repetition
    Row(doc_id=4, text="unique tokens only here now"),  # no duplicates
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS)


def test_spans_hand_computed(docs):
    rows = sorted(
        substring_dup_spans(docs, min_tokens=3).collect(),
        key=lambda r: (r.doc_id, r.span_start),
    )
    got = [
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in rows
    ]
    # doc2: windows "a b c"@3 and "b c d"@4 are non-keepers (doc1 holds
    # both keepers) -> merged span tokens 3..6.
    # doc3: "p q r"@{1,4,7}, "q r p"@{2,5}, "r p q"@{3,6}; keepers are
    # 1,2,3 -> non-keepers 4,5,6,7 merge into tokens 4..9.
    assert got == [
        (2, 3, 6, 4, 2),
        (3, 4, 9, 6, 4),
    ]


def test_apply_hand_computed(docs):
    rows = {r.doc_id: r for r in substring_dedup(docs, min_tokens=3).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert (rows[0].n_tokens, rows[0].n_removed, rows[0].clean_text) == (0, 0, "")
    # keepers are untouched
    assert (rows[1].n_removed, rows[1].clean_text) == (0, "a b c d e f")
    assert (rows[2].n_removed, rows[2].clean_text) == (4, "x y z")
    assert (rows[3].n_removed, rows[3].clean_text) == (6, "p q r")
    assert (rows[4].n_removed, rows[4].clean_text) == (
        0, "unique tokens only here now"
    )


def test_short_docs_produce_no_windows(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a b")]
    )
    # 2 tokens < min_tokens=3: no windows exist, so nothing is
    # duplicated even though the docs are identical (substring dedup is
    # not doc-level dedup)
    assert substring_dup_spans(d, min_tokens=3).count() == 0
    out = {r.doc_id: r for r in substring_dedup(d, min_tokens=3).collect()}
    assert out[1].clean_text == "a b" and out[2].clean_text == "a b"


def test_dup_method_parity(spark):
    # the one-shuffle window form and the skew-safe groupBy+join form
    # must produce identical spans
    from zentity_spark.extras import substring_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m n o p"),
            (2, "x a b c d e f g h i j z z q r s"),
            (3, "a b c d e f g h i j k l y y y y"),
            (4, "totally unique words only here now"),
        ],
        "doc_id long, text string",
    )
    cols = ["doc_id", "span_start", "span_end", "span_tokens", "n_windows"]
    win = sorted(tuple(r[c] for c in cols)
                 for r in substring_dup_spans(docs, 4, dup_method="window").collect())
    jn = sorted(tuple(r[c] for c in cols)
                for r in substring_dup_spans(docs, 4, dup_method="join").collect())
    assert win == jn and len(win) > 0

    import pytest

    with pytest.raises(ValueError):
        substring_dup_spans(docs, 4, dup_method="nope").collect()
