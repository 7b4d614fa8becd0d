"""Property-based parity tests (hypothesis, driver-side only — no Spark
session): the Python replicas used for seeded-mode input keys and the
DuckDB oracles must agree with their engine counterparts on arbitrary
inputs, not just the curated fixtures."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

ascii_word = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)


@settings(max_examples=300, deadline=None)
@given(a=ascii_word, b=ascii_word)
def test_jaro_winkler_matches_duckdb(a, b):
    """matchers.jaro_winkler_pandas (the verify/scoring UDF kernel) is
    bit-identical to DuckDB's jaro_winkler_similarity — the property the
    scored_pairs oracle depends on."""
    import pandas as pd

    from zentity_spark.matchers import jaro_winkler_pandas

    got = float(jaro_winkler_pandas(pd.Series([a]), pd.Series([b])).iloc[0])
    con = duckdb.connect()
    exp = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    if math.isnan(got):
        assert a is None or b is None
    else:
        assert got == pytest.approx(float(exp), abs=0.0), (a, b)


@settings(max_examples=300, deadline=None)
@given(s=ascii_word)
def test_soundex_python_matches_sql_oracle(s):
    """matchers.spark_soundex_py (UTF8String.soundex replica) equals the
    SQL_SOUNDEX DuckDB expression for arbitrary ASCII tokens."""
    import pandas as pd

    from zentity_spark.entry_queries import SQL_SOUNDEX
    from zentity_spark.matchers import spark_soundex_py

    tok = s.split(" ")[0]  # == substring_index(text, ' ', 1) / split_part
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [0], "text": [s]}))
    sql = con.execute(SQL_SOUNDEX).fetchone()[1]
    py = spark_soundex_py(tok)
    if sql is None:
        sql = ""
    assert py == sql, (s, py, sql)


_FMT_POOL = [
    "yyyy-MM-dd",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss.0000",
    "yyyy/MM/dd hh:mm a",
    "epoch_millis",
    "epoch_second",
]


@settings(max_examples=200, deadline=None)
@given(
    epoch=st.integers(min_value=0, max_value=4_102_444_800),  # ≤ 2100
    millis=st.integers(min_value=0, max_value=999),
    fmt=st.sampled_from(_FMT_POOL),
)
def test_java_date_format_parse_fixpoint(epoch, millis, fmt):
    """format∘parse is a fixpoint: re-parsing a formatted instant and
    formatting again reproduces the same string — the property that
    makes extracted-date relaying (script_fields truncation) converge
    across hops instead of drifting."""
    from zentity_spark.java_dates import format_java_date, parse_java_date

    t = epoch + millis / 1000.0
    s1 = format_java_date(t, fmt)
    t2 = parse_java_date(s1, fmt)
    assert t2 is not None, (t, fmt, s1)
    assert format_java_date(t2, fmt) == s1, (t, fmt)


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(allow_nan=False, allow_infinity=False,
                min_value=-1e20, max_value=1e20),
)
def test_java_double_roundtrip(x):
    """String.valueOf(double) replica: the printed form must round-trip
    to the same double (shortest-roundtrip property) — value-identity is
    what dedup/blocking key equality rides on."""
    from zentity_spark.values import _java_double_to_string

    s = _java_double_to_string(x)
    assert float(s.replace("E", "e")) == x, (x, s)


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(
    st.one_of(st.just(0.0), st.just(1.0),
              st.floats(min_value=1e-30, max_value=1.0, allow_nan=False)),
    max_size=8))
def test_composite_score_bounds_and_symmetry(vals):
    """Conflation stays in [0,1], is order-invariant to float rounding
    away from the denormal-underflow boundary, and the NaN guard
    (1.0 with 0.0) yields 0.5 (Job.java:636-637).

    Scores below ~1e-30 are excluded (0.0 itself still drawn): with a
    denormal score and an exact 1.0, the ∏s running product underflows
    to 0.0 in one multiplication order but not the other, flipping the
    0/0 NaN guard — the REFERENCE's plain sequential reduce over the
    caller's list (Job.java:633-635) has the identical order
    sensitivity, so order-invariance there is not a property either
    implementation has; what matters is per-order bit parity, covered
    by the JobTest golden vectors."""
    from zentity_spark.scoring import composite_identity_confidence_score as cs

    a = cs(list(vals))
    b = cs(list(reversed(vals)))
    if not vals:
        assert a is None and b is None
        return
    assert a == pytest.approx(b, abs=1e-14)
    assert 0.0 <= a <= 1.0
    if 1.0 in vals and 0.0 in vals:
        assert a == 0.5


@settings(max_examples=30, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=60)),
            st.one_of(st.none(), st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=60)),
        ),
        min_size=1, max_size=200,
    )
)
def test_jaro_winkler_batch_matches_rowwise(pairs):
    """Whole-batch jaro_winkler_pandas equals per-row invocation — the
    batched numpy kernel's length-sorted chunking, equality fast path,
    and null masking must not depend on batch composition."""
    import numpy as np
    import pandas as pd

    from zentity_spark.matchers import jaro_winkler_pandas

    a = pd.Series([p[0] for p in pairs], dtype=object)
    b = pd.Series([p[1] for p in pairs], dtype=object)
    batch = jaro_winkler_pandas(a, b).to_numpy()
    single = np.array([
        float(jaro_winkler_pandas(
            pd.Series([x], dtype=object), pd.Series([y], dtype=object)).iloc[0])
        for x, y in pairs
    ])
    assert np.allclose(batch, single, atol=0.0, equal_nan=True), pairs


def test_jaro_winkler_known_edges():
    """Pinned edge cases: the d = -1 single-char window (resolved by the
    equality rule), empty-vs-empty (0.0, DuckDB parity), embedded NUL
    (code-point semantics), and non-ASCII (UCS4 path)."""
    import math

    import pandas as pd

    from zentity_spark.matchers import jaro_winkler_pandas

    cases = [
        ("a", "a", 1.0), ("a", "b", 0.0), ("", "", 0.0), ("a", "", 0.0),
        ("", "b", 0.0), ("ab", "ba", 0.0), ("a\x00b", "a\x00b", 1.0),
        ("héllo", "héllo", 1.0),
    ]
    a = pd.Series([c[0] for c in cases])
    b = pd.Series([c[1] for c in cases])
    got = jaro_winkler_pandas(a, b).tolist()
    for (x, y, want), g in zip(cases, got):
        assert g == pytest.approx(want, abs=1e-12), (x, y, g)
    nan = jaro_winkler_pandas(
        pd.Series([None, "x"], dtype=object), pd.Series(["x", None], dtype=object)
    )
    assert math.isnan(nan.iloc[0]) and math.isnan(nan.iloc[1])
